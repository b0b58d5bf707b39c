package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-maintenance operations a pipeline runs between queries. */
object Tables {

  /** SCD-1 upsert: rows of `updates` replace same-key rows of `base`;
    * unmatched update keys are inserted; everything else passes
    * through. `updates` must carry the same columns as `base`.
    *
    * This is the relational core of a Delta/Iceberg MERGE (minus the
    * transaction log, which is the format's job, not the engine's):
    * one full-outer shuffle join on the key, update side wins per
    * column. At scale the join shuffles both sides on the key — and
    * when the update batch is small (the usual case for dimension
    * refresh), AQE turns it into a broadcast join with no base-side
    * shuffle at all.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: base=${base.columns.mkString(",")} " +
        s"updates=${updates.columns.mkString(",")}")
    val cols = base.columns
    base.as("b").join(updates.as("u"),
        col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map(c => coalesce(col(s"u.$c"), col(s"b.$c")).as(c)): _*)
  }
}
