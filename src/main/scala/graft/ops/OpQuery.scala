package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operator exposed through the driver contract:
  * a DataFrame builder over a scale-factor directory plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query for hash-compared correctness (SURVEY.md §5.1).
  *
  * Determinism rules every oracled query obeys:
  *  - ends in a total ORDER BY (all key columns, explicit tie-breakers);
  *  - no nullable sort keys (Spark sorts nulls first ASC, DuckDB last);
  *  - double aggregates go through DECIMAL(18,2) so partial-aggregation
  *    order cannot change the result; final values cast back to double;
  *  - column names aliased identically on both sides.
  */
final case class OpQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    /** One-time build step (bucketed table, media staging) — idempotent,
      * also invoked from `fn` so the query is standalone; Bench runs it
      * OUTSIDE the timed section because an index build is a one-time
      * cost the per-query throughput number must not re-pay every run.
      */
    prepare: (SparkSession, String) => Unit = (_, _) => ())

object OpQuery {
  def oracled(name: String, sql: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, fn, Some(sql), doc)

  def unoracled(name: String, doc: String = "")(
      fn: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, fn, None, doc)
}
