package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Batch sinks (S5's batch half). The knobs that matter at 100 TB are
  * first-class parameters: partition columns (partition pruning on
  * read), records-per-file (bounded task output, no 10 GB files), and
  * bucketing (shuffle-free joins on the bucket key for downstream
  * consumers).
  */
object Sinks {

  /** Plain/partitioned parquet write. `maxRecordsPerFile` bounds output
    * file size without an extra repartition pass.
    */
  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Bucketed managed table: pre-shuffles once on write so every
    * downstream equi-join/aggregation on `bucketCols` runs shuffle-free.
    * Requires a catalog (saveAsTable), so callers pass a table name.
    */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}
