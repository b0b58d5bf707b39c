package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a tiny stats table of per-file (min, max) of a
  * clustering column, consulted before a scan so a range predicate
  * reads only the files it can touch — parquet row-group / table-format
  * data skipping made explicit (see the r31 query for the full story).
  *
  * The stats frame has columns (file, min_us, max_us); it is
  * rows-per-FILE, a few KB per PB, so reading it costs nothing next to
  * the scan it prunes.
  */
object ZoneMap {

  /** Per-file stats of `col` for every parquet file under `dataPath`. */
  def stats(spark: SparkSession, dataPath: String, tsCol: String): DataFrame =
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(min(tsCol).as("min_us"), max(tsCol).as("max_us"))

  /** The stats location for a table written by the streaming
    * zone-mapped sink: each published `batch=<id>` carries its stats
    * inside it as `_zonemap/` (underscore-prefixed, so plain data
    * readers of the table never list it), published by the same rename
    * as the data — pass this glob as `prunedRead`'s statsPath.
    */
  def statsGlob(tablePath: String): String = s"$tablePath/batch=*/_zonemap"

  /** Read only the files whose [min_us, max_us] range intersects
    * [lo, hi) according to the stored stats, as a DataFrame. False
    * inclusions are possible (stats are conservative), so callers keep
    * their real predicate; false EXCLUSIONS are not — GIVEN stats that
    * cover every data file — which is what makes the pruned read
    * result-identical to the full scan. Under the streaming sink each
    * epoch's stats are published by the same atomic rename as its data
    * (see `zoneMappedSink`), so the stats always cover exactly the
    * visible files. The pruned listing is the same driver-side
    * path list every parquet scan builds — minus the skipped files.
    *
    * Schema note: this reads explicit LEAF files, so Hive-style layout
    * directories (the sink's `batch=<id>`) do NOT surface as partition
    * columns the way a base-path scan discovers them — `batch` is
    * layout metadata, not data.
    */
  def prunedRead(spark: SparkSession, statsPath: String,
      lo: Long, hi: Long): DataFrame = {
    // The range intersect runs distributed over the stats table; the
    // driver receives only the SURVIVING leaf paths (bounded by the
    // post-prune file count — at 100 TB, the files of the queried
    // window, not of the table), which is the path list the scan
    // planner must hold to plan the read in any case.
    val files = spark.read.parquet(statsPath)
      .filter(col("max_us") >= lo && col("min_us") < hi)
      .select("file").orderBy("file").collect().map(_.getString(0))
    require(files.nonEmpty,
      s"zone map at $statsPath prunes every file for [$lo, $hi) — " +
        "read the base path directly for provably-empty windows")
    spark.read.parquet(files.toIndexedSeq: _*)
  }
}
