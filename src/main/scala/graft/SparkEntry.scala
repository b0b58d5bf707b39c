package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator of the engine is registered here as a named query over
  * a scale-factor directory, with (where SQL-expressible) an equivalent
  * DuckDB oracle query for hash-compared correctness.
  */
object SparkEntry {

  /** The full operator registry. */
  def registry: Seq[OpQuery] =
    StarQueries.all ++ ReferenceQueries.all ++ RelationalOps.all ++
      EventOps.all ++ TextOps.all ++ DedupOps.all ++ SimilarityOps.all ++
      Multimodal.all ++ ScaleOps.all ++ JoinOps.all ++ GraphOps.all ++
      PipelineOps.all ++ StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.q01.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
