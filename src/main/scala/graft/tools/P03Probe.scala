package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 diagnostic (VERDICT item 3): attribute p03's 12.6× big-rung
  * flag to its stages — the spliced d04 edge build, the 2-hop BFS, or
  * the per-hop localCheckpoint I/O. Times each stage twice (min-of-2,
  * the bench statistic) at the given SF dir. Throwaway tool; not part
  * of the query registry.
  */
object P03Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def time2[T](name: String)(f: => T): Unit = {
      val ts = (1 to 2).map { _ =>
        sweep()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $dir $name min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warm-up
    spark.read.parquet(s"$dir/documents.parquet").limit(1).collect()

    val tmp = s"/tmp/p03probe_${new java.io.File(dir).getName}"
    time2("A_d04_edges_build_count") {
      println("  edges=" + graft.ops.DedupOps.d04.fn(spark, dir).count())
    }
    time2("B_edges_to_parquet") {
      graft.ops.DedupOps.d04.fn(spark, dir)
        .select(col("doc_a").as("pa"), col("doc_b").as("pb"))
        .write.mode("overwrite").parquet(tmp)
    }
    val mat = spark.read.parquet(tmp)
    val docs = graft.io.Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val seeds = docs.filter(col("source").isin("src5", "src7"))
      .select(col("doc_id").as("node"))
    time2("C_bfs2_over_materialized_edges") {
      println("  reached=" + graft.api.Graph
        .multiSourceBfs(mat, seeds, maxHops = 2).count())
    }
    time2("D_bfs2_over_lazy_d04_edges") {
      val edges = graft.ops.DedupOps.d04.fn(spark, dir)
        .select(col("doc_a").as("pa"), col("doc_b").as("pb"))
      println("  reached=" + graft.api.Graph
        .multiSourceBfs(edges, seeds, maxHops = 2).count())
    }
    time2("E_p03_full") {
      graft.ops.PipelineOps.p03.fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
