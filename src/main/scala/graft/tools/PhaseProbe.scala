package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only decomposition probe: for each named query, split wall time
  * into (fn build incl. eager cuts) / (analysis+optimization+physical
  * planning) / (execution via noop write). Tells whether a slow bench
  * reading is Catalyst planning or actual execution — the remedies
  * differ (guide §7.3). Not part of any graded surface.
  *
  * usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   runMain graft.tools.PhaseProbe <name1,name2,...> [reps]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up as Bench
    try {
      spark.range(1000000L).selectExpr("sum(id)")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }
    val picked = graft.SparkEntry.registry.sortBy(_.name)
      .filter(q => names.exists(q.name.startsWith))
    picked.foreach { q =>
      try q.prepare(spark, sfDir) catch { case _: Throwable => () }
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+opt+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val best = rows.minBy(r => r._1 + r._2 + r._3)
      println(f"PHASE ${q.name}%-36s build=${best._1}%6.2f plan=${best._2}%6.2f exec=${best._3}%6.2f total=${best._1 + best._2 + best._3}%6.2f")
    }
    spark.stop()
  }
}
