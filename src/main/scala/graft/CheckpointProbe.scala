package graft

import org.apache.spark.sql.SparkSession

/** Evidence main for the checkpoint-strategy seam's COST at rung
  * scale (r15 verdict item 7): CheckpointStrategySpec proves the
  * `reliable` mode correct on a hand fixture; this probe runs full
  * iterative kernels at a real SF through BOTH modes and prints the
  * measured local-vs-reliable delta as one JSON line, so the
  * write+read-per-round price a 1000-executor fixpoint pays for
  * executor-loss survival is a recorded number, not a scaladoc claim.
  *
  * Kernels: g03 (PageRank fixpoint — [[graft.api.Checkpoints.cut]]
  * per power round) and g09 (k-core peel — cut per peel round). Each
  * kernel runs local first, then reliable against a scratch dir;
  * results are fully materialized through the noop sink (the Bench
  * discipline) and the reliable run's row output is asserted equal to
  * the local run's count, so the probe cannot silently time a broken
  * mode. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.CheckpointProbe"
  */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")
    val kernels = Seq("g03_pagerank_fixedpoint", "g09_kcore_peel")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_reliable_probe").toString
    def timeOnce(name: String): (Double, Long) = {
      val q = byName(name)
      try q.prepare(spark, sfDir) catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = q.fn(spark, sfDir).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      (dt, n)
    }
    val rows = kernels.map { name =>
      // warm both input caches and JIT before either timed run
      timeOnce(name)
      spark.conf.set(graft.api.Checkpoints.ModeKey, "local")
      val (tLocal, nLocal) = timeOnce(name)
      spark.conf.set(graft.api.Checkpoints.ModeKey, "reliable")
      spark.conf.set(graft.api.Checkpoints.DirKey, ckptDir)
      val (tRel, nRel) = timeOnce(name)
      spark.conf.set(graft.api.Checkpoints.ModeKey, "local")
      require(nLocal == nRel,
        s"$name: reliable mode changed the row count ($nLocal vs $nRel)")
      f""""$name":{"local_sec":$tLocal%.3f,"reliable_sec":$tRel%.3f,""" +
        f""""ratio":${tRel / tLocal}%.2f,"rows":$nLocal}"""
    }
    val loadAvg: Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"checkpoint_probe","sf":"$sfDir",""" +
      s""""checkpoint_dir":"$ckptDir","load_avg":$loadAvg,""" +
      rows.mkString("\"kernels\":{", ",", "}}"))
    spark.stop()
  }
}
