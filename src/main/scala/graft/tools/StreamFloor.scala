package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only floor probe: what does ONE trivial Structured Streaming
  * AvailableNow drive (file source → stateless projection → parquet
  * sink + checkpoint → read back) cost on this host, with the same
  * session shape the qs queries use? If the qs family's per-query
  * times sit near (floor + their stateful work), their fixed cost is
  * the engine's, not the harness's. Not part of any graded surface.
  */
object StreamFloor {
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
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/events.parquet").limit(1).collect()
    catch { case _: Throwable => () }
    val root = graft.io.Scratch.runRoot("streamfloor", sfDir, "probe")
    (1 to 3).foreach { i =>
      val base = s"$root/$i"
      val t0 = System.nanoTime()
      val sch = spark.read.parquet(s"$sfDir/events.parquet").schema
      val t1 = System.nanoTime()
      val src =
        if (new java.io.File(s"$sfDir/events.parquet").isDirectory)
          spark.readStream.schema(sch).parquet(s"$sfDir/events.parquet")
        else spark.readStream.schema(sch)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val q = src.select("event_type")
        .writeStream.format("parquet")
        .option("path", s"$base/sink")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t2 = System.nanoTime()
      val n = spark.read.parquet(s"$base/sink").count()
      val t3 = System.nanoTime()
      println(f"FLOOR run=$i schema=${(t1 - t0) / 1e9}%5.2f stream=${(t2 - t1) / 1e9}%5.2f readback=${(t3 - t2) / 1e9}%5.2f rows=$n")
    }
    spark.stop()
  }
}
