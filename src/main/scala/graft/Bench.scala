package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Times every registered query at the SF dir given by
  * SPARK_GRAFT_SF_DIR, fully materializing each result through the noop
  * datasource — `count()` would let Catalyst prune the very columns a
  * projection query exists to compute, under-reporting t01–t05/m01 as
  * near-zero. A noop write evaluates every output column of every row
  * and discards the bytes, so the timing is the real work.
  *
  * Cross-SF curve: when a sibling sf0.01 dir exists (and the primary is
  * a different SF), every query is also timed there and the per-query
  * ratio emitted. Data grows 10x between sf0.01 and sf0.1, so with
  * constant per-query overhead a linear operator stays well under 10x;
  * ratios above SUPERLINEAR_RATIO flag a super-linear scale bug (the
  * kind invisible at any single SF). Disable with SPARK_GRAFT_CURVE=0.
  */
object Bench {

  private val SuperlinearRatio = 12.0
  // below this, sf0.1 timing is scheduling noise, not algorithmic cost
  private val MinFlagSeconds = 1.0

  private def timeAll(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

  private def jsonMap(xs: Seq[(String, Double)]): String =
    xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // JVM/codegen/parquet-reader warm-up so the first measured query is
    // not charged ~5s of classloading; not counted in any timing.
    try {
      spark.range(1000000L).selectExpr("sum(id)")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }

    val results = timeAll(spark, sfDir)
    val total = results.map(_._2).sum

    val curveDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParent, "sf0.01")
      if (sys.env.getOrElse("SPARK_GRAFT_CURVE", "1") != "0" &&
          sibling.isDirectory &&
          sibling.getCanonicalPath != new java.io.File(sfDir).getCanonicalPath)
        Some(sibling.getPath)
      else None
    }
    val curve = curveDir.map { dir =>
      val small = timeAll(spark, dir)
      val smallMap = small.toMap
      val ratios = results.map { case (k, v) =>
        k -> (if (smallMap.getOrElse(k, 0.0) > 0.0) v / smallMap(k) else -1.0)
      }
      val superlinear = ratios.collect {
        case (k, r) if r > SuperlinearRatio &&
          results.toMap.getOrElse(k, 0.0) > MinFlagSeconds => k
      }
      s""","curve":{"dir":"$dir","queries":${jsonMap(small)},""" +
        s""""ratio":${jsonMap(ratios)},""" +
        s""""superlinear":${superlinear.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    }.getOrElse("")

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results)},"sf":"$sfDir"$curve}""")
    spark.stop()
  }
}
