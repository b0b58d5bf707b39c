package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only microbench: decompose g25's DIMSUM draw cost — how much of
  * the pair-stream pass is the md5 coin (concat_ws + md5 + substr +
  * conv) vs the expansion itself. Drives the decision whether a custom
  * digest-prefix expression is worth building. Not a graded surface.
  */
object CoinProbe {
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
    val inc = spark.read.parquet(
      graft.ops.GraphOps.ensureCfIncidence(spark, sfDir))
    val np = inc.groupBy("p").agg(count(lit(1)).as("n"))
    val baskets = inc.join(broadcast(np), "p")
      .select(col("u"), struct(col("p"), col("n")).as("pn"))
      .groupBy("u")
      .agg(sort_array(collect_set(col("pn"))).as("ps"))
      .filter(size(col("ps")) <= 64)
    val cand = baskets
      .select(col("u"), explode(expr(
        """flatten(transform(ps,
          |  (x, i) -> transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x.p AS pa, x.n AS na,
          |                        y.p AS pb, y.n AS nb))))""".stripMargin))
        .as("q"))
      .select(col("u"), col("q.pa").as("pa"), col("q.na").as("na"),
        col("q.pb").as("pb"), col("q.nb").as("nb"))
      .localCheckpoint(true)
    println(s"COIN cand rows = ${cand.count()}")
    def time(tag: String, c: org.apache.spark.sql.Column): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        cand.select(c.as("x")).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"COIN $tag%-12s min=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("baseline", col("pa") + col("pb"))
    time("concat", concat_ws("|", col("u").cast("string"),
      col("pa").cast("string"), col("pb").cast("string")))
    time("md5", md5(concat_ws("|", col("u").cast("string"),
      col("pa").cast("string"), col("pb").cast("string"))))
    time("md5conv", expr(
      "CAST(CAST(conv(substr(md5(concat_ws('|', CAST(u AS STRING), " +
        "CAST(pa AS STRING), CAST(pb AS STRING))), 1, 15), 16, 10) " +
        "AS BIGINT) AS DOUBLE)"))
    time("md5_u60", expr(
      "CAST(md5_u60(concat_ws('|', CAST(u AS STRING), " +
        "CAST(pa AS STRING), CAST(pb AS STRING))) AS DOUBLE)"))
    spark.stop()
  }
}
