package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 evidence (VERDICT item 4 follow-through): the driver
  * fixture's incidence is FLAT (every item ~27 customers at
  * sf0.01/sf0.1), so the registry's g25 shows the DIMSUM machinery
  * and its oracle contract but cannot show the lever — on flat
  * density there are no popular pairs to thin, and a thin sample is
  * just low recall everywhere. This probe measures the lever on the
  * power-law catalog it exists for (the same deterministic
  * `headtail` generator as the g14 prune probe): popular-popular
  * pairs have √n_a·√n_b ≫ γ, so they are sampled at p = γ/den ≪ 1 —
  * but those are exactly the pairs with co-counts large enough that
  * the re-inflated estimate keeps their RANKING, while rare pairs
  * pass through at p = 1 untouched (DIMSUM's guarantee is relative
  * error on high-magnitude entries, not uniform recall).
  *
  * Per rung: census (γ larger than any den — the draw keeps every
  * occurrence) vs a sampled dial, min-of-2 wall time + shuffle MB,
  * plus top-10 neighbor recall of the sampled ranking against the
  * census ranking — over ALL items and over the HEAD items
  * (popularity ≥ 64, the pairs the estimator is FOR). Writes
  * `tools/bench_g25_dimsum_r15.json`. Throwaway evidence tool; not
  * part of the query registry.
  */
object G25DimsumProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def drainMB(): Double = {
      org.apache.spark.sql.GraftSqlBridge.flushListenerBus(spark.sparkContext)
      shuffleBytes.getAndSet(0L) / 1e6
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }

    // a HEAD-DOMINATED variant of the g14 probe's deterministic
    // incidence: 80% of purchases Zipf over a 2k-item head, 20%
    // spread ~once-each over a giant tail — xxhash64 draws,
    // byte-identical across runs. The head share matters: the first
    // probe cut used the g14 probe's 30% head and learned that when
    // TAIL items dominate pair volume, every pair passes at p = 1
    // and the sampler has nothing to thin (census 14.6 s / 60.6 MB
    // vs γ=16 12.5 s / 54.9 MB — no lever, exactly like the flat
    // registry fixture). DIMSUM's lever lives where popular-popular
    // pairs dominate the expansion — the "everyone buys the hits"
    // catalog this generator models.
    def headtail(users: Long, purchases: Long): DataFrame =
      spark.range(purchases).select(
        (col("id") % users).as("u"),
        when(pmod(xxhash64(col("id"), lit(1)), lit(10L)) < 8,
          floor(exp(
            (pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).cast("double")
              / 1e6) * log(lit(2000.0)))))
          .otherwise(lit(1000000L) +
            pmod(xxhash64(col("id"), lit(3)), lit(purchases)))
          .cast("long").as("p"))

    val cap = Some(400L)
    val k = 10
    val censusGamma = 1000000 // > any √n_a·√n_b here: p = 1 everywhere

    def time(df: DataFrame, gamma: Int): (Double, Double) = {
      val runs = (1 to 2).map { _ =>
        sweep(); drainMB()
        val t0 = System.nanoTime()
        graft.api.Graph.dimsumPairEstimates(df, Seq(gamma), cap)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, drainMB())
      }
      runs.minBy(_._1)
    }

    def topk(est: DataFrame): DataFrame = {
      val sym = est.select(col("pa").as("item"), col("pb").as("neighbor"),
          col("est_cosine"))
        .unionAll(est.select(col("pb").as("item"), col("pa").as("neighbor"),
          col("est_cosine")))
      graft.api.Windows.topKPerGroup(sym, Seq("item"),
        Seq(("est_cosine", true), ("neighbor", false)), k)
        .select("item", "neighbor")
    }

    val rungs = Seq(
      ("headtail_small", 5000L, 200000L),
      ("headtail_big", 25000L, 1000000L))
    val gammas = Seq(8, 96)
    val out = rungs.map { case (name, users, purchases) =>
      val df = headtail(users, purchases)
      val np = df.select("u", "p").distinct()
        .groupBy("p").agg(count(lit(1)).as("n"))
      val headItems = np.filter(col("n") >= 64).select(col("p").as("item"))
      val nHead = headItems.count()
      def recallPpm(truth: DataFrame, got: DataFrame): Long = {
        val slots = truth.count()
        if (slots == 0) -1L
        else got.join(truth, Seq("item", "neighbor"), "left_semi").count() *
          1000000L / slots
      }
      def volumes(gamma: Int): (Long, Long) = {
        val est = graft.api.Graph.dimsumPairEstimates(df, Seq(gamma), cap)
        val r = est.agg(count(lit(1)).as("pairs"), sum("c").as("occ")).head()
        (r.getLong(0), r.getLong(1))
      }
      val censusEst = graft.api.Graph
        .dimsumPairEstimates(df, Seq(censusGamma), cap)
      val censusTop = topk(censusEst).cache()
      val censusHeadTop = censusTop.join(broadcast(headItems), "item").cache()
      val (cPairs, cOcc) = volumes(censusGamma)
      val (tc, sc) = time(df, censusGamma)
      val legs = gammas.map { gamma =>
        val sampledTop = topk(graft.api.Graph
          .dimsumPairEstimates(df, Seq(gamma), cap)).cache()
        val rAll = recallPpm(censusTop, sampledTop)
        val rHead = recallPpm(censusHeadTop,
          sampledTop.join(broadcast(headItems), "item"))
        sampledTop.unpersist(); sweep()
        val (pairs, occ) = volumes(gamma)
        val (ts, ss) = time(df, gamma)
        println(f"[g25probe] $name gamma$gamma=${ts}%.2fs/${ss}%.1fMB " +
          f"pairs=$pairs occ=$occ recall_all=${rAll}ppm recall_head=${rHead}ppm")
        f""""gamma$gamma":{"sec":$ts%.3f,"shuffle_mb":$ss%.1f,""" +
          s""""surviving_pairs":$pairs,"emitted_occurrences":$occ,""" +
          s""""recall_all_ppm":$rAll,"recall_head_ppm":$rHead}"""
      }
      censusTop.unpersist(); censusHeadTop.unpersist(); sweep()
      println(f"[g25probe] $name census=${tc}%.2fs/${sc}%.1fMB " +
        f"pairs=$cPairs occ=$cOcc head_items=$nHead")
      s"""{"rung":"$name","users":$users,"purchases":$purchases,""" +
        s""""head_items":$nHead,""" +
        f""""census":{"sec":$tc%.3f,"shuffle_mb":$sc%.1f,""" +
        s""""surviving_pairs":$cPairs,"emitted_occurrences":$cOcc},""" +
        legs.mkString(",") + "}"
    }
    val json = s"""{"probe":"g25_dimsum_powerlaw","question":"on a head-dominated catalog, what does each gamma dial buy (pre-aggregation stream + surviving pair keyspace) and cost (top-$k recall vs census, all items and the popularity>=64 head)?","note":"single-box map-side combine already collapses occurrence volume into per-pair partials, so shuffle_mb moves little at high gamma; the cluster-scale win is the pre-aggregation stream (hash-table pressure, emitted_occurrences) and - at thin dials - the surviving keyspace itself","reps":2,"k":$k,"head_popularity_floor":64,"rungs":[${out.mkString(",")}]}"""
    println(json)
    val w = new java.io.PrintWriter("tools/bench_g25_dimsum_r15.json", "UTF-8")
    try w.println(json) finally w.close()
    spark.stop()
  }
}
