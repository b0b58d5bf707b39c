package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 evidence (VERDICT item 1): the a-priori support prune in
  * [[graft.api.Graph.itemCfSimilarity]] is worth nothing on the flat
  * driver fixture (every item clears the support floor — measured
  * pure overhead in r10), so this probe measures it on power-law
  * catalogs — and on BOTH regimes the auto rule must separate:
  *
  *  - `loguniform`: Zipf-1 item draw. The tail is ~94% of ITEMS but
  *    only ~21% of incidence ROWS — first probe run showed the prune
  *    LOSES here (2.9 → 4.7 s), which is why the auto rule keys on
  *    tail ROW share (predicts the pair-volume cut), not item share.
  *    Expected: auto OFF, forced prune slower.
  *  - `headtail`: 30% of purchases Zipf over a 2k-item head, 70%
  *    spread ~once-each over a giant tail (the "most catalog items
  *    are rarely bought" production shape). Tail rows ≈ 70% → pair
  *    volume cut ≈ 15× (baskets shrink 10 → 3). Expected: auto ON,
  *    prune faster with less shuffle.
  *
  * All draws are deterministic (xxhash64 of the purchase id), so both
  * rungs and both variants see byte-identical data with no RNG.
  * Times pruned vs unpruned (min-of-2, the bench statistic), records
  * shuffle bytes per variant, asserts the outputs are row-identical,
  * and reports the AUTO decision. Writes
  * `tools/bench_g14_prune_r14.json`. Throwaway evidence tool; not part
  * of the query registry.
  */
object G14PruneProbe {
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

    /** Zipf-1 incidence: `purchases` rows, user = row % users, item
      * rank = floor(exp(u01 * ln(items))) with u01 a deterministic
      * hash-uniform — P(rank ≈ r) ∝ 1/r. Tail holds most ITEMS but a
      * minority of ROWS (∝ the log of the rank ratio).
      */
    def loguniform(users: Long, purchases: Long, items: Long): DataFrame =
      spark.range(purchases).select(
        (col("id") % users).as("u"),
        floor(exp(
          (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 1e6)
            * log(lit(items.toDouble)))).cast("long").as("p"))

    /** Head + long tail: 30% of purchases Zipf over a 2k-item head,
      * 70% spread ~once-each across a purchase-sized tail id space —
      * the production catalog shape where rarely-bought items carry
      * most of the incidence volume.
      */
    def headtail(users: Long, purchases: Long): DataFrame =
      spark.range(purchases).select(
        (col("id") % users).as("u"),
        when(pmod(xxhash64(col("id"), lit(1)), lit(10L)) < 3,
          floor(exp(
            (pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).cast("double")
              / 1e6) * log(lit(2000.0)))))
          .otherwise(lit(1000000L) +
            pmod(xxhash64(col("id"), lit(3)), lit(purchases)))
          .cast("long").as("p"))

    val minShared = 5
    def run(df: DataFrame, prune: Option[Boolean]): (Double, Double, Long) = {
      // min-of-2 wall time; shuffle from the min run
      val runs = (1 to 2).map { _ =>
        sweep(); drainMB()
        val t0 = System.nanoTime()
        val n = graft.api.Graph.itemCfSimilarity(df, minShared = minShared,
          k = 10, maxBasket = Some(400L), supportPrune = prune).count()
        ((System.nanoTime() - t0) / 1e9, drainMB(), n)
      }
      runs.minBy(_._1)
    }

    // headtail baskets are DENSE (40 items/user): the pair expansion
    // is quadratic in basket size, so this is the regime the prune
    // exists for — sparse baskets make every variant cheap and only
    // the shuffle drop is visible
    val rungs = Seq(
      ("loguniform_small", 20000L, 200000L),
      ("loguniform_big", 200000L, 2000000L),
      ("headtail_small", 5000L, 200000L),
      ("headtail_big", 50000L, 2000000L))
    val out = rungs.map { case (name, users, purchases) =>
      val df =
        if (name.startsWith("loguniform"))
          loguniform(users, purchases, purchases / 4)
        else headtail(users, purchases)
      // identity check once per rung: pruned and unpruned result sets
      // must be row-identical (sort-collect compare is fine at these
      // sizes and stronger than count parity)
      val a = graft.api.Graph.itemCfSimilarity(df, minShared, 10,
        Some(400L), Some(false)).orderBy("item", "neighbor").collect().toSeq
      val b = graft.api.Graph.itemCfSimilarity(df, minShared, 10,
        Some(400L), Some(true)).orderBy("item", "neighbor").collect().toSeq
      require(a == b, s"$name: pruned != unpruned (${a.size} vs ${b.size} rows)")
      sweep()
      val auto = graft.api.Graph.itemCfSimilarity(df, minShared, 10,
        Some(400L))
      val autoPrunes =
        auto.queryExecution.optimizedPlan.toString.contains("LeftSemi")
      sweep()
      val (tu, su, nu) = run(df, Some(false))
      val (tp, sp, np) = run(df, Some(true))
      println(f"[g14probe] $name rows=$nu unpruned=${tu}%.2fs/${su}%.1fMB " +
        f"pruned=${tp}%.2fs/${sp}%.1fMB auto_prunes=$autoPrunes")
      require(nu == np, s"$name: count drift $nu vs $np")
      s"""{"rung":"$name","users":$users,"purchases":$purchases,""" +
        s""""result_rows":$nu,"equal":true,"auto_prunes":$autoPrunes,""" +
        f""""unpruned":{"sec":$tu%.3f,"shuffle_mb":$su%.1f},""" +
        f""""pruned":{"sec":$tp%.3f,"shuffle_mb":$sp%.1f}}"""
    }
    val json = s"""{"probe":"g14_support_prune","auto_rule":"tail ROW share >= 0.5","min_shared":$minShared,"reps":2,"expected":{"loguniform":"auto OFF (tail ~21pct of rows), forced prune loses","headtail":"auto ON (tail ~70pct of rows), prune wins"},"rungs":[${out.mkString(",")}]}"""
    println(json)
    val w = new java.io.PrintWriter("tools/bench_g14_prune_r14.json", "UTF-8")
    try w.println(json) finally w.close()
    spark.stop()
  }
}
