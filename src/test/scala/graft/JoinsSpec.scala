package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Joins

/** The bucketed-time range join must be exactly the non-equi interval
  * join it replaces — same pairs, no duplicates — for every interval
  * shape (past-only, future-only, straddling zero) and for bucket
  * widths smaller than the window (the parallelism knob).
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frames = {
    val rnd = new scala.util.Random(42)
    val left = spark.createDataFrame(
      (1 to 200).map(i => (i.toLong, rnd.nextInt(100000).toLong))).toDF("l_id", "lts")
    val right = spark.createDataFrame(
      (1 to 300).map(i => (1000L + i, rnd.nextInt(100000).toLong))).toDF("r_id", "rts")
    (left, right)
  }

  test("rangeJoin equals the naive non-equi join, without duplicates") {
    val (left, right) = frames
    val cases = Seq(
      (-500L, 0L, None), // pure look-back (the r17 shape)
      (0L, 1000L, None), // pure look-ahead
      (-300L, 300L, Some(100L)), // straddling zero, fine buckets
      (-7L, 13L, Some(5000L))) // bucket far wider than the window
    for ((lo, hi, bucket) <- cases) {
      val got = Joins.rangeJoin(left, right, "lts", "rts", lo, hi, bucket)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = left.crossJoin(right)
        .filter(col("rts") >= col("lts") + lo && col("rts") < col("lts") + hi)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted == want.sorted, s"interval [$lo, $hi) bucket=$bucket")
      assert(got.distinct.size == got.size,
        s"duplicate pairs for interval [$lo, $hi) bucket=$bucket")
    }
  }

  test("asOfJoin equals the candidate-join + rank formulation on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // few keys + a narrow time range force shared timestamps (tie-break
    // coverage) and keys that exist on only one side (outer coverage)
    val left = spark.createDataFrame(
      (1 to 300).map(i => (i.toLong, (rnd.nextInt(7) + 1).toLong, rnd.nextInt(50).toLong)))
      .toDF("l_id", "l_key", "l_ts")
    val right = spark.createDataFrame(
      (1 to 300).map(i => (1000L + i, (rnd.nextInt(9) + 1).toLong, rnd.nextInt(50).toLong)))
      .toDF("r_id", "r_key", "r_ts")
    val got = Joins.asOfJoin(left, right,
        Seq("l_key"), Seq("r_key"), "l_ts", "r_ts", rightTiebreak = Seq("r_id"))
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val w = Window.partitionBy("l_id").orderBy(col("r_ts").desc, col("r_id").desc)
    val want = left
      .join(right, col("r_key") === col("l_key") && col("r_ts") <= col("l_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got.size == want.size && left.count() == got.size)
    val diffs = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
    assert(diffs.isEmpty, s"as-of divergence: ${diffs.take(5)}")
  }

  test("asOfJoin tolerance bounds the look-back like merge_asof") {
    val left = spark.createDataFrame(Seq(
      (1L, 1L, 100L),  // click at 95: within 10
      (2L, 1L, 120L),  // last click 95: 25 behind, outside 10
      (3L, 2L, 50L)))  // no click at all
      .toDF("l_id", "l_key", "l_ts")
    val right = spark.createDataFrame(Seq(
      (10L, 1L, 90L), (11L, 1L, 95L)))
      .toDF("r_id", "r_key", "r_ts")
    val got = Joins.asOfJoin(left, right, Seq("l_key"), Seq("r_key"),
        "l_ts", "r_ts", rightTiebreak = Seq("r_id"), toleranceUs = Some(10L))
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 11L, 2L -> -1L, 3L -> -1L), got.toString)
  }

  test("asOfJoin handles empty right side and rejects overlapping names") {
    val left = spark.createDataFrame(
      Seq((1L, 1L, 10L))).toDF("l_id", "l_key", "l_ts")
    val right = spark.createDataFrame(
      Seq.empty[(Long, Long, Long)]).toDF("r_id", "r_key", "r_ts")
    val out = Joins.asOfJoin(left, right, Seq("l_key"), Seq("r_key"),
      "l_ts", "r_ts").collect()
    assert(out.length == 1 && out.head.isNullAt(3))
    intercept[IllegalArgumentException] {
      Joins.asOfJoin(left, left, Seq("l_key"), Seq("l_key"), "l_ts", "l_ts")
    }
  }

  test("rangeJoin rejects empty intervals and non-positive buckets") {
    val (left, right) = frames
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(left, right, "lts", "rts", 5L, 5L)
    }
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(left, right, "lts", "rts", 0L, 10L, Some(0L))
    }
  }

  test("intervalJoin equals the naive overlap join, without duplicates") {
    val rnd = new scala.util.Random(13)
    // varied lengths (1..5000) so intervals span 0..6 buckets; a few
    // empty intervals (end == start) that must match nothing
    val left = spark.createDataFrame((1 to 200).map { i =>
      val s = rnd.nextInt(50000).toLong
      (i.toLong, s, s + (if (i % 17 == 0) 0L else rnd.nextInt(5000).toLong + 1))
    }).toDF("l_id", "ls", "le")
    val right = spark.createDataFrame((1 to 300).map { i =>
      val s = rnd.nextInt(50000).toLong
      (1000L + i, s, s + (if (i % 13 == 0) 0L else rnd.nextInt(5000).toLong + 1))
    }).toDF("r_id", "rs", "re")
    for (bucket <- Seq(1000L, 4000L, 100000L)) {
      val got = Joins.intervalJoin(left, right, "ls", "le", "rs", "re", bucket)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = left.crossJoin(right)
        .filter(col("ls") < col("re") && col("rs") < col("le") &&
          col("le") > col("ls") && col("re") > col("rs"))
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted == want.sorted, s"bucket=$bucket")
      assert(got.distinct.size == got.size, s"duplicate pairs, bucket=$bucket")
    }
  }

  test("native interval join equals the naive overlap join for every partition count") {
    val rnd = new scala.util.Random(31)
    // varied lengths incl. giants (the case that breaks fixed buckets:
    // a 40000-long interval would explode into 40 copies at width
    // 1000); a few empties that must match nothing
    val left = spark.createDataFrame((1 to 200).map { i =>
      val s = rnd.nextInt(50000).toLong
      val len = if (i % 17 == 0) 0L
        else if (i % 11 == 0) 40000L else rnd.nextInt(5000).toLong + 1
      (i.toLong, s, s + len)
    }).toDF("l_id", "ls", "le")
    val right = spark.createDataFrame((1 to 300).map { i =>
      val s = rnd.nextInt(50000).toLong
      (1000L + i, s, s + (if (i % 13 == 0) 0L else rnd.nextInt(5000).toLong + 1))
    }).toDF("r_id", "rs", "re")
    val want = left.crossJoin(right)
      .filter(col("ls") < col("re") && col("rs") < col("le") &&
        col("le") > col("ls") && col("re") > col("rs"))
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    for (parts <- Seq(1, 7, 32)) {
      val got = Joins.intervalJoinNative(left, right, "ls", "le", "rs", "re",
          numPartitions = Some(parts))
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.distinct.size == got.size, s"duplicate pairs at parts=$parts")
      assert(got.sorted == want, s"parts=$parts")
    }
    // the custom exec must actually be planned (no fallback)
    val plan = Joins.intervalJoinNative(left, right, "ls", "le", "rs", "re")
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoinExec") || plan.contains("IntervalJoin"), plan)
  }

  test("skewSplitJoin equals the plain join and keeps both physical paths") {
    val rnd = new scala.util.Random(99)
    // one planet-sized key (0) + a uniform tail — the shape the split is for
    val facts = spark.createDataFrame((1 to 2000).map { i =>
      val k = if (i % 3 == 0) 0L else rnd.nextInt(200).toLong + 1
      (i.toLong, k)
    }).toDF("f_id", "f_key")
    val dim = spark.createDataFrame(
      (0 to 200).map(k => (k.toLong, s"d$k"))).toDF("d_key", "d_name")
    // disable size-based auto-broadcast so the plan split is the
    // operator's explicit hints, not the tiny test fixture's size
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val got = Joins.skewSplitJoin(facts, dim, "f_key", "d_key", topHotKeys = 5)
      val want = facts.join(dim, col("f_key") === col("d_key"))
      assert(got.select("f_id", "d_name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
        .sameElements(want.select("f_id", "d_name").collect().map(r => (r.getLong(0), r.getString(1))).sorted))
      // the hot path must be a broadcast join, the cold path a shuffle join
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "cold path should stay a shuffle join:\n" + plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
