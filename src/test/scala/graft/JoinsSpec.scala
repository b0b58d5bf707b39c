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

  test("rangeJoin rejects empty intervals and non-positive buckets") {
    val (left, right) = frames
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(left, right, "lts", "rts", 5L, 5L)
    }
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(left, right, "lts", "rts", 0L, 10L, Some(0L))
    }
  }
}
