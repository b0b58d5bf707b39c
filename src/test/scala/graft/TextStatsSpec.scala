package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** t40's power-law statistics pinned on a hand-counted fixture: the
  * exact integer counts, the two-point Zipf fit, and the half-corpus
  * Heaps fit (including the closed-vocabulary and single-type guard
  * branches).
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def profile(rows: Seq[(Long, String, String)]) =
    TextOps.powerLawProfile(
      spark.createDataFrame(rows).toDF("doc_id", "source", "text"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap

  test("hand-counted source: exact counts and both exponents") {
    // doc 0 (even id = in half): a a b ; doc 1: a b c d
    // counts: a=3 b=2 c=1 d=1 -> N=7 V=4; half: N_A=3 V_A=2 (a,b)
    val got = profile(Seq(
      (0L, "s", "a a b"), (1L, "s", "a b c d")))("s")
    assert(got.getLong(1) == 7L && got.getLong(2) == 4L) // n_tokens, n_types
    assert(got.getLong(3) == 3L) // top_freq = a
    assert(got.getLong(4) == 4L && got.getLong(5) == 1L) // k = V = 4, f_k = 1
    val zipf = math.log(1.0 / 3.0) / math.log(4.0)
    assert(math.abs(got.getDouble(6) - zipf) < 1e-12, got.getDouble(6).toString)
    assert(got.getLong(7) == 3L && got.getLong(8) == 2L) // half tokens/types
    val heaps = math.log(4.0 / 2.0) / math.log(7.0 / 3.0)
    assert(math.abs(got.getDouble(9) - heaps) < 1e-12, got.getDouble(9).toString)
  }

  test("closed vocabulary: Heaps exponent is exactly zero") {
    // both halves see the full {x,y} vocabulary -> ln(V/V_A) = ln 1 = 0
    val got = profile(Seq(
      (0L, "s", "x y x"), (1L, "s", "y x y")))("s")
    assert(got.getLong(2) == 2L && got.getLong(8) == 2L)
    assert(got.getDouble(9) == 0.0, got.getDouble(9).toString)
  }

  test("single-type source and empty half hit the guard branches") {
    // source t: one token type -> k = 1 -> zipf_slope guard = 0.0
    // source u: only odd doc ids -> empty half -> heaps guard = 0.0
    val got = profile(Seq(
      (0L, "t", "z z z"), (1L, "u", "p q")))
    assert(got("t").getLong(4) == 1L && got("t").getDouble(6) == 0.0)
    assert(got("u").getLong(7) == 0L && got("u").getDouble(9) == 0.0)
  }

  test("rank picks agree with a full-sort ranking (heap path parity)") {
    // 20 types with strictly decreasing frequency 24..5: k = 16, f_16 = 9
    val text = (1 to 20).flatMap(i => Seq.fill(25 - i)(s"w%02d".format(i)))
      .mkString(" ")
    val got = profile(Seq((1L, "s", text)))("s")
    assert(got.getLong(2) == 20L && got.getLong(3) == 24L)
    assert(got.getLong(4) == 16L && got.getLong(5) == 9L, got.toString)
  }

  test("vocab growth curve: hand-counted rungs, first occurrences bucket once") {
    import spark.implicits._
    // ids 0..7 -> id-space quartile bounds 2/4/6/8; token 'a' recurs
    // in three rungs but counts only at its FIRST occurrence (rung 1)
    val docs = Seq(
      (0L, "a b"), (1L, "a c"),   // rung 1: a, b, c
      (2L, "c d"), (3L, "d"),     // rung 2: +d
      (4L, "a"), (5L, "e"),       // rung 3: +e
      (6L, "f g"), (7L, "a f")    // rung 4: +f, g
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.vocabGrowthCurve(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, 2L, 2L, 3L, 3L),
      (2, 4L, 4L, 1L, 4L),
      (3, 6L, 6L, 1L, 5L),
      (4, 8L, 8L, 2L, 7L)), got.mkString(","))
  }
}
