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

  test("hand-counted source: exact counts and both ppm ratios") {
    // doc 0 (even id = in half): a a b ; doc 1: a b c d
    // counts: a=3 b=2 c=1 d=1 -> N=7 V=4; half: N_A=3 V_A=2 (a,b)
    val got = profile(Seq(
      (0L, "s", "a a b"), (1L, "s", "a b c d")))("s")
    assert(got.getLong(1) == 7L && got.getLong(2) == 4L) // n_tokens, n_types
    assert(got.getLong(3) == 3L) // top_freq = a
    assert(got.getLong(4) == 4L && got.getLong(5) == 1L) // k = V = 4, f_k = 1
    assert(got.getLong(6) == 333333L, got.getLong(6).toString) // 1e6·1/3
    assert(got.getLong(7) == 3L && got.getLong(8) == 2L) // half tokens/types
    assert(got.getLong(9) == 2000000L, got.getLong(9).toString) // 1e6·4/2
    assert(got.getLong(10) == 2333333L, got.getLong(10).toString) // 1e6·7/3
  }

  test("closed vocabulary: Heaps growth ratio is exactly 1e6") {
    // both halves see the full {x,y} vocabulary -> V/V_half = 1
    val got = profile(Seq(
      (0L, "s", "x y x"), (1L, "s", "y x y")))("s")
    assert(got.getLong(2) == 2L && got.getLong(8) == 2L)
    assert(got.getLong(9) == 1000000L, got.getLong(9).toString)
    assert(got.getLong(10) == 2000000L, got.getLong(10).toString) // 1e6·6/3
  }

  test("single-type source and empty half hit the degenerate branches") {
    // source t: one token type -> k = 1, f_k = top_freq -> decay 1e6
    // source u: only odd doc ids -> empty half -> growth/stretch 0
    val got = profile(Seq(
      (0L, "t", "z z z"), (1L, "u", "p q")))
    assert(got("t").getLong(4) == 1L && got("t").getLong(6) == 1000000L)
    assert(got("u").getLong(7) == 0L && got("u").getLong(9) == 0L)
    assert(got("u").getLong(10) == 0L)
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

  test("termBurstiness: tf counts occurrences, df containing docs, ratio and floor-ppm exact (t42 kernel)") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.termBurstiness(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      // (term, tf, df, burstiness, df_ppm over N=3)
      ("a", 3L, 2L, 1.5, 666666L),
      ("b", 1L, 1L, 1.0, 333333L),
      ("c", 4L, 2L, 2.0, 666666L)), got.mkString(","))
  }

  test("lexicalRichness: type/hapax/dis counts and floor-ppm ratios per source (t43 kernel)") {
    import spark.implicits._
    // srcA term counts: a=3, b=2, c=1, d=1 → 7 tokens, 4 types,
    // 2 hapax (c, d), 1 dis (b); srcB is the 1-token degenerate case
    val docs = Seq(("srcA", "a a b c"), ("srcA", "a d b"), ("srcB", "x"))
      .toDF("source", "text")
    val got = graft.ops.TextOps.lexicalRichness(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      // (source, n_tokens, n_types, n_hapax, n_dis, ttr_ppm, hapax_ppm)
      ("srcA", 7L, 4L, 2L, 1L, 571428L, 500000L),
      ("srcB", 1L, 1L, 1L, 0L, 1000000L, 1000000L)), got.mkString(","))
  }
}
