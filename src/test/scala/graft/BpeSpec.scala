package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE merge semantics (t33/t34) on crafted words the sf
  * fixtures don't contain — above all the GREEDY-OVERLAP edge: merging
  * (a,a) into 'aaa' must produce [aa, a] (left-to-right non-overlap),
  * the convention both Spark's string replace and the DuckDB oracle's
  * share, and the one reference BPE implementations use. The sf-level
  * oracle proves engine parity on real data; this spec proves the
  * semantics are the INTENDED ones on the adversarial inputs.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_bpe").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t44 transfer drift: shifted mixture trains different merges; signed drift and shared-merge count (nonzero-drift fixture)") {
    // the sf fixtures' flat vocabulary trains identical twins (t44
    // reads drift 0 / shared 3 there); this fixture forces the split:
    // source 'web' (md5 bucket 37 < 128, IN the shifted mixture) is
    // all 'bab'; 'wiki' (bucket 213, full-corpus-only) is all 'cccc'
    // and dominates full training
    val dir = Files.createTempDirectory("graft_bpe_t44").toString
    Seq((0L, "bab bab", "web"), (1L, "cccc cccc cccc", "wiki"))
      .map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextOps.t44.fn(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // full training never leaves the c-family: greedy non-overlap
    // makes cccc -> [cc,c,c] (the merge consumes the separator), so
    // its rounds are (c,c) x9, (c,c) again x3 (ties (cc,c) at 3,
    // lexicographic lhs), (cc,cc) x3 — bab is never touched. Shifted
    // training (web only): (a,b), then (b,ab), then nothing (the
    // round-3 winner frame is empty — merge is a no-op). encode:
    // bab = 3 tokens base / 1 shifted; cccc = 1 base / 4 shifted;
    // the two merge tables share NOTHING — full divergence, signed
    // drift in both directions
    assert(got == Seq(
      ("web", 2L, 6L, 2L, -666666L, 0L),
      ("wiki", 3L, 3L, 12L, 3000000L, 0L)), got.toString)
  }

  test("t33 training: greedy overlap, occurrence weighting, lexicographic ties") {
    // word freqs: aaa x2, bab x1
    val dir = fixture(Seq("aaa aaa", "bab"))
    val got = graft.ops.TextOps.t33.fn(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      // (a,a) counts BOTH overlapping positions in each 'aaa' (naive
      // get_stats), weighted by the 2 occurrences: 2 pairs x 2 = 4
      (1, "a", "a", "aa", 4L),
      // greedy merge left 'aaa' as [aa, a], so round 2 sees (aa, a) —
      // NOT (a, aa), which an overlap-double-merge would have produced
      (2, "aa", "a", "aaa", 2L),
      // 'bab' pairs (a,b) and (b,a) tie at 1; (a,b) wins the
      // lexicographic (lhs, rhs) tie-break
      (3, "a", "b", "ab", 1L)), got.toString)
  }

  test("t34 encode: merges applied in training order; singletons pass through") {
    val dir = fixture(Seq("aaa aaa", "bab"))
    val got = graft.ops.TextOps.t34.fn(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // aaa -> [aaa] (1 token); bab -> m3 (a,b) applies -> [b, ab]
    // (2 tokens); n_words 3, n_chars 9, n_tokens 1+1+2 = 4
    assert(got == Seq(("web", 3L, 9L, 4L, 4.0 / 3, 9.0 / 4)), got.toString)
  }

  test("single-char words never enter pair counts but are encoded") {
    val dir = fixture(Seq("a a a a ab"))
    val rows = graft.ops.TextOps.t33.fn(spark, dir)
      .as[(Int, String, String, String, Long)].collect()
    // the only pair in the corpus is ab's (a,b), once
    assert(rows.head == ((1, "a", "b", "ab", 1L)), rows.head.toString)
    val enc = graft.ops.TextOps.t34.fn(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // 4x 'a' (1 token each) + 'ab' merged to 1 token = 5 tokens, 6 chars
    assert(enc == Seq(("web", 5L, 6L, 5L, 1.0, 6.0 / 5)), enc.toString)
  }
}
