package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** BM25 scoring core (t37): the distributed inverted-index pipeline is
  * re-derived scalar-by-scalar in plain Scala on a hand-sized corpus —
  * the same IEEE division/product/floor sequence the column expression
  * performs, so the micro-quantized scores must match bit-for-bit.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // corpus: probe d0 shares the rarer term x with d1 and the common
  // term y with d1 (tf 2) and d2; d3 shares nothing
  private val corpus = Seq(
    (0L, "x y"),
    (1L, "x y y z"),
    (2L, "y q"),
    (3L, "q r s"))

  // scalar re-derivation of one term's micro-quantized BM25 contribution
  private def termMicro(n: Long, tt: Long, df: Long, tf: Long, dl: Long): Long =
    math.floor(
      ((2.0 * n - 2 * df + 1) / (2 * df + 1))
        * ((22.0 * tt * tf) / (10 * tt * tf + 3 * tt + 9 * dl * n))
        * 1000000.0).toLong

  test("bm25 micros match the scalar re-derivation on a hand corpus") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = TextOps.bm25ScoresMicro(docs, col("doc_id") === 0)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap

    val n = 4L; val tt = 11L // 4 docs, 2+4+2+3 tokens
    // d1: term x (df 2, tf 1, dl 4) + term y (df 3, tf 2, dl 4)
    val d1 = termMicro(n, tt, 2, 1, 4) + termMicro(n, tt, 3, 2, 4)
    // d2: term y (df 3, tf 1, dl 2)
    val d2 = termMicro(n, tt, 3, 1, 2)
    assert(got == Map(1L -> d1, 2L -> d2), s"got $got")
  }

  test("rare shared term outranks common shared term") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = TextOps.bm25ScoresMicro(docs, col("doc_id") === 0)
      .orderBy(col("score_micro").desc).collect()
    // d1 matches x (rare) AND y; d2 only the corpus-common y
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(got.head.getLong(2) > got.last.getLong(2))
  }

  test("df cap drops a term present in >90% of docs from scoring") {
    import spark.implicits._
    // 10 docs all containing 'stop'; probe shares ONLY 'stop' with 9
    // of them and 'rare' with doc 1 — the capped stopword must
    // contribute nothing, so only doc 1 is scored at all
    val docs = ((0L to 9L).map(i => (i, if (i == 1) "stop rare" else "stop"))).toDF("doc_id", "text")
    val probe = Seq((10L, "stop rare")).toDF("doc_id", "text")
    val got = TextOps.bm25ScoresMicro(docs.unionAll(probe), col("doc_id") === 10)
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L), s"got $got")
  }
}
