package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Corpus

/** Boundary checks for the corpus-assembly API (the t14/t17/t22/t26/p01
  * queries oracle the same code paths at corpus scale).
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tokenBudget: the row landing exactly on the budget is admitted, the next is not") {
    import spark.implicits._
    val df = Seq(("a", 1L, 600L), ("a", 2L, 400L), ("a", 3L, 1L),
      ("b", 9L, 1000L)).toDF("source", "doc_id", "n_tokens")
    val got = Corpus.tokenBudget(df, "source", "doc_id", "n_tokens", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 9L)), got.toString)
  }

  test("tokenBudget: two-phase prefix sum equals the single-window form across bucket boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 40 docs over 2 sources, bucketWidth 4 -> 10 buckets per source;
    // budget chosen so the admission cut lands mid-bucket
    val df = (1L to 40L).map(i => (if (i % 2 == 0) "a" else "b", i, i % 7 + 1))
      .toDF("source", "doc_id", "n_tokens")
    val got = Corpus.tokenBudget(df, "source", "doc_id", "n_tokens",
        budget = 37L, bucketWidth = 4L)
      .select("source", "doc_id", "cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = df.withColumn("cum_tokens", sum(col("n_tokens"))
        .over(Window.partitionBy("source").orderBy("doc_id")))
      .filter(col("cum_tokens") <= 37L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == ref, s"two-phase $got vs single-window $ref")
    assert(got.nonEmpty && got.size < 40, got.toString)
  }

  test("interleaveBatches: round-robin slots, unequal groups leave holes, two-phase matches") {
    import spark.implicits._
    // groups a(4 rows), b(2 rows): slots a0,b0,a1,b1,a2,a3 -> with
    // batchSize 2: batches (a1,b1),(a2,b2),(a3),(a4) by slot numbering
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L),
      ("b", 15L), ("b", 25L)).toDF("g", "ord")
    val got = Corpus.interleaveBatches(df, "g", "ord", batchSize = 2,
        bucketWidth = 16L) // forces multiple buckets per group
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", 10L) -> ((0L, 0L)), ("b", 15L) -> ((0L, 1L)),
      ("a", 20L) -> ((1L, 0L)), ("b", 25L) -> ((1L, 1L)),
      ("a", 30L) -> ((2L, 0L)), // slot 4; slot 5 (b's 3rd) is a hole
      ("a", 40L) -> ((3L, 0L))), got.toString)
  }

  test("packBins: greedy prefix bins; an oversized doc owns the bin it starts") {
    import spark.implicits._
    val df = Seq(("s", 1L, 80L), ("s", 2L, 40L), ("s", 3L, 250L),
      ("s", 4L, 10L)).toDF("source", "doc_id", "n_tok")
    val got = Corpus.packBins(df, "source", "doc_id", "n_tok", 100L)
      .collect().map(r => r.getLong(1) -> r.getInt(4)).toMap
    // prefix starts: 0, 80, 120, 370 -> bins 0, 0, 1, 3
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 3), got.toString)
  }

  test("chunk: short doc is one chunk; window+1 tokens is two; tail is clipped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def toksDoc(id: Long, n: Int) =
      (id, (1 to n).map(i => s"w$i").toArray)
    val df = Seq(toksDoc(1L, 3), toksDoc(2L, 4), toksDoc(3L, 5))
      .toDF("doc_id", "toks")
    val got = Corpus.chunk(df, "doc_id", "toks", window = 4, stride = 2)
      .select("doc_id", "chunk_idx", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (1L, 0L) -> 3L,                 // shorter than the window: one clipped chunk
      (2L, 0L) -> 4L,                 // exactly the window: one chunk
      (3L, 0L) -> 4L, (3L, 1L) -> 3L  // window+1: full chunk + clipped tail
    ), got.toString)
  }

  test("qualityGate: integer rank cutoff keeps floor-fraction per group, ties broken by key") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.9), ("en", 3L, 0.5), ("en", 4L, 0.1),
      ("fr", 9L, 0.2)
    ).toDF("lang", "doc_id", "q")
    val got = Corpus.qualityGate(df, "lang", "q", "doc_id",
        keepNum = 1, keepDen = 2)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    // en: 4 docs, keep rank*2 <= 4 -> ranks 1,2 = docs 1,2 (tie by id);
    // fr: 1 doc, rank*2 <= 1 -> none
    assert(got == Map(1L -> 1, 2L -> 2), got.toString)
  }

  test("kAnonymityProfile: group-size histogram over the QI tuple (p10 kernel)") {
    import spark.implicits._
    val df = Seq(("en", "a"), ("en", "a"), ("en", "b"),
      ("fr", "a"), ("fr", "a"), ("fr", "a")).toDF("lang", "source")
    val got = Corpus.kAnonymityProfile(df, Seq("lang", "source"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // k → (n_groups, n_rows): one singleton (the re-identifiable row),
    // one pair, one triple
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 3L))), got.toString)
  }

  test("evalLeakageManifest: train doc sharing an eval 5-gram drops, clean docs survive, gate flags both ways (p12 kernel)") {
    import spark.implicits._
    val docs = Seq(
      // eval doc whose one 5-gram is the leak probe
      (10L, "test", "en", 5L, "v w x y z"),
      // leaky train doc: contains "v w x y z" verbatim → dropped
      (1L, "train", "en", 20L, "a b v w x y z"),
      // clean train docs (en fails the 2% gate at 1/2 dropped; fr passes)
      (2L, "train", "en", 30L, "p q r s t u"),
      (3L, "train", "fr", 40L, "p q r s t")
    ).toDF("doc_id", "split", "lang", "n_chars", "text")
    val got = graft.ops.PipelineOps.evalLeakageManifest(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(got.toSeq == Seq(
      // (lang, n_train, n_dropped, n_kept, chars_kept, leak_ppm, gate)
      ("en", 2L, 1L, 1L, 30L, 500000L, 0),
      ("fr", 1L, 0L, 1L, 40L, 0L, 1)), got.mkString(","))
  }

  test("shardPackingPlan: per-source size-sorted round-robin stripes, balance and conservation (p13 kernel)") {
    import spark.implicits._
    // srcA sizes 10,8,6,4 (doc_ids 1..4), srcB sizes 5,3 (5,6), k=2:
    // srcA ranks 1..4 → shards 0,1,0,1; srcB ranks 1,2 → shards 0,1
    val docs = Seq(
      ("srcA", 1L, 10L), ("srcA", 2L, 8L), ("srcA", 3L, 6L),
      ("srcA", 4L, 4L), ("srcB", 5L, 5L), ("srcB", 6L, 3L))
      .toDF("source", "doc_id", "n_tok")
    val got = graft.ops.PipelineOps.shardPackingPlan(docs, 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      // (shard, n_docs, n_tokens, n_sources, max_doc_tokens)
      (0, 3L, 21L, 2L, 10L),
      (1, 3L, 15L, 2L, 8L)), got.mkString(","))
    // conservation + per-shard doc balance within 1 (every source
    // stripes evenly, so the union does too)
    assert(got.map(_._2).sum == 6L && got.map(_._3).sum == 36L)
    assert(got.map(_._2).max - got.map(_._2).min <= 1L)
  }

  test("property: shardPackingPlan conserves docs/tokens and bounds doc skew by the source count (p13 kernel)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 4
    val gen = Gen.listOfN(60, Gen.zip(Gen.oneOf("s0", "s1", "s2"),
      Gen.choose(1L, 50L)))
    val docs = gen.apply(Gen.Parameters.default, Seed(43L))
      .getOrElse(fail("generator produced no sample"))
      .zipWithIndex.map { case ((src, tok), i) => (src, i.toLong, tok) }
    val got = graft.ops.PipelineOps.shardPackingPlan(
      docs.toDF("source", "doc_id", "n_tok"), k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // conservation: nothing dropped, nothing duplicated
    assert(got.map(_._2).sum == docs.size.toLong)
    assert(got.map(_._3).sum == docs.map(_._3).sum)
    // each source stripes within 1 per shard, so the union's per-shard
    // doc skew is bounded by the number of sources
    assert(got.map(_._2).max - got.map(_._2).min <= 3L, got.mkString(","))
  }
}
