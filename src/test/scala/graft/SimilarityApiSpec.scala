package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Similarity
import graft.expr.VectorExprs
import graft.io.Sources

/** Public similarity API on vectors with KNOWN neighbor structure, and
  * the codegen'd dot product against the HOF formulation.
  */
class SimilarityApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-d toy space: 1≈2 (cos ~0.995), both orthogonal-ish to 3; 4 opposite of 1
  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),
    (5L, Seq(0.7f, 0.7f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dot_product expression equals the HOF aggregate formulation") {
    val e = Sources.table(spark, TestSpark.sf0001, "embeddings").limit(100)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("fast", VectorExprs.dot(col("v"), col("v")))
      .withColumn("slow", expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"))
    assert(e.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("cosineTopK ranks the known nearest neighbor first") {
    val top = Similarity.cosineTopK(vecs, probe = col("vec_id") === 1L, k = 4)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(2L, 5L, 3L, 4L))
    assert(top.head.getDouble(3) > 0.99)
    assert(top.last.getDouble(3) == -1.0)
  }

  test("annLsh buckets separate opposite vectors and find the near neighbor") {
    val out = Similarity.annLsh(vecs, probe = col("vec_id") === 1L, k = 3,
      planes = 4, dims = 4).collect()
    val neighbors = out.map(_.getLong(2)).toSet
    // 2 projects to the same side of every hyperplane as 1 (vectors are
    // nearly parallel); 4 is the exact opposite corner -> different bucket
    assert(neighbors.contains(2L))
    assert(!neighbors.contains(4L))
  }

  test("annIvf searches only nearby cells yet finds the true neighbor") {
    val out = Similarity.annIvf(vecs,
      centroidPred = col("vec_id").isin(1L, 3L), // two cells: +x-ish and +z
      probe = col("vec_id") === 2L, k = 2, nprobe = 1)
      .orderBy("rank").collect()
    assert(out.head.getLong(2) == 1L, out.mkString(","))
    assert(out.head.getDouble(3) > 0.99)
    // 4 (opposite) lands in the z-cell or ranks below — true neighbor first
  }

  test("cosineNearDupPairs: banded LSH finds the near-dup, skips opposites") {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.9,
      nBands = 4, bandBits = 2, dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // 1 and 2 are nearly parallel (cos ~0.995): some band of sign bits
    // must agree, and the verify keeps them above 0.9
    assert(keys.contains((1L, 2L)), s"near-dup pair missing: ${pairs.mkString(",")}")
    // opposite vectors can share no band (every sign bit flips) and
    // would fail the verify anyway
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs.forall(_._3 >= 0.9))
  }

  test("knnGraphWithinCells ranks only cellmates, tie-broken by neighbor id (s23 kernel)") {
    // two well-separated cells: {1,2,5} near the x-axis centroid,
    // {3} alone near the z-axis centroid
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.99, 0.1, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (5L, Seq(0.7, 0.7, 0.0, 0.0))
    ).toDF("vec_id", "v")
    val cent = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (200L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("c_id", "cv")
    val g = graft.api.Dedup.knnGraphWithinCells(corpus, cent, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // cell(100) = {1,2,5}: 1's nearest is 2 (cos ~0.995) then 5
    // (~0.707); 3 is alone in cell(200) → NO rows (a complete graph
    // needs multi-probe, which is the documented trade)
    assert(g == Set(
      (1L, 1, 2L), (1L, 2, 5L),
      (2L, 1, 1L), (2L, 2, 5L),
      (5L, 1, 2L), (5L, 2, 1L)), g.toString)
  }

  test("mmrSelect trades relevance for diversity and breaks ties by cand_id (s24 kernel)") {
    // q=1: A(10) rel .99, B(11) rel .98 but a near-clone of A
    // (sim .99), C(12) rel .60 and dissimilar to both (.10). Plain
    // top-2 = A,B; MMR(λ=0.7) must pick C second:
    //   B: 7·980000 − 3·990000 = 3_890_000
    //   C: 7·600000 − 3·100000 = 3_900_000  → C wins round 2
    // q=2: two equal-relevance, zero-similarity candidates — round-1
    // tie breaks to the lower id; only 2 candidates, so k=3 yields
    // just 2 picks for q=2.
    val rel = Seq(
      (1L, 10L, 990000L), (1L, 11L, 980000L), (1L, 12L, 600000L),
      (2L, 20L, 500000L), (2L, 21L, 500000L)
    ).toDF("q_id", "cand_id", "rel_mic")
    val sims = Seq(
      (1L, 10L, 11L, 990000L), (1L, 10L, 12L, 100000L),
      (1L, 11L, 12L, 100000L),
      (2L, 20L, 21L, 0L))
    val pairSim = (sims ++ sims.map(s => (s._1, s._3, s._2, s._4)))
      .toDF("q_id", "a_id", "b_id", "sim_mic")
    val got = Similarity.mmrSelect(rel, pairSim, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      (1L, 1, 10L, 6930000L),
      (1L, 2, 12L, 3900000L),
      (1L, 3, 11L, 3890000L),
      (2L, 1, 20L, 3500000L),
      (2L, 2, 21L, 3500000L)), got.toString)
  }

  test("hyperplaneBuckets is deterministic and 2^planes-bounded") {
    val b1 = Similarity.hyperplaneBuckets(vecs, planes = 4, dims = 4)
      .select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b2 = Similarity.hyperplaneBuckets(vecs, planes = 4, dims = 4)
      .select("vec_id", "bucket").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(b1 == b2)
    assert(b1.values.forall(_.length == 4))
  }

  test("s27 compaction: after = before - dead on every probed cell; probes live; exactly 2 cells per probe") {
    val rows = graft.ops.SimilarityOps.s27.fn(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (pid, _, rank, before, dead, after) =>
      assert(after == before - dead,
        s"probe $pid rank $rank: $after != $before - $dead")
      assert(pid % 11 == 5 && pid % 7 != 0, s"dead or non-wave probe $pid")
      assert(rank == 1 || rank == 2)
    }
    assert(rows.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == Seq(1, 2)))
    // the tombstone wave must actually reclaim something somewhere
    assert(rows.exists(_._5 > 0), "no probed cell carried dead weight")
  }
}
