package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps

/** Triangle counting must agree with hand-counted graphs, including the
  * degree-tie cases where the orientation falls back to the id order.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val df = spark.createDataFrame(edges).toDF("pa", "pb")
    val r = GraphOps.triangleStats(df).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("K4 plus a pendant edge: 4 triangles") {
    // complete graph on {1,2,3,4} (every degree equal — all ties) + 4-5
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(stats(k4 :+ (4L, 5L)) == (5L, 7L, 4L))
  }

  test("triangle-free star and path: 0 triangles") {
    assert(stats(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == (5L, 4L, 0L))
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (4L, 3L, 0L))
  }

  test("two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: mixed degrees (2,3,3,2)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(stats(e) == (4L, 5L, 2L))
  }

  test("clustering coefficients on K4 plus a pendant edge") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val df = spark.createDataFrame(k4 :+ (4L, 5L)).toDF("pa", "pb")
    val got = GraphOps.clusteringCoefficients(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // nodes 1-3: every neighbor pair closed (coeff 1); node 4: the
    // pendant opens 3 of its 6 neighbor pairs; node 5: deg 1, excluded
    assert(got == Map(
      1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)), 3L -> ((3L, 3L, 1.0)),
      4L -> ((4L, 3L, 0.5))), got.toString)
  }

  test("label spread on a path: labels move exactly one hop per round") {
    import org.apache.spark.sql.functions.col
    // path 1-2-3-4-5-6, seeds at the ends: 1 labeled 10, 6 labeled 60
    val path = spark.createDataFrame(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))).toDF("pa", "pb")
    val seeds = spark.createDataFrame(Seq((1L, 10L), (6L, 60L)))
      .toDF("node", "label")
    def run(rounds: Int): Map[Long, Long] =
      graft.api.Graph.labelSpread(path, seeds, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one round: only the direct neighbors are reached (synchronous
    // update — an in-place variant would leak further)
    assert(run(1) == Map(1L -> 10L, 2L -> 10L, 5L -> 60L, 6L -> 60L))
    // three rounds: node 4 (3 hops from seed 1, 2 from seed 6) has
    // heard both labels; MIN wins. Node 5 (4 hops from seed 1) still
    // holds 60 — 10 hasn't arrived yet.
    assert(run(3) == Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L,
      5L -> 60L, 6L -> 60L))
    // four rounds: 10 reaches node 5
    assert(run(4)(5L) == 10L)
    // seeds are pinned: 6 keeps 60 even after 10 reaches it
    assert(run(5)(6L) == 60L)
  }

  test("link features on two triangles sharing an edge") {
    // {1,2,3} + {2,3,4}: the only distance-2 non-edge is (1,4) with
    // common neighborhood {2,3}; deg(1)=deg(4)=2 -> jaccard 2/(2+2-2)=1
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val df = spark.createDataFrame(e).toDF("pa", "pb")
    val got = graft.api.Graph.linkFeatures(df, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 4L, 2L, 1.0)), got.mkString(","))
  }
}
