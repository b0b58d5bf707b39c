package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventOps

/** The e48 kernel: greedy-earliest existence must equal the brute
  * "exists t1 < t2 < t3 with types a,b,c" subsequence witness — the
  * argument the two keyed min-aggregates rest on — plus the edge
  * semantics: strict time ordering (simultaneous events never chain)
  * and repeated types (a,a,a needs three distinct times).
  */
class SequenceMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mine(rows: Seq[(Long, String, Long)]): Map[(String, String, String), Long] =
    EventOps.frequentSequences3(rows.toDF("user_id", "event_type", "ts_us"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap

  private def brute(rows: Seq[(Long, String, Long)]): Map[(String, String, String), Long] = {
    val byUser = rows.groupBy(_._1)
    val types = rows.map(_._2).distinct
    val support = for {
      a <- types; b <- types; c <- types
      n = byUser.count { case (_, evs) =>
        evs.exists { e1 => e1._2 == a &&
          evs.exists { e2 => e2._2 == b && e2._3 > e1._3 &&
            evs.exists(e3 => e3._2 == c && e3._3 > e2._3) } }
      }
      if n > 0
    } yield (a, b, c) -> n.toLong
    support.toMap
  }

  test("hand fixture: gaps allowed, strict order, repeated types, ppm base is ALL users") {
    val rows = Seq(
      (1L, "a", 10L), (1L, "x", 20L), (1L, "b", 30L), (1L, "c", 40L),
      (2L, "a", 10L), (2L, "c", 20L), (2L, "b", 30L), // a<c<b but no c after b
      (3L, "a", 10L), (3L, "a", 20L), (3L, "a", 30L), // repeats chain
      (4L, "b", 10L), (4L, "b", 10L)) // simultaneous: never chains
    val got = mine(rows)
    assert(got(("a", "b", "c")) == 1L) // only user 1 (gap over x)
    assert(got(("a", "c", "b")) == 1L) // user 2
    assert(got(("a", "a", "a")) == 1L) // user 3
    assert(!got.contains(("b", "b", "b"))) // strict > kills user 4
    // ppm denominator is the full user base (4), not supporters
    val ppm = EventOps.frequentSequences3(
        rows.toDF("user_id", "event_type", "ts_us"))
      .filter("a = 'a' AND b = 'b' AND c = 'c'")
      .select("support_ppm").collect().head.getLong(0)
    assert(ppm == 250000L)
  }

  test("property: greedy-earliest equals the brute subsequence witness on 25 random event logs") {
    val rnd = new scala.util.Random(48L)
    (1 to 25).foreach { trial =>
      val types = Seq("a", "b", "c", "d").take(2 + rnd.nextInt(3))
      val rows = for {
        u <- 1L to (3 + rnd.nextInt(8)).toLong
        _ <- 1 to (1 + rnd.nextInt(12))
      } yield (u, types(rnd.nextInt(types.size)),
        (1 + rnd.nextInt(15)).toLong) // small domain forces ts ties
      assert(mine(rows) == brute(rows), s"trial $trial: $rows")
    }
  }
}
