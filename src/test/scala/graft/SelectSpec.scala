package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.api.Select

/** The p15 skyline kernel: hand-pinned frontier (ties, strict
  * dominance, mixed orientations), the cap guard, and the executable
  * correctness argument — grid-pruned skyline equals brute-force
  * dominance filtering on random integer frames, across bin counts
  * (the prune must be invisible in the result).
  */
class SelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skylineIds(rows: Seq[(Long, Long, Long, Long)],
      bins: Long = 8L): Set[Long] =
    Select.paretoSkyline(rows.toDF("id", "info", "cost", "rep"),
        Seq("info" -> true, "cost" -> false, "rep" -> false), bins = bins)
      .select("id").collect().map(_.getLong(0)).toSet

  /** Brute-force oracle: q dominates p iff >= on all oriented axes
    * and > on at least one (info maximized; cost, rep minimized).
    */
  private def bruteIds(rows: Seq[(Long, Long, Long, Long)]): Set[Long] =
    rows.filter { p =>
      !rows.exists(q =>
        q._2 >= p._2 && q._3 <= p._3 && q._4 <= p._4 &&
          (q._2 > p._2 || q._3 < p._3 || q._4 < p._4))
    }.map(_._1).toSet

  test("hand fixture: strict dominance drops, duplicate vectors tie onto the frontier, incomparables stay") {
    val rows = Seq(
      (1L, 10L, 5L, 0L),  // frontier: best info
      (2L, 10L, 5L, 0L),  // duplicate of 1 — neither dominates: both stay
      (3L, 9L, 5L, 0L),   // dominated by 1 (less info, same cost/rep)
      (4L, 8L, 3L, 0L),   // frontier: cheaper, incomparable with 1
      (5L, 8L, 3L, 1L),   // dominated by 4 (same info/cost, more rep)
      (6L, 1L, 1L, 0L),   // frontier: cheapest
      (7L, 1L, 2L, 5L))   // dominated by 6
    assert(skylineIds(rows) == Set(1L, 2L, 4L, 6L))
    assert(bruteIds(rows) == Set(1L, 2L, 4L, 6L))
  }

  test("single-objective skyline is the set of maxima (all ties kept)") {
    val rows = Seq((1L, 7L), (2L, 7L), (3L, 3L), (4L, 6L))
    val ids = Select.paretoSkyline(rows.toDF("id", "v"),
        Seq("v" -> true))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("maxSurvivors cap fires before the broadcast quadratic leg") {
    // one cell (all identical): nothing prunes, survivors = all rows
    val rows = (1L to 50L).map(i => (i, 5L, 5L, 5L))
    val ex = intercept[IllegalArgumentException] {
      skylineIds(rows) // default cap passes
      Select.paretoSkyline(rows.toDF("id", "info", "cost", "rep"),
          Seq("info" -> true, "cost" -> false, "rep" -> false),
          maxSurvivors = 10L)
        .collect()
    }
    assert(ex.getMessage.contains("survivors"))
  }

  test("non-integral objective is rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      Select.paretoSkyline(Seq((1L, 0.5)).toDF("id", "v"),
        Seq("v" -> true))
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("property: kernel equals brute force at 2 and 4 objectives (dimension generality)") {
    val rnd = new scala.util.Random(24L)
    def bruteN(rows: Seq[(Long, Seq[Long])]): Set[Long] =
      rows.filter { case (_, p) =>
        !rows.exists { case (_, q) =>
          p.indices.forall(i => q(i) >= p(i)) &&
            p.indices.exists(i => q(i) > p(i)) }
      }.map(_._1).toSet
    Seq(2, 4).foreach { d =>
      (1 to 10).foreach { trial =>
        val n = 15 + rnd.nextInt(60)
        val dom = 1 + rnd.nextInt(10)
        val rows = (1L to n.toLong).map(i =>
          (i, Seq.fill(d)(rnd.nextInt(dom).toLong)))
        val df = spark.createDataFrame(
          rows.map { case (id, os) =>
            org.apache.spark.sql.Row.fromSeq(id +: os) }.toList.asJava,
          org.apache.spark.sql.types.StructType(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType) +:
              (0 until d).map(i => org.apache.spark.sql.types.StructField(
                s"o$i", org.apache.spark.sql.types.LongType))))
        val got = Select.paretoSkyline(df,
            (0 until d).map(i => s"o$i" -> true), bins = 3L)
          .select("id").collect().map(_.getLong(0)).toSet
        assert(got == bruteN(rows), s"d=$d trial $trial")
      }
    }
  }

  test("p16 identity: skyline(skyline(B) ∪ I) equals skyline(B ∪ I) on 20 random base/batch splits") {
    val rnd = new scala.util.Random(16L)
    (1 to 20).foreach { trial =>
      val nb = 10 + rnd.nextInt(60)
      val ni = 1 + rnd.nextInt(20)
      val dom = 1 + rnd.nextInt(12) // heavy ties
      def mk(ids: Range) = ids.map(i =>
        (i.toLong, rnd.nextInt(dom).toLong, rnd.nextInt(dom).toLong,
          rnd.nextInt(dom).toLong))
      val b = mk(1 until (nb + 1))
      val i = mk((nb + 1) until (nb + ni + 1))
      val full = bruteIds(b ++ i)
      // incremental: base frontier rows + batch, through the kernel
      val fb = bruteIds(b)
      val fbRows = b.filter(r => fb.contains(r._1)) ++ i
      assert(skylineIds(fbRows) == full,
        s"trial $trial: maintenance identity broken")
    }
  }

  test("p16 statuses partition: a displaced doc is dominated only by an ingest doc") {
    // base frontier doc 1 is displaced by batch doc 10; doc 2 survives
    val rows = Seq(
      (1L, 5L, 5L, 5L), (2L, 9L, 9L, 9L), (3L, 4L, 6L, 6L),
      (10L, 6L, 4L, 4L))
    val base = rows.filter(_._1 < 10L)
    val full = bruteIds(rows)
    assert(bruteIds(base) == Set(1L, 2L))
    assert(full == Set(2L, 10L)) // 1 displaced by 10; 2 retained; 10 entered
  }

  test("property: grid-pruned skyline equals brute force on 30 random frames, across bin counts") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 30).foreach { trial =>
      val n = 20 + rnd.nextInt(120)
      // small value domains force heavy ties; larger ones spread cells
      val dom = 1 + rnd.nextInt(if (trial % 2 == 0) 6 else 300)
      val rows = (1L to n.toLong).map(i =>
        (i, rnd.nextInt(dom).toLong, rnd.nextInt(dom).toLong,
          rnd.nextInt(dom).toLong))
      val expected = bruteIds(rows)
      val bins = Seq(2L, 8L)(trial % 2)
      assert(skylineIds(rows, bins = bins) == expected,
        s"trial $trial (n=$n dom=$dom bins=$bins)")
    }
  }
}
