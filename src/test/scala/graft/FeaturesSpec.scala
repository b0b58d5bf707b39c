package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Features

/** Hand-computed boundary checks for the feature-extraction API (the
  * registered e20–e26 queries oracle the same code paths at corpus
  * scale; these pin the small/degenerate shapes an oracle diff would
  * only catch indirectly).
  */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaks: runs split on gaps, singleton users count one streak") {
    import spark.implicits._
    val du = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 7L),
      ("b", 5L)
    ).toDF("user_id", "day")
    val got = Features.streaks(du, "user_id", "day")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((3L, 2L, 4L)), got.toString)
    assert(got("b") == ((1L, 1L, 1L)), got.toString)
  }

  test("cusumDrift: closed-form prefix-sum/min fold equals the direct recursion") {
    import spark.implicits._
    // a burst against a flat baseline: full-series stats (the detector
    // normalizes against everything it has seen) still leave the
    // 4-point excursion far outside h·σ
    val xs = Seq.fill(10)(10L) ++ Seq(100L, 100L, 100L, 100L) ++
      Seq.fill(10)(10L)
    val df = xs.zipWithIndex
      .map { case (x, t) => ("g", t.toLong, x) }
      .toDF("grp", "t", "x")
    val got = Features.cusumDrift(df, "grp", "t", "x", h = 4.0, k = 0.5)
      .orderBy("t")
      .select("s_scaled", "drift")
      .collect().map(r => (r.getLong(0), r.getInt(1)))

    // reference: the literal recursion S_t = max(0, S_{t-1} + y_t) on
    // the same scaled integers (y = n*x - s1 - ceil(k * sqrt(n*s2 - s1^2)))
    val n = xs.size.toLong
    val s1 = xs.sum
    val s2 = xs.map(x => x * x).sum
    val scaledSigma = math.sqrt((n * s2 - s1 * s1).toDouble)
    val allow = math.ceil(0.5 * scaledSigma).toLong
    var s = 0L
    val want = xs.map { x =>
      s = math.max(0L, s + (n * x - s1 - allow))
      (s, if (s.toDouble > 4.0 * scaledSigma) 1 else 0)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // the step at t=4 must actually fire the detector at least once
    assert(want.exists(_._2 == 1), "fixture never crosses the threshold")
  }

  test("denseGrid: silent units appear zero-filled and flagged") {
    import spark.implicits._
    val df = Seq(("x", 2L), ("x", 2L), ("x", 5L)).toDF("k", "u")
    val got = Features.denseGrid(df, "k", "u")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getInt(3))))
      .toMap
    assert(got == Map(
      2L -> ((2L, 0)), 3L -> ((0L, 1)), 4L -> ((0L, 1)), 5L -> ((1L, 0))),
      got.toString)
  }

  test("lagFeatures: missing history is -1, lags follow the declared order") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, 10L, 100L), ("u", 2L, 20L, 200L), ("u", 3L, 30L, 300L)
    ).toDF("user_id", "event_id", "us", "cents")
    val got = Features.lagFeatures(df, "user_id", Seq("us", "event_id"),
        "cents", Seq(1, 2))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // (cents_lag1, cents_lag2, gap1_us)
    assert(got(1L) == ((-1L, -1L, -1L)), got.toString)
    assert(got(2L) == ((100L, -1L, 10L)), got.toString)
    assert(got(3L) == ((200L, 100L, 10L)), got.toString)
  }

  test("zscore: exact moments give unit z for a symmetric pair; constant group is NULL") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 3L),
      ("c", 3L, 5L), ("c", 4L, 5L)
    ).toDF("t", "id", "cents")
    val rows = Features.zscore(df, "t", "cents").collect()
    val got = rows.map(r => r.getLong(1) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == Some(-1.0) && got(2L) == Some(1.0), got.toString)
    // zero variance -> divide by zero -> NULL in BOTH engines (Spark's
    // non-ANSI Divide and DuckDB agree; asserted against DuckDB in the
    // sibling python check)
    assert(got(3L).isEmpty && got(4L).isEmpty, got.toString)
  }

  test("rollingDistinct: trailing window unions distinct keys, clipped to observed units") {
    import spark.implicits._
    val df = Seq((1L, "u1"), (2L, "u2"), (2L, "u1"), (4L, "u3"))
      .toDF("day", "user_id")
    val got = Features.rollingDistinct(df, "user_id", "day", windowUnits = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day1: {u1}; day2: {u1,u2} (u1 once despite two active days);
    // day3 unobserved -> absent; day4: {u3} only (window [3,4])
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 1L), got.toString)
  }

  test("quintiles: total order with the key tie-break, n bins") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 10L), ("c", 20L), ("d", 30L))
      .toDF("k", "m")
    val got = Features.quintiles(df, "k", Seq(("m", "bin")), n = 2)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    // order: a,b,c,d -> bins 1,1,2,2
    assert(got == Map("a" -> 1, "b" -> 1, "c" -> 2, "d" -> 2), got.toString)
  }

  test("quintilesHistogram: equals ntile on distinct values; ties share a bin (e20 kernel)") {
    import spark.implicits._
    // no ties + 5 | n: histogram-grain cuts reproduce ntile's bins
    // exactly (remainder placement differs when 5 does not divide n —
    // the property suite pins that regime against the scalar mirror)
    val distinct = (1L to 100L).map(i => (s"u$i", i)).toDF("k", "m")
    val exact = Features.quintiles(distinct, "k", Seq(("m", "bin")), n = 5)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    val hist = Features.quintilesHistogram(distinct, Seq(("m", "bin")), n = 5)
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    assert(hist == exact,
      s"diverging keys: ${hist.filter { case (k, v) => exact(k) != v }}")
    // ties: every row sharing a value lands in ONE bin (ntile would
    // split them by the key tie-break), rest bin above
    val tied = ((1L to 50L).map(i => (s"t$i", 10L)) ++
      (1L to 50L).map(i => (s"h$i", 100L + i))).toDF("k", "m")
    val got = Features.quintilesHistogram(tied, Seq(("m", "bin")), n = 4)
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    val tbin = got.filter(_._1.startsWith("t")).values.toSet
    assert(tbin == Set(1), s"tied rows split across bins: $tbin")
    assert(got.filter(_._1.startsWith("h")).values.forall(_ > 1))
    // two metrics at once: independent cuts, all original columns kept
    val two = Features.quintilesHistogram(distinct,
      Seq(("m", "bin_a"), ("m", "bin_b")), n = 5)
    assert(two.columns.toSet == Set("k", "m", "bin_a", "bin_b"))
  }

  test("quintilesSampled: boundary binning agrees with exact ntile on distinct values") {
    import spark.implicits._
    // 100 distinct metric values; exact boundaries (relativeError 0)
    // must reproduce ntile's bins when no ties straddle a boundary
    val df = (1L to 100L).map(i => (s"u$i", i)).toDF("k", "m")
    val exact = Features.quintiles(df, "k", Seq(("m", "bin")), n = 5)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    val sampled = Features.quintilesSampled(df, Seq(("m", "bin")),
        n = 5, relativeError = 0.0)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(sampled == exact,
      s"diverging keys: ${sampled.filter { case (k, v) => exact(k) != v }}")
    assert(sampled.values.toSet == Set(1, 2, 3, 4, 5))
  }

  test("quintilesSampled: boundary ties all land in the lower bin") {
    import spark.implicits._
    // half the rows tie at one value: every tied row gets ONE bin
    // (no key tie-break splitting), the rest bin above it
    val df = ((1L to 50L).map(i => (s"t$i", 10L)) ++
      (1L to 50L).map(i => (s"h$i", 100L + i))).toDF("k", "m")
    val got = Features.quintilesSampled(df, Seq(("m", "bin")), n = 4,
        relativeError = 0.0)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    val tied = got.filter(_._1.startsWith("t")).values.toSet
    assert(tied.size == 1, s"tied rows split across bins: $tied")
    assert(got.filter(_._1.startsWith("h")).values.forall(_ > tied.head))
  }

  test("e49 conformal bound: thresholds are the exact rank-k calib order statistics; coverage recounts (brute mirror)") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.EventOps.e49.fn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == Seq(80, 90, 95))
    // brute mirror from the same parquet: same cents + md5 bucket
    val s = graft.io.Sources.table(spark, TestSpark.sf0001, "events")
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        graft.api.Sampling.hashBucket(col("event_id")).as("bkt"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val calib = s.filter(_._2 < 128).map(_._1).sorted
    val test_ = s.filter(_._2 >= 128).map(_._1)
    val nc = calib.length.toLong
    got.foreach { case (l, nCalib, nTest, thr, nCov, ppm) =>
      assert(nCalib == nc && nTest == test_.length.toLong)
      val k = math.min((l * (nc + 1) + 99) / 100, nc)
      assert(thr == calib((k - 1).toInt),
        s"level $l: threshold $thr != rank-$k statistic ${calib((k - 1).toInt)}")
      val cov = test_.count(_ <= thr).toLong
      assert(nCov == cov && ppm == cov * 1000000L / nTest)
      // the finite-sample direction the method guarantees in
      // expectation — at this fixture it must at least not collapse
      assert(ppm > (l - 10) * 10000L, s"level $l coverage $ppm collapsed")
    }
  }

  test("e50 jackknife SE: leave-one-out micros, DECIMAL sum-of-squares, and the sqrt tail re-derive (brute mirror)") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.EventOps.e50.fn(spark, TestSpark.sf0001).collect().head
    val (ng, np, tv) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // brute mirror: same cents + md5 user group from the same parquet
    val rows = graft.io.Sources.table(spark, TestSpark.sf0001, "events")
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (graft.api.Sampling.hashBucket(col("user_id"))
          .cast("long") / lit(16L)).cast("long").as("g"))
      .collect().map(x => (x.getLong(1), x.getLong(0)))
    val grp = rows.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2).sum, v.size.toLong)).toMap
    assert(ng == grp.size.toLong && np == rows.length.toLong &&
      tv == rows.map(_._2).sum)
    val ms = grp.values.map { case (v, c) =>
      ((tv - v).toDouble / (np - c).toDouble * 1000000.0).toLong }.toSeq
    val sm = ms.sum
    val sm2 = ms.map(m => BigInt(m) * BigInt(m)).sum
    val ss = (BigInt(ng) * sm2 - BigInt(sm) * BigInt(sm)) * BigInt(ng - 1)
    val se = (math.sqrt(ss.toDouble) / ng).toLong
    assert(r.getLong(3) == (tv.toDouble / np * 1000000.0).toLong) // theta
    assert(r.getLong(4) == Math.floorDiv(sm, ng)) // jk mean
    assert(r.getLong(5) == se, s"se ${r.getLong(5)} != brute $se")
    // jackknife mean must sit near theta (ratio bias is O(1/n)) and
    // the error bar must be positive and far below the estimate
    assert(math.abs(r.getLong(4) - r.getLong(3)) < r.getLong(5).max(1L) * 4)
    assert(se > 0 && se < r.getLong(3))
  }

  test("e35 A/B readout: arms partition exposed users; rates and z re-derive from the counts") {
    val row = graft.ops.EventOps.e35.fn(spark, TestSpark.sf0001).collect()
    assert(row.length == 1)
    val r = row.head
    val (nc, cc, nt, ct) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // hash arms must actually split the exposed population
    assert(nc > 0 && nt > 0, s"degenerate arm split nc=$nc nt=$nt")
    assert(cc >= 0 && cc <= nc && ct >= 0 && ct <= nt)
    // the doubles are the documented fixed-order IEEE expressions of
    // the exact counts — recompute them in the same order
    val rateC = cc.toDouble / nc
    val rateT = ct.toDouble / nt
    val pool = (cc + ct).toDouble / (nc + nt)
    val z = (rateT - rateC) /
      math.sqrt((pool * (1.0 - pool)) * ((1.0 / nc) + (1.0 / nt)))
    assert(r.getDouble(4) == rateC && r.getDouble(5) == rateT)
    assert(r.getDouble(6) == z, s"z mismatch: got ${r.getDouble(6)}, want $z")
  }

  test("seasonalStrength: a periodic series scores 0; a trend scores the lag gap") {
    // periodic: count(h) = (h % 24) % 3 + 1 repeats daily -> seasonal SAE 0
    // trend: count(h) = h -> |c - c24| = 24, |c - c1| = 1 per hour
    val rows = (0 to 71).flatMap(h =>
      Seq.fill((h % 24) % 3 + 1)(("periodic", h.toLong))) ++
      (1 to 71).flatMap(h => Seq.fill(h)(("trend", h.toLong)))
    val got = graft.ops.EventOps.seasonalStrength(
        spark.createDataFrame(rows).toDF("event_type", "hr"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("periodic") == ((48L, 0L, 64L, 0.0)), got.toString)
    assert(got("trend") == ((48L, 1152L, 48L, 24.0)), got.toString)
  }

  test("hazardLifeTable: censoring, suffix at-risk counts, and gap periods (e36 kernel)") {
    import spark.implicits._
    // period = 10 us; corpus end = 38 (C's last event).
    //  A: 0→25  lifetime k=2, end-last=13 ≥ 10 → churned at 2
    //  B: 0→5   k=0, end-last=33 → churned at 0
    //  C: 30→38 k=0, end-last=0 < 10 → CENSORED at 0 (quiet, not gone)
    val ev = Seq(("A", 0L), ("A", 25L), ("B", 0L), ("B", 5L),
      ("C", 30L), ("C", 38L)).toDF("user_id", "us")
    val got = graft.api.Features.hazardLifeTable(ev, "user_id", "us", 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      // period → (at_risk, churned, censored, hazard_ppm)
      0L -> ((3L, 1L, 1L, 333333L)),
      1L -> ((1L, 0L, 0L, 0L)), // gap period still appears, hazard 0
      2L -> ((1L, 1L, 0L, 1000000L))), got.toString)
  }

  test("engagementDepthCurve: duplicate days collapse, window boundary splits, suffix counts + floor-ppm shares (e37 kernel)") {
    import spark.implicits._
    // win 0 = days 0..27, win 1 = days 28..55.
    //  u1: days 0,1,2           → 3 active days in win 0
    //  u2: day 0 twice          → 1 (distinct days, not rows)
    //  u3: days 27 and 28       → 1 in EACH window (boundary split)
    val d = Seq(("u1", 0L), ("u1", 1L), ("u1", 2L), ("u2", 0L),
      ("u2", 0L), ("u3", 27L), ("u3", 28L)).toDF("user_id", "day")
    val got = graft.ops.EventOps.engagementDepthCurve(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      // (win, active_days, n_users, n_at_least, share_ppm)
      (0L, 1L, 2L, 3L, 666666L), // floor ppm: 2·10⁶ // 3
      (0L, 3L, 1L, 1L, 333333L),
      (1L, 1L, 1L, 1L, 1000000L)), got.mkString(","))
  }

  test("giniConcentration: equal counts → 0, hand-summed skew, tie blocks collapse on the histogram (e38 kernel)") {
    import spark.implicits._
    val uc = Seq(
      // eq: three users at 2 events each → perfectly equal
      ("eq", 2L), ("eq", 2L), ("eq", 2L),
      // sk: sorted (1,3): S = 1·1 + 3·3 = 10; num = 10 − 2·4 = 2
      ("sk", 1L), ("sk", 3L),
      // tie: sorted (1,1,2): S = 1 + 3 + 10 = 14; num = 14 − 3·4 = 2
      ("tie", 1L), ("tie", 1L), ("tie", 2L)
    ).toDF("event_type", "c")
    val got = graft.ops.EventOps.giniConcentration(uc).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("eq", 3L, 6L, 0L, 0.0),
      ("sk", 2L, 4L, 2L, 0.25),
      ("tie", 3L, 4L, 2L, 2.0 / 12)), got.mkString(","))
  }

  test("property: quintilesHistogram == ntile quintiles on 40 random tie-free frames; scalar histogram mirror on ties (e20 kernel)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tie-free frames with 5 | n: ntile and the histogram cuts agree
    // exactly (the two remainder-placement rules coincide only there
    // — ntile fattens the FIRST n mod 5 bins, the floor progression
    // spreads the remainder; both are near-equal bandings)
    val sizes = Gen.listOfN(20, Gen.choose(1, 10).map(_ * 5))
      .apply(Gen.Parameters.default, Seed(11L))
      .getOrElse(fail("generator produced no sample"))
    sizes.zipWithIndex.foreach { case (n, i) =>
      val vals = new scala.util.Random(1000 + i).shuffle((1 to n).toList)
        .map(_ * 7L)
      val df = vals.zipWithIndex.map { case (v, k) => (s"k$k", v) }
        .toDF("k", "m")
      val exact = Features.quintiles(df, "k", Seq(("m", "bin")), n = 5)
        .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
      val hist = Features
        .quintilesHistogram(df, Seq(("m", "bin")), n = 5)
        .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
      assert(hist == exact, s"frame $i (n=$n): " +
        s"${hist.filter { case (k, v) => exact(k) != v }}")
    }
    // arbitrary frames (ties, 5 ∤ n): the pinned contract is the
    // scalar mirror (cum_before·5 div n + 1 per distinct value) plus
    // monotonicity of bin in value
    val gen = for {
      n <- Gen.choose(1, 30)
      vs <- Gen.listOfN(n, Gen.choose(1L, 15L))
    } yield vs
    val frames = Gen.listOfN(30, gen)
      .apply(Gen.Parameters.default, Seed(17L))
      .getOrElse(fail("generator produced no sample"))
    frames.zipWithIndex.foreach { case (vs, i) =>
      val tdf = vs.zipWithIndex.map { case (v, k) => (s"k$k", v) }
        .toDF("k", "m")
      val got = Features.quintilesHistogram(tdf, Seq(("m", "bin")), n = 5)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val n = vs.size.toLong
      vs.distinct.foreach { v =>
        val want = ((vs.count(_ < v).toLong * 5L) / n + 1L).toInt
        assert(got(v) == want, s"frame $i value $v: ${got(v)} vs $want")
      }
      val byV = vs.distinct.sorted.map(got)
      assert(byV == byV.sorted, s"frame $i: bins not monotone: $byV")
    }
  }

  test("property: e23's histogram-grain top-K cutoff == user-grain row_number totals on 60 random count distributions") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the claim the e23 rewrite rests on: clamp(K - cum_above, 0, m)
    // summed per distinct value equals the rank-cutoff totals for ANY
    // tie-break, because tied users contribute identical counts
    val genCounts = for {
      n <- Gen.choose(1, 30)
      cs <- Gen.listOfN(n, Gen.choose(1L, 12L)) // heavy ties
    } yield cs
    val samples = Gen.listOfN(60, genCounts)
      .apply(Gen.Parameters.default, Seed(13L))
      .getOrElse(fail("generator produced no sample"))
    samples.zipWithIndex.foreach { case (cs, i) =>
      val k = cs.size.toLong / 10L // the top-10% rank cutoff
      // user-grain mirror: sort desc (any tie order), take rank <= K
      val taken = cs.sorted(Ordering[Long].reverse).take(k.toInt)
      val (wantUsers, wantEvents) = (taken.size.toLong, taken.sum)
      // histogram grain, exactly the query's arithmetic
      val m = cs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val gotPairs = m.toSeq.map { case (c, mc) =>
        val above = cs.count(_ > c).toLong
        val take = math.min(math.max(k - above, 0L), mc)
        (take, take * c)
      }
      assert((gotPairs.map(_._1).sum, gotPairs.map(_._2).sum) ==
        ((wantUsers, wantEvents)), s"dist $i: $cs")
    }
  }

  test("property: giniConcentration histogram form == textbook sorted form on 80 random distributions") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCounts = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.choose(1L, 20L))
    } yield cs
    val samples = Gen.listOfN(80, genCounts)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator produced no sample"))
    // one frame, one job: each random distribution is its own type
    val uc = samples.zipWithIndex
      .flatMap { case (cs, i) => cs.map(c => (f"t$i%03d", c)) }
      .toDF("event_type", "c")
    val got = graft.ops.EventOps.giniConcentration(uc).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    samples.zipWithIndex.foreach { case (cs, i) =>
      // textbook: Σ(2i − n − 1)·x over ascending-sorted x, 1-indexed
      val sorted = cs.sorted
      val n = sorted.size.toLong
      val want = sorted.zipWithIndex
        .map { case (x, j) => (2L * (j + 1) - n - 1) * x }.sum
      assert(got(f"t$i%03d") == want, s"dist $cs")
    }
  }

  test("property: cupedReadout's adjusted rates preserve the pooled rate (weighted means equal) on random frames") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Σ n_a·adj_a == Σ conv_a: CUPED moves rate BETWEEN arms, never
    // invents conversions — the defining identity of the adjustment
    val genUser = Gen.zip(Gen.choose(0, 1), Gen.choose(0L, 9L),
      Gen.oneOf(0L, 1L))
    val samples = Gen.listOfN(300, genUser)
      .apply(Gen.Parameters.default, Seed(11L))
      .getOrElse(fail("generator produced no sample"))
    val rows = graft.ops.EventOps.cupedReadout(
        samples.toDF("arm", "x", "y")).collect()
    val adjTotal = rows.map(r => r.getLong(1) * r.getDouble(6)).sum
    val convTotal = rows.map(_.getLong(3)).sum.toDouble
    assert(math.abs(adjTotal - convTotal) < 1e-6,
      s"$adjTotal vs $convTotal")
  }

  test("cupedReadout: hand-computed pooled slope and adjusted rates (e39 kernel)") {
    import spark.implicits._
    // pooled: N=4, Σx=6, Σy=2, Σxy=4, Σx²=14 →
    //   θ = (4·4 − 6·2)/(4·14 − 36) = 4/20 = 0.2; x̄ = 1.5.
    // arm0 (x̄=0.5 below pool) adjusts UP: 0.5 − 0.2·(0.5−1.5) = 0.7;
    // arm1 (x̄=2.5 above)      adjusts DOWN: 0.5 − 0.2·(2.5−1.5) = 0.3
    val u = Seq((0, 0L, 0L), (0, 1L, 1L), (1, 3L, 1L), (1, 2L, 0L))
      .toDF("arm", "x", "y")
    val got = graft.ops.EventOps.cupedReadout(u).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq ==
      Seq((0, 2L, 1L, 1L, 0.5), (1, 2L, 5L, 1L, 0.5)), got.mkString(","))
    got.foreach { t =>
      assert(math.abs(t._6 - 0.2) < 1e-12, s"theta ${t._6}")
    }
    assert(math.abs(got(0)._7 - 0.7) < 1e-12, got(0)._7.toString)
    assert(math.abs(got(1)._7 - 0.3) < 1e-12, got(1)._7.toString)
  }

  test("didReadout: hand-computed 2x2 cells, rates and DiD estimate (e40 kernel)") {
    import spark.implicits._
    // control: users (pre 1, post 2) and (pre 0, post 1);
    // treatment: (2, 2) and (1, 4) → per-user means pre_c 0.5,
    // post_c 1.5, pre_t 1.5, post_t 3.0 → DiD (3.0-1.5)-(1.5-0.5)=0.5
    val perUser = Seq((0, 1L, 2L), (0, 0L, 1L), (1, 2L, 2L), (1, 1L, 4L))
      .toDF("arm", "pre_n", "post_n")
    val r = graft.ops.EventOps.didReadout(perUser).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 1L, 3L, 2L, 3L, 6L)), r.toString)
    assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 1.5 &&
      r.getDouble(8) == 1.5 && r.getDouble(9) == 3.0, r.toString)
    assert(r.getDouble(10) == 0.5, r.toString)
  }

  test("metricCorrelation: exact moments, perfect/negative correlation, zero-variance NULL (e41 kernel)") {
    import spark.implicits._
    // a=(1,2,3), b=(2,4,6) perfectly correlated; c=(3,1,2) anti-ish;
    // z=(5,5,5) constant — every pair with z must be NULL, not inf
    val grid = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (1L, "b", 2L), (2L, "b", 4L), (3L, "b", 6L),
      (1L, "c", 3L), (2L, "c", 1L), (3L, "c", 2L),
      (1L, "z", 5L), (2L, "z", 5L), (3L, "z", 5L))
      .toDF("day", "event_type", "c")
    val got = graft.ops.EventOps.metricCorrelation(grid).collect()
    val byPair = got.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(byPair.keySet == Set(("a", "b"), ("a", "c"), ("a", "z"),
      ("b", "c"), ("b", "z"), ("c", "z")))
    assert(byPair(("a", "b"))._1 == 3L)
    // IEEE chain: 12/(sqrt(6)*sqrt(24)) etc — exact doubles of the
    // mirrored expression, not the algebraic 1.0/-0.5
    assert(byPair(("a", "b"))._2.contains(
      12.0 / (math.sqrt(6.0) * math.sqrt(24.0))))
    assert(byPair(("a", "c"))._2.contains(
      -3.0 / (math.sqrt(6.0) * math.sqrt(6.0))))
    assert(byPair(("b", "c"))._2.contains(
      -6.0 / (math.sqrt(24.0) * math.sqrt(6.0))))
    assert(byPair(("a", "z"))._2.isEmpty && byPair(("b", "z"))._2.isEmpty &&
      byPair(("c", "z"))._2.isEmpty)
  }

  test("seasonalAnomalyFlags: slot median/MAD baseline, 3*MAD rule, absolute floor (e42 kernel)") {
    import spark.implicits._
    // hours 0/168/336 share slot (dow 4, hod 0) across three weeks:
    //   type x: c = 10,10,100 → med 10, MAD 0 → only the 90-dev hour
    //     flags (the floor admits it);
    //   type y: c = 10,10,12 → dev 2 < floor 5 → MAD 0 must NOT flag;
    //   type z: c = 10,11,100 → med 11, MAD 1 → 89 > 3 flags
    val grid = Seq(
      ("x", 0L, 10L), ("x", 168L, 10L), ("x", 336L, 100L),
      ("y", 0L, 10L), ("y", 168L, 10L), ("y", 336L, 12L),
      ("z", 0L, 10L), ("z", 168L, 11L), ("z", 336L, 100L))
      .toDF("event_type", "hr", "c")
    val got = graft.ops.EventOps.seasonalAnomalyFlags(grid).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      ("x", 0L, 10L, 10.0, 0.0, 0), ("x", 168L, 10L, 10.0, 0.0, 0),
      ("x", 336L, 100L, 10.0, 0.0, 1),
      ("y", 0L, 10L, 10.0, 0.0, 0), ("y", 168L, 10L, 10.0, 0.0, 0),
      ("y", 336L, 12L, 10.0, 0.0, 0),
      ("z", 0L, 10L, 11.0, 1.0, 0), ("z", 168L, 11L, 11.0, 1.0, 0),
      ("z", 336L, 100L, 11.0, 1.0, 1)), got.mkString(","))
  }

  test("property: metricCorrelation equals the textbook Pearson from exact moments on random series (e41 kernel)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def corr(xs: Seq[Long], ys: Seq[Long]): Option[Double] = {
      val n = xs.size.toLong
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx == 0 || vy == 0) None
      else Some((n * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
    }
    // 3 series over 15 days; values 0..9 (constant series arise
    // naturally and must come back NULL)
    val nDays = 15
    val series = Gen.listOfN(3, Gen.listOfN(nDays, Gen.choose(0L, 9L)))
      .apply(Gen.Parameters.default, Seed(23L))
      .getOrElse(fail("generator produced no sample"))
    val types = Seq("a", "b", "c")
    val grid = types.zip(series).flatMap { case (t, vs) =>
      vs.zipWithIndex.map { case (v, d) => (d.toLong, t, v) } }
      .toDF("day", "event_type", "c")
    val got = graft.ops.EventOps.metricCorrelation(grid).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    for (i <- 0 until 3; j <- (i + 1) until 3) {
      val want = corr(series(i), series(j))
      assert(got((types(i), types(j))) == want,
        s"${types(i)}-${types(j)}: got ${got((types(i), types(j)))}, want $want")
    }
  }

  test("property: ltvCurve conservation and floor-division bounds on random cohort grids (e43 kernel)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(4, Gen.zip(Gen.choose(1L, 20L),
      Gen.listOfN(6, Gen.choose(0L, 500L))))
    val cohorts = gen.apply(Gen.Parameters.default, Seed(29L))
      .getOrElse(fail("generator produced no sample"))
    val grid = cohorts.zipWithIndex.flatMap { case ((n, weeks), w0) =>
      weeks.zipWithIndex.map { case (c, k) =>
        (w0.toLong, n, k.toLong, c) } }
      .toDF("wk0", "n_users", "k", "week_cents")
    val got = graft.ops.EventOps.ltvCurve(grid).collect()
    cohorts.zipWithIndex.foreach { case ((n, weeks), w0) =>
      val rows = got.filter(_.getLong(0) == w0.toLong).sortBy(_.getInt(1))
      // cum at the horizon equals the cohort's total; every ltv row
      // satisfies the floor-division sandwich ltv·n <= cum < (ltv+1)·n
      assert(rows.last.getLong(4) == weeks.sum)
      rows.foreach { r =>
        val (nu, cum, ltv) = (r.getLong(2), r.getLong(4), r.getLong(5))
        assert(ltv * nu <= cum && cum < (ltv + 1) * nu, r.toString)
      }
    }
  }

  test("property: seasonalAnomalyFlags equals a scalar median/MAD mirror on random slot grids (e42 kernel)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // interpolated median of integer-valued doubles is exact: the
    // midpoint of two integers is a representable half
    def q50(v: Seq[Double]): Double = {
      val s = v.sorted; val n = s.size
      val lo = s((0.5 * (n - 1)).toInt)
      val hi = s(math.ceil(0.5 * (n - 1)).toInt)
      lo + 0.5 * (hi - lo)
    }
    // every (type, week, offset) cell gets a count: 2 types × 4 weeks
    // × 3 hour offsets — each (type, dow, hod) slot sees 4 weeks
    val cells = for (t <- Seq("x", "y"); w <- 0 to 3; o <- Seq(0L, 24L, 50L))
      yield (t, 168L * w + o)
    val counts = Gen.listOfN(cells.size, Gen.choose(0L, 40L))
      .apply(Gen.Parameters.default, Seed(31L))
      .getOrElse(fail("generator produced no sample"))
    val grid = cells.zip(counts).map { case ((t, hr), c) => (t, hr, c) }
    val got = graft.ops.EventOps.seasonalAnomalyFlags(
      grid.toDF("event_type", "hr", "c")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    val bySlot = grid.groupBy { case (t, hr, _) =>
      (t, (hr / 24 + 4) % 7, hr % 24) }
    bySlot.foreach { case (_, rows) =>
      val med = q50(rows.map(_._3.toDouble))
      val mad = q50(rows.map(r => math.abs(r._3 - med)))
      rows.foreach { case (t, hr, c) =>
        val adev = math.abs(c - med)
        val flag = if (adev > 3 * mad && adev >= 5) 1 else 0
        assert(got((t, hr)) == ((med, mad, flag)),
          s"($t,$hr,$c): got ${got((t, hr))}, want ($med,$mad,$flag)")
      }
    }
  }

  test("powerReadout: pooled-SE MDE and the powered verdict in both directions (e44 kernel)") {
    import spark.implicits._
    def mde(nc: Long, cc: Long, nt: Long, ct: Long): Double = {
      val p = (cc + ct).toDouble / (nc + nt)
      (1.959963984540054 + 0.8416212335729143) *
        math.sqrt((p * (1.0 - p)) * ((1.0 / nc) + (1.0 / nt)))
    }
    // big effect (0.1 -> 0.3 on 100/arm): observed 0.2 >= MDE -> powered
    val a = graft.ops.EventOps.powerReadout(
      Seq((100L, 10L, 100L, 30L)).toDF(
        "n_control", "conv_control", "n_treatment", "conv_treatment"))
      .collect()(0)
    assert(a.getDouble(6) == mde(100, 10, 100, 30), a.toString)
    // mirrored IEEE: the observed diff is the double chain's value,
    // not the algebraic 0.2
    assert(a.getDouble(5) == 30.0 / 100 - 10.0 / 100 && a.getInt(7) == 1,
      a.toString)
    // tiny effect (0.1 -> 0.12): observed 0.02 < MDE -> underpowered
    val b = graft.ops.EventOps.powerReadout(
      Seq((100L, 10L, 100L, 12L)).toDF(
        "n_control", "conv_control", "n_treatment", "conv_treatment"))
      .collect()(0)
    assert(b.getInt(7) == 0 && b.getDouble(6) == mde(100, 10, 100, 12),
      b.toString)
  }

  test("ltvCurve: cumulative cents over quiet weeks, exact floor cents-per-user (e43 kernel)") {
    import spark.implicits._
    val grid = Seq(
      (0L, 4L, 0L, 100L), (0L, 4L, 1L, 0L), (0L, 4L, 2L, 50L),
      (1L, 3L, 0L, 10L))
      .toDF("wk0", "n_users", "k", "week_cents")
    val got = graft.ops.EventOps.ltvCurve(grid).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      // (cohort, k, n_users, week, cum, ltv = cum div n)
      (0L, 0, 4L, 100L, 100L, 25L),
      (0L, 1, 4L, 0L, 100L, 25L),
      (0L, 2, 4L, 50L, 150L, 37L),
      (1L, 0, 3L, 10L, 10L, 3L)), got.mkString(","))
  }

  test("gstLooks: integer cut points, as-observed-at-the-look counts, OBF crossing + prefix stop flag (e45 kernel)") {
    import spark.implicits._
    // span 0..400 → cuts 100/200/300/400. Treatment user (50, 250)
    // is the as-observed case: exposed from look 1, but its
    // conversion only COUNTS from look 3 (250 > cut_2 = 200).
    val perUser = Seq(
      (0, 0L, None), (0, 100L, None), (0, 150L, None), (0, 250L, None),
      (1, 0L, Some(50L)), (1, 50L, Some(250L)), (1, 150L, Some(180L)),
      (1, 400L, None))
      .toDF("arm", "v_us", "conv_us")
    val got = graft.ops.EventOps.gstLooks(perUser).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getInt(8), r.getInt(9)))
    def zm(nc: Long, cc: Long, nt: Long, ct: Long): Double = {
      val rc = cc.toDouble / nc; val rt = ct.toDouble / nt
      val pool = (cc + ct).toDouble / (nc + nt)
      (rt - rc) / math.sqrt((pool * (1.0 - pool)) *
        ((1.0 / nc) + (1.0 / nt)))
    }
    def bm(k: Int): Double = 2.024 * math.sqrt(4.0 / k)
    // (look, cut, nc, cc, nt, ct, z, boundary, crossed, stopped):
    // the OBF ladder holds the early looks (z 1.15/1.73 under 4.05/
    // 2.86) and the monitor fires at look 3 (2.646 > 2.337), staying
    // fired at the horizon (2.191 > 2.024)
    val want = Seq(
      (1, 100L, 2L, 0L, 2L, 1L, zm(2, 0, 2, 1), bm(1), 0, 0),
      (2, 200L, 3L, 0L, 3L, 2L, zm(3, 0, 3, 2), bm(2), 0, 0),
      (3, 300L, 4L, 0L, 3L, 3L, zm(4, 0, 3, 3), bm(3), 1, 1),
      (4, 400L, 4L, 0L, 4L, 3L, zm(4, 0, 4, 3), bm(4), 1, 1))
    assert(got.toSeq == want, got.mkString("\n"))
  }

  test("stratifiedDid: histogram-grain terciles, per-stratum DiD, precision-weighted pool (e46 kernel)") {
    import spark.implicits._
    // three tied value-blocks of 3 users → strata 1/2/3 exactly;
    // hand DiDs: s1 = (3−0)−(1−0) = 2, s2 = (7−5)−(1−5) = 6,
    // s3 = (20−10)−(5−10) = 15; every weight n_c·n_t/(n_c+n_t) = 2/3,
    // so the pool is the plain mean 23/3 in the same IEEE chain
    val pu = Seq(
      (0, 0L, 2L), (0, 0L, 0L), (1, 0L, 3L),
      (0, 5L, 1L), (1, 5L, 6L), (1, 5L, 8L),
      (0, 10L, 4L), (0, 10L, 6L), (1, 10L, 20L))
      .toDF("arm", "pre_n", "post_n")
    val got = graft.ops.EventOps.stratifiedDid(pu).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7),
        r.getDouble(8)))
    val w = 2.0 * 1L / (2L + 1L)
    val pooled = (w * 2.0 + w * 6.0 + w * 15.0) / (w + w + w)
    assert(got.toSeq == Seq(
      (0, 5L, 25L, 13L, 4L, 20L, 37L, pooled, w + w + w),
      (1, 2L, 0L, 2L, 1L, 0L, 3L, 2.0, w),
      (2, 1L, 5L, 1L, 2L, 10L, 14L, 6.0, w),
      (3, 2L, 20L, 10L, 1L, 10L, 20L, 15.0, w)), got.mkString("\n"))
  }

  test("property: gstLooks equals the scalar cut/count/z mirror on 30 random panels (e45 kernel)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genPanel = Gen.listOfN(20, for {
      arm <- Gen.oneOf(0, 1)
      v <- Gen.choose(0L, 1000L)
      conv <- Gen.option(Gen.choose(0L, 1200L))
    } yield (arm, v, conv))
    val panels = Gen.listOfN(30, genPanel)
      .apply(Gen.Parameters.default, Seed(45L))
      .getOrElse(fail("generator produced no sample"))
    panels.zipWithIndex.foreach { case (panel, i) =>
      val got = graft.ops.EventOps.gstLooks(
          panel.toDF("arm", "v_us", "conv_us")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)),
          r.getInt(8), r.getInt(9)))
      val lo = panel.map(_._2).min
      val hi = panel.map(_._2).max
      var stopped = 0
      (1 to 4).foreach { k =>
        val cut = lo + ((hi - lo) * k) / 4
        val in = panel.filter(_._2 <= cut)
        val nc = in.count(_._1 == 0).toLong
        val nt = in.count(_._1 == 1).toLong
        val cc = in.count(u => u._1 == 0 && u._3.exists(_ <= cut)).toLong
        val ct = in.count(u => u._1 == 1 && u._3.exists(_ <= cut)).toLong
        val z: Option[Double] =
          if (nc == 0 || nt == 0 || cc + ct == 0 || cc + ct == nc + nt) None
          else {
            val pool = (cc + ct).toDouble / (nc + nt)
            Some((ct.toDouble / nt - cc.toDouble / nc) /
              math.sqrt((pool * (1.0 - pool)) * ((1.0 / nc) + (1.0 / nt))))
          }
        val b = 2.024 * math.sqrt(4.0 / k)
        val crossed = if (z.exists(v => math.abs(v) > b)) 1 else 0
        stopped = math.max(stopped, crossed)
        val row = got.find(_._1 == k).getOrElse(
          fail(s"panel $i: look $k missing (${got.mkString(",")})"))
        assert(row == ((k, cut, nc, cc, nt, ct, z, crossed, stopped)),
          s"panel $i look $k: got $row want ${(k, cut, nc, cc, nt, ct, z, crossed, stopped)}")
      }
    }
  }

  test("stratifiedDid: an empty-arm stratum has NULL DiD and is excluded from the pool (e46 guard)") {
    import spark.implicits._
    // stratum 1 = two control-only users (no treatment leg → no DiD);
    // stratum 2 = 1v1 with DiD (9−5)−(1−5) = 8 — the pool must be 8
    // on stratum 2's weight alone, not poisoned by the NULL
    val pu = Seq(
      (0, 0L, 1L), (0, 0L, 2L),
      (0, 5L, 1L), (1, 5L, 9L))
      .toDF("arm", "pre_n", "post_n")
    val rows = graft.ops.EventOps.stratifiedDid(pu).collect()
    val byStratum = rows.map(r => r.getInt(0) -> r).toMap
    assert(byStratum(1).isNullAt(7), "empty-arm stratum must have NULL DiD")
    assert(byStratum(1).getDouble(8) == 0.0)
    assert(byStratum(2).getDouble(7) == 8.0)
    assert(byStratum(0).getDouble(7) == 8.0,
      s"pool must exclude the NULL stratum, got ${byStratum(0).getDouble(7)}")
    assert(byStratum(0).getDouble(8) == 0.5)
  }
}
