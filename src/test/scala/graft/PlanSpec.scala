package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{JoinOps, RelationalOps, StarQueries}

/** Plan-shape assertions (SURVEY.md §5.6): the optimizer behaviors the
  * engine relies on at 100 TB must be visible in the physical plan —
  * filters reaching the parquet scan, dimension joins broadcast, global
  * top-k as TakeOrderedAndProject, and the cleaning stage free of
  * non-codegen barriers.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("registry sweep: no CartesianProduct; no DECIMAL on any output surface") {
    // CartesianProduct: the one smell with no legitimate use in this
    // engine — every deliberate all-pairs baseline goes through a
    // broadcast nested loop (bounded small side), never a shuffled
    // cartesian. Planning all queries is cheap next to QueriesSpec's
    // execution sweep and catches a regression the day it lands.
    //
    // DecimalType: the round-10..12 qs4 lesson made mechanical — the
    // driver's hash compare distinguishes decimal PHYSICAL layouts
    // that are value-equal, so a decimal column on a final projection
    // can go red on correct values. Decimals are fine internally
    // (additive exactness); final surfaces project to BIGINT cents or
    // DOUBLE. Checked here in the same sweep so it costs nothing extra.
    val offenders = SparkEntry.registry.flatMap { q =>
      try {
        val df = q.fn(spark, TestSpark.sf0001)
        val p = plan(df)
        val decimals = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
            f.name
        }
        if (p.contains("CartesianProduct"))
          Some(q.name -> ("CartesianProduct: " + p.take(200)))
        else if (decimals.nonEmpty)
          Some(q.name -> s"decimal output surface: ${decimals.mkString(",")}")
        else None
      } catch {
        case e: Throwable => Some(q.name -> s"PLANNING FAILED: ${e.getMessage}")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("plan golden covers every registry query (no silent coverage gap)") {
    // round-12 lesson: two operators landed in a snapshot commit with
    // no golden entries, so cart=0 was only proven for 247/249. The
    // golden must always be regenerated when the registry grows —
    // this pins line count == registry size so the gap class cannot
    // recur (content drift is PlanAudit check's job; size is this
    // spec's).
    val golden = scala.io.Source.fromFile("tools/plan_golden.txt")
      .getLines().filter(_.startsWith("AUDIT ")).map(_.split("\\s+")(1)).toSet
    val registry = SparkEntry.registry.map(_.name).toSet
    val missing = registry -- golden
    val stale = golden -- registry
    assert(missing.isEmpty && stale.isEmpty,
      s"golden out of sync: missing=${missing.toSeq.sorted} " +
        s"stale=${stale.toSeq.sorted} — regenerate with " +
        "`runMain graft.PlanAudit golden` and commit it")
  }

  test("r10: shipdate filter is pushed to the parquet scan") {
    val p = plan(RelationalOps.r10.fn(spark, TestSpark.sf0001))
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("r68: the quantity predicate pushes into the ORC scan") {
    val p = plan(graft.ops.RelationalOps.r68.fn(spark, TestSpark.sf0001))
    assert(p.toLowerCase.contains("orc"), p.take(2000))
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_quantity,5"), p.take(4000))
  }

  test("q01: dimension joins broadcast") {
    val p = plan(StarQueries.q01.fn(spark, TestSpark.sf0001))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q03b: global top-1 is TakeOrderedAndProject, not a window") {
    val p = plan(StarQueries.q03b.fn(spark, TestSpark.sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("column pruning: q02 scans only the columns it needs") {
    val p = plan(StarQueries.q02.fn(spark, TestSpark.sf0001))
    assert(p.contains("ReadSchema: struct<o_orderdate"), p.take(2000))
    assert(!p.contains("o_totalprice"), "q02 must not read o_totalprice")
  }

  test("canonicalEventTime: events pushdown and pruning survive the ts projection") {
    import org.apache.spark.sql.functions.col
    // the load-time ts normalization inserts a Project over the scan;
    // it must stay transparent to the optimizer — a filter on another
    // column still reaches PushedFilters, and when ts is unused its
    // unix_micros expression (and the ts column itself) is pruned out
    // of the parquet read entirely
    val df = graft.io.Sources.table(spark, TestSpark.sf0001, "events")
      .filter(col("event_type") === "view")
      .select("user_id", "event_type")
    val p = plan(df)
    assert(p.contains("EqualTo(event_type,view)"), p.take(2000))
    assert(p.contains("ReadSchema: struct<user_id:bigint,event_type:string>"),
      p.take(2000))
  }

  test("eventsBetween: the time-range predicate reaches the parquet scan") {
    // the canonical-ns range must land on the PHYSICAL ts column below
    // the normalization projection — PushedFilters, not a post-scan
    // Filter, is what turns "last 7 days over 100 TB" into a pruned read
    val df = graft.io.Sources.eventsBetween(spark, TestSpark.sf0001,
      0L, 4102444800L * 1000000000L)
    val p = plan(df)
    assert(p.contains("GreaterThanOrEqual(ts"), p.take(3000))
  }

  test("r17: range join is an equi-join on the time bucket, not nested-loop") {
    val p = plan(JoinOps.r17.fn(spark, TestSpark.sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("r18: bloom filter sits on the lineitem scan side of the join") {
    val p = plan(JoinOps.r18.fn(spark, TestSpark.sf0001))
    // the filter appears as bloom_might_contain(knownnotnull(l_orderkey#N))
    // in the Filter node directly above the lineitem FileScan
    assert(p.split("\n").exists(l =>
      l.contains("Filter") && l.contains("bloom_might_contain")), p.take(4000))
  }

  test("r19: bucketed join scans read Bucketed: true; only the aggregate shuffles") {
    val p = plan(JoinOps.r19.fn(spark, TestSpark.sf0001))
    assert(p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("Bucketed: true"), p.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected only the aggregate's exchange, got $exchanges\n${p.take(3000)}")
  }

  test("cleaning stage stays in whole-stage codegen (no Python/UDF barrier)") {
    val cleaned = graft.clean.Cleaners.cleanPin(
      graft.fixtures.PinFixtures.pinRaw(spark), dedup = false)
    val p = plan(cleaned)
    // codegen stages print as "*(n)" in executedPlan.toString; the
    // custom human_count expression must sit inside one
    assert(p.contains("*(1) Project"), p.take(2000))
    assert(p.contains("human_count"), p.take(2000))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p.take(2000))
  }

  test("t08: contamination join is an equi-join on the shingle, never nested-loop") {
    val p = plan(graft.ops.TextOps.t08.fn(spark, TestSpark.sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // both sides must collapse to distinct shingles BEFORE the join:
    // the join keys are aggregate outputs, so HashAggregate nodes must
    // outnumber the probe-side join (2 distincts + 1 count group)
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("t09: redaction profile is a single map stage over the scan (no shuffle)") {
    val p = plan(graft.ops.TextOps.t09.fn(spark, TestSpark.sf0001))
    // the final orderBy range-partitions; there must be NO hash shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 0,
      s"redaction must not hash-shuffle, got $exchanges\n${p.take(3000)}")
  }

  test("r21: week filter becomes PartitionFilters on the day-partitioned scan") {
    val p = plan(JoinOps.r21.fn(spark, TestSpark.sf0001))
    val scan = p.split("\n").find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PartitionFilters: [isnotnull(day"), scan)
    assert(scan.contains("(day") && scan.contains(">= 19730)"), scan)
    // the day predicate must NOT survive as a post-scan row filter
    assert(scan.contains("DataFilters: []"), scan)
    assert(scan.contains("PushedFilters: []"), scan)
  }

  test("q01/qr1: the row_number top-k idiom auto-rewrites to GroupTopK") {
    for (q <- Seq(StarQueries.q01, graft.ops.ReferenceQueries.qr1)) {
      val p = plan(q.fn(spark, TestSpark.sf0001))
      assert("GroupTopK ".r.findAllIn(p).size == 2,
        s"${q.name} did not rewrite:\n${p.take(3000)}")
      assert(!p.contains("Window"), s"${q.name} still has a Window:\n${p.take(3000)}")
    }
    // rank()/dense_rank() (tie-admitting) must NOT rewrite: r14 keeps its windows
    val r14 = plan(graft.ops.ScaleOps.r14.fn(spark, TestSpark.sf0001))
    assert(r14.contains("Window"), r14.take(3000))
  }

  test("t26: no window partitioned by the bare group key over doc-grain rows") {
    // the two-phase prefix sum must keep the doc-grain window
    // partitioned by (source, bucket) — a window spec of [source] alone
    // over the documents frame is the one-task-per-source scale ceiling
    val p = plan(graft.ops.TextOps.t26.fn(spark, TestSpark.sf0001))
    // every Window node must either partition by the bucket too (doc
    // grain) or run over the bucket-grain totals (which carry _tb_total)
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(windowLines.nonEmpty, p.take(3000))
    windowLines.foreach { l =>
      assert(l.contains("_tb_bucket") || l.contains("_tb_total"),
        s"window not bucketed: $l")
    }
  }

  test("r52: bracket envelopes push to both scans; the OR stays a join residual") {
    val p = plan(RelationalOps.r52.fn(spark, TestSpark.sf0001))
    assert(p.contains("In(p_brand"), p.take(3000))
    assert(p.contains("LessThanOrEqual(l_quantity,30.0)"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("r55: the Q6 predicates reach the parquet scan") {
    // the executedPlan string truncates PushedFilters at ~100 chars, so
    // assert on the untruncated FileSourceScan metadata directly
    // AdaptiveSparkPlanExec is a leaf node: unwrap it to reach the scans
    val exec = RelationalOps.r55.fn(spark, TestSpark.sf0001)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val pushed = exec.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.get("PushedFilters")
      case _ => None
    }.mkString(";")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_discount,0.07)"), pushed)
    assert(pushed.contains("LessThan(l_quantity,24.0)"), pushed)
  }

  test("r58: Q10 top-20 is TakeOrderedAndProject with broadcast dimensions") {
    val p = plan(RelationalOps.r58.fn(spark, TestSpark.sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("EqualTo(l_returnflag,R)"), p.take(3000))
  }

  test("s07: centroid assignment broadcasts the small side") {
    val p = plan(graft.ops.SimilarityOps.s07.fn(spark, TestSpark.sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    // the per-dimension mean must be a hash aggregate, not a vector
    // collect: no collect_list anywhere in the plan
    assert(!p.contains("collect_list"), p.take(3000))
  }

  test("t15: per-source thresholds broadcast back; the corpus is never sort-merge joined") {
    val p = plan(graft.ops.TextOps.t15.fn(spark, TestSpark.sf0001))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("r23: z-order layout range-partitions on the interleaved key") {
    val p = plan(JoinOps.r23.fn(spark, TestSpark.sf0001))
    assert(p.toLowerCase.contains("rangepartitioning"), p.take(3000))
  }

  test("s08: quantization profile is a single map stage (no shuffle before the sort)") {
    val p = plan(graft.ops.SimilarityOps.s08.fn(spark, TestSpark.sf0001))
    // exactly one exchange: the final presentation ORDER BY
    assert("Exchange ".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("s09: PQ codebook side is broadcast") {
    val p = plan(graft.ops.SimilarityOps.s09.fn(spark, TestSpark.sf0001))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("e11: native as-of join plans the custom exec, no candidate explosion") {
    val p = plan(graft.ops.EventOps.e11.fn(spark, TestSpark.sf0001))
    assert(p.contains("AsOfJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("r28: interval overlap join is an equi-join on the bucket, not nested-loop") {
    val p = plan(JoinOps.r28.fn(spark, TestSpark.sf0001))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("t19: the bloom sketch prunes the corpus side before the exact join") {
    val p = plan(graft.ops.TextOps.t19.fn(spark, TestSpark.sf0001))
    assert(p.contains("t19_bloom_has_gram"), p.take(3000))
  }

  test("r32: grouping sets plan one Expand, not one scan per set") {
    val p = plan(RelationalOps.r32.fn(spark, TestSpark.sf0001))
    assert("Expand".r.findAllIn(p).size == 1, p.take(3000))
    assert("FileScan parquet".r.findAllIn(p).size == 4, // 4 tables, once each
      p.take(3000))
  }

  test("r31: the zone map actually skips files for the week window") {
    import org.apache.spark.sql.functions.col
    val (_, statsLoc) = JoinOps.ensureZoneMapped(spark, TestSpark.sf0001)
    val stats = spark.read.parquet(statsLoc)
    val total = stats.count()
    val lo = 19738L * 86400000000L
    val hi = 19745L * 86400000000L
    val selected = stats
      .filter(col("max_us") >= lo && col("min_us") < hi).count()
    assert(total == 16L, s"expected 16 zone-mapped files, got $total")
    // a 7-day window over a 30-day clustered layout must skip most files
    assert(selected > 0 && selected <= 6,
      s"selected $selected of $total files — skipping is not happening")
  }

  test("m04: the frame-sampling plan is a zero-shuffle generator stage") {
    val p = plan(graft.ops.Multimodal.m04.fn(spark, TestSpark.sf0001))
    // the only exchange allowed is the final presentation orderBy's
    // range partitioning; no hash-partitioned (aggregation/join) shuffle
    assert(!p.contains("hashpartitioning"),
      "frame scheduling must not shuffle: " + p.take(2000))
    assert(p.contains("Generate explode"), p.take(2000))
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // one planet-sized key (0) among 100 uniform ones
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 4 === 0, 0L).otherwise(col("id") % 100).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        md5(col("id").cast("string")).as("label"))
      val joined = fact.join(dim, "k")
      // materialize THIS queryExecution (count()/foreach plan separate
      // queries and leave joined's own AdaptiveSparkPlan unexecuted)
      val nOut = joined.collect().length
      assert(nOut == 200000, s"unexpected join cardinality $nOut")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(500))
      assert(p.contains("skew=true"),
        "AQE did not mark the skewed join: " + p.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("d14: cell assignment is one projected expression, no join or aggregate") {
    val p = plan(graft.ops.DedupOps.d14.fn(spark, TestSpark.sf0001))
    // the codebook lives inside the codegen'd nearest_cell expression:
    // assignment is a bare projection — no N×k joined rows, no argmax
    // aggregate (the round-11 curve flagged that formulation at 12.9×)
    assert(p.contains("nearest_cell"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "assignment must not cross-join the codebook: " + p.take(3000))
    assert(!p.contains("max_by"),
      "assignment must not aggregate scored rows: " + p.take(3000))
    // the cosine verify threshold is evaluated INSIDE the pair join
    // (condition, not a post-join filter), so failing pairs never
    // materialize downstream
    assert(p.contains("quantized_dot"), p.take(3000))
  }

  test("r41: the brand part-set is broadcast into the fact scan") {
    val p = plan(RelationalOps.r41.fn(spark, TestSpark.sf0001))
    // brand filter prunes lineitem via a broadcast before any aggregate
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(p_brand,Brand#1)"), p.take(3000))
  }

  test("r42: the having-filtered aggregate is broadcast, orders never shuffle for it") {
    val p = plan(RelationalOps.r42.fn(spark, TestSpark.sf0001))
    val orderJoin = p.indexOf("BroadcastHashJoin")
    assert(orderJoin >= 0, p.take(3000))
  }

  test("r43: scalar max is a 1-row broadcast, no single-partition global window") {
    val p = plan(RelationalOps.r43.fn(spark, TestSpark.sf0001))
    assert(!p.contains("Window"), "must not window over the rev frame: " + p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
  }

  test("r45: the fact scan's partition filter is dynamic (fed by the dim scan)") {
    graft.ops.JoinOps.r45.prepare(spark, TestSpark.sf0001)
    val p = plan(graft.ops.JoinOps.r45.fn(spark, TestSpark.sf0001))
    assert(p.contains("dynamicpruning"),
      "fact PartitionFilters must carry a runtime pruning subquery: " +
        p.take(3000))
  }

  test("e24: the four lag features share one Window node and one shuffle") {
    val p = plan(graft.ops.EventOps.e24.fn(spark, TestSpark.sf0001))
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      "lag features must share a single Window: " + p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("e21: rolling actives fan out, never range-join (no nested loop on the corpus)") {
    val p = plan(graft.ops.EventOps.e21.fn(spark, TestSpark.sf0001))
    assert(p.contains("Generate explode"), "the 7-day fan-out must be a generator: " + p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("BuildRight"),
      p.take(3000))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "day clipping must be a broadcast semi join: " + p.take(3000))
  }

  test("r46: every dim joins broadcast — the fact is never sort-merge joined") {
    val p = plan(RelationalOps.r46.fn(spark, TestSpark.sf0001))
    assert(!p.contains("SortMergeJoin"),
      "dim joins must broadcast, not shuffle the fact: " + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("EqualTo(p_size,10)"),
      "part size filter must push to the scan: " + p.take(3000))
  }

  test("r48: the supplier denylist excludes via broadcast anti join") {
    val p = plan(RelationalOps.r48.fn(spark, TestSpark.sf0001))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "NOT IN must run as a broadcast anti join: " + p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("r49: lineitem⋈orders is the only non-broadcast join") {
    val p = plan(RelationalOps.r49.fn(spark, TestSpark.sf0001))
    val smj = "SortMergeJoin".r.findAllIn(p).size
    val shj = "ShuffledHashJoin".r.findAllIn(p).size
    assert(smj + shj <= 1,
      "only the fact-fact orderkey join may shuffle: " + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("e27: the three attribution bounds share one Window node and one shuffle") {
    val p = plan(graft.ops.EventOps.e27.fn(spark, TestSpark.sf0001))
    assert("\\bWindow\\b".r.findAllIn(p).size == 1,
      "count/min/max touch frames must share a single Window: " + p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Join"), "attribution must not self-join: " + p.take(3000))
  }

  test("r50: the year gate pushes to the fact scan, the family gate is a broadcast semi") {
    val p = plan(RelationalOps.r50.fn(spark, TestSpark.sf0001))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "year filter must push to parquet: " + p.take(3000))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "part family gate must be a broadcast semi join: " + p.take(3000))
  }
}
