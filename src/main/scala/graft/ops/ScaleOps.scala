package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Operators that exist specifically for the 100 TB shape of the
  * problem: cube/grouping-set aggregation, the full ranking-window
  * suite, salted two-phase aggregation for skewed keys, sliding
  * event-time windows, and the approximate-percentile path. Each is
  * oracle-checked where exact SQL semantics exist.
  */
object ScaleOps {

  /** CUBE over two dimensions (rollup's sibling — all 4 grouping sets). */
  val r13 = OpQuery.oracled("r13_cube_lineitem_status",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin,
    doc = "cube grouping sets (generalized aggregation surface)") { (spark, dir) =>
    Sources.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .createOrReplaceTempView("r13_flat")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM r13_flat
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Ranking window suite: dense_rank, ntile, first/last_value with an
    * explicit full frame — every ranking primitive the reference never
    * used, on one deterministic ordering.
    */
  val r14 = OpQuery.oracled("r14_ranking_window_suite",
    """SELECT c_custkey, c_mktsegment,
      |       CAST(dense_rank() OVER w AS INT) AS balance_dense_rank,
      |       CAST(ntile(4) OVER w AS INT) AS balance_quartile,
      |       first_value(c_custkey) OVER w2 AS richest_custkey,
      |       last_value(c_custkey) OVER w2 AS poorest_custkey
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC),
      |       w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY c_mktsegment, balance_dense_rank, c_custkey""".stripMargin,
    doc = "dense_rank / ntile / first_value / last_value with explicit frames") { (spark, dir) =>
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Sources.table(spark, dir, "customer")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        dense_rank().over(w).as("balance_dense_rank"),
        ntile(4).over(w).as("balance_quartile"),
        first_value(col("c_custkey")).over(w2).as("richest_custkey"),
        last_value(col("c_custkey")).over(w2).as("poorest_custkey"))
      .orderBy("c_mktsegment", "balance_dense_rank", "c_custkey")
  }

  /** Salted two-phase aggregation: the standard fix for skewed keys
    * (a handful of event types each holding 20% of a 100 TB stream).
    * Phase 1 aggregates on (key, salt) spreading each hot key over 16
    * partitions; phase 2 merges the partials. The oracle is the plain
    * GROUP BY — salting must be invisible in the result.
    */
  val r15 = OpQuery.oracled("r15_salted_skew_aggregation",
    """SELECT event_type,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |       count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1 ORDER BY event_type""".stripMargin,
    doc = "salted two-phase aggregation over skewed keys; result provably equals direct GROUP BY") { (spark, dir) =>
    val events = Sources.table(spark, dir, "events")
    val salted = events.withColumn("_salt", pmod(col("event_id"), lit(16)))
    val partial = salted
      .groupBy("event_type", "_salt")
      .agg(
        count(lit(1)).as("p_cnt"),
        sum(col("value").cast("decimal(18,6)")).as("p_val"))
    val merged = partial
      .groupBy("event_type")
      .agg(
        sum(col("p_cnt")).as("cnt"),
        sum(col("p_val")).cast("double").as("total_value"))
    // Exact distinct via two-phase group-by: the first shuffle is on
    // (event_type, user_id) — high cardinality, so a hot event_type
    // spreads across partitions without salting — and the second merges
    // tiny per-type counts. Both stages hash-aggregate and spill;
    // nothing is ever materialized as one driver-sized array.
    // count(user_id), not count(*): distinct() keeps an
    // (event_type, NULL) row that count(DISTINCT user_id) — the oracle
    // semantics — excludes; on nullable data count(*) here would be +1.
    val users = events.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(col("user_id")).as("n_users"))
    merged.join(users, Seq("event_type"))
      .select(col("event_type"), col("cnt"), col("total_value"),
        col("n_users"))
      .orderBy("event_type")
  }

  /** Sliding event-time windows in batch (1 h length, 30 min slide):
    * each event belongs to exactly two windows; the explode mirrors what
    * streaming `window(ts, "1 hour", "30 minutes")` does internally.
    */
  val e06 = OpQuery.oracled("e06_sliding_window_counts",
    """WITH slid AS (
      |  SELECT event_type,
      |         (epoch_us(ts) // 1800000000) * 1800 - offs AS win_start
      |  FROM events, (SELECT unnest([0, 1800]) AS offs)
      |)
      |SELECT win_start, event_type, count(*) AS cnt
      |FROM slid
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin,
    doc = "sliding event-time windows (1h length / 30min slide) in batch") { (spark, dir) =>
    Sources.table(spark, dir, "events")
      .withColumn("offs", explode(array(lit(0L), lit(1800L))))
      .withColumn("win_start",
        expr("(ts div 1000 div 1800000000) * 1800 - offs"))
      .groupBy("win_start", "event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("win_start", "event_type")
  }

  /** Approximate percentile — the 100 TB path for quantiles (single
    * pass, bounded sketch). The Greenwald-Khanna estimates themselves
    * are partition-merge-order dependent, so their raw values are not
    * oracle-able (nor even run-stable); what IS checkable is the
    * algorithm's published guarantee: the returned element's exact rank
    * within its group must sit within n/accuracy of the target rank.
    * The engine ranks its own estimates exactly (one broadcast join of
    * the 5-row estimate table back over orders) and emits the bound
    * checks; the oracle re-derives the group counts and asserts the
    * bounds hold. Slack is n/1000 + 2: the guarantee's ±n/accuracy plus
    * the ≤-vs-< rank-convention off-by-ones. A misrouted column, an
    * empty sketch, or a broken merge fails loudly — the old rows-only
    * entry could not.
    */
  val r16 = OpQuery.oracled("r16_approx_percentiles",
    """SELECT o_orderpriority, count(*) AS cnt,
      |       TRUE AS p50_in_bound, TRUE AS p95_in_bound
      |FROM orders
      |GROUP BY 1
      |ORDER BY o_orderpriority""".stripMargin,
    doc = "percentile_approx sketch quantiles (scale path for A3); oracled on the GK rank-error contract") { (spark, dir) =>
    val orders = Sources.table(spark, dir, "orders")
      .select("o_orderpriority", "o_totalprice")
    val est = orders.groupBy("o_orderpriority")
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("_p50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(1000)).as("_p95"))
    orders.join(broadcast(est), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("o_totalprice") <= col("_p50"), 1L).otherwise(0L)).as("_r50"),
        sum(when(col("o_totalprice") <= col("_p95"), 1L).otherwise(0L)).as("_r95"))
      .select(col("o_orderpriority"), col("cnt"),
        (abs(col("_r50") - lit(0.5) * col("cnt")) <=
          col("cnt") / lit(1000.0) + lit(2.0)).as("p50_in_bound"),
        (abs(col("_r95") - lit(0.95) * col("cnt")) <=
          col("cnt") / lit(1000.0) + lit(2.0)).as("p95_in_bound"))
      .orderBy("o_orderpriority")
  }

  /** HyperLogLog built from first principles — and therefore EXACTLY
    * oracle-checkable, unlike r09's engine-native
    * `approx_count_distinct` whose register layout is private. The
    * sketch is fully determined by public arithmetic: h = first 60 md5
    * bits of the value; bucket = h mod 64; rho = leading-zero count of
    * the remaining 54-bit window + 1; register = max(rho) per bucket.
    * Output pins every register (64 per group), the integer harmonic
    * numerator S = sum(2^(55-register)) (estimate = 0.709 * m^2 * 2^55
    * / S, one IEEE division of exact integers — deterministic across
    * engines), the zero-register count (for the linear-counting
    * small-range correction, left to the consumer), and the exact
    * distinct count for the error story.
    *
    * The 100 TB shape: one codegen'd map stage, then a partial-agg
    * shuffle that carries at most m=64 rows per task per group —
    * registers merge by max, which is what makes HLL a sketch. r09
    * remains the pragmatic engine-native path; this is the same
    * algorithm with its guts verifiable.
    */
  val r34 = OpQuery.oracled("r34_hll_registers",
    """WITH h AS (
      |  SELECT l_returnflag,
      |         CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM lineitem
      |), rho AS (
      |  SELECT l_returnflag, h % 64 AS bucket,
      |         CASE WHEN h // 64 = 0 THEN 55
      |              ELSE 55 - length(bin(h // 64)) END AS rho
      |  FROM h
      |), reg AS (
      |  SELECT l_returnflag, bucket, max(rho) AS register
      |  FROM rho GROUP BY 1, 2
      |), grid AS (
      |  SELECT f.l_returnflag, b.bucket
      |  FROM (SELECT DISTINCT l_returnflag FROM lineitem) f
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) b
      |), filled AS (
      |  SELECT g.l_returnflag, g.bucket, coalesce(r.register, 0) AS register
      |  FROM grid g LEFT JOIN reg r
      |    ON g.l_returnflag = r.l_returnflag AND g.bucket = r.bucket
      |), summed AS (
      |  SELECT l_returnflag, bucket, register,
      |         CAST(sum(CAST(1 AS BIGINT) << (55 - register))
      |              OVER (PARTITION BY l_returnflag) AS BIGINT) AS s_num,
      |         CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY l_returnflag) AS BIGINT) AS zero_regs
      |  FROM filled
      |), exact AS (
      |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT s.l_returnflag, s.bucket, s.register, s.s_num, s.zero_regs,
      |       e.exact_distinct,
      |       CAST(0.709 AS DOUBLE) * 4096
      |         * CAST((CAST(1 AS BIGINT) << 55) AS DOUBLE)
      |         / CAST(s.s_num AS DOUBLE) AS hll_estimate
      |FROM summed s JOIN exact e ON s.l_returnflag = e.l_returnflag
      |ORDER BY s.l_returnflag, s.bucket""".stripMargin,
    doc = "HyperLogLog from first principles on md5 bits — every register, the harmonic numerator, and the estimate all hash-compared against DuckDB") { (spark, dir) =>
    val li = Sources.table(spark, dir, "lineitem")
    val rho = li.select(
      col("l_returnflag"),
      expr("md5_u60(CAST(l_partkey AS STRING))").as("h"))
      .select(
        col("l_returnflag"),
        expr("h % 64").as("bucket"),
        expr("""CASE WHEN h div 64 = 0 THEN 55
                |     ELSE 55 - length(conv(h div 64, 10, 2)) END""".stripMargin).as("rho"))
    val reg = rho.groupBy("l_returnflag", "bucket").agg(max("rho").as("register"))
    val grid = li.select("l_returnflag").distinct()
      .crossJoin(spark.range(0, 64).select(col("id").as("bucket")))
    val filled = grid.join(reg, Seq("l_returnflag", "bucket"), "left")
      .withColumn("register", coalesce(col("register"), lit(0)))
    val w = Window.partitionBy("l_returnflag")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("exact_distinct"))
    filled
      .withColumn("s_num",
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - register)")).over(w))
      .withColumn("zero_regs",
        sum(when(col("register") === 0, 1L).otherwise(0L)).over(w))
      .join(exact, Seq("l_returnflag"))
      .withColumn("hll_estimate",
        expr("""CAST(0.709 AS DOUBLE) * 4096
                | * CAST(shiftleft(CAST(1 AS BIGINT), 55) AS DOUBLE)
                | / CAST(s_num AS DOUBLE)""".stripMargin))
      .select("l_returnflag", "bucket", "register", "s_num", "zero_regs",
        "exact_distinct", "hll_estimate")
      .orderBy("l_returnflag", "bucket")
  }

  /** K-minimum-values sketch algebra — set-expression cardinalities
    * (here: users who BOTH click AND purchase) without materializing
    * the sets. Like r34's HLL this is built from public md5 arithmetic,
    * so every sketch element, the intersection witness count rho, and
    * both estimators are EXACTLY hash-compared against DuckDB.
    *
    * KMV: a set's sketch is its k smallest hash values; the union
    * sketch is the k smallest of the sketches' union (closed under
    * merge — that is the distributed story: per-partition k-heaps
    * merge associatively); rho = |merged-sketch elements present in
    * both input sketches| gives the Jaccard-style intersection
    * estimate D_inter = (rho/k) * D_union with
    * D_union = (k-1) * 2^60 / u_k (u_k = the k-th smallest). When a
    * side holds fewer than k values the sketch IS the set and both
    * estimates collapse to exact counts — the CASE arms encode that,
    * which also makes the query correct at every scale factor.
    *
    * The 100 TB shape: distinct-by-key shuffle, then a per-type top-k
    * (bounded heap), then arithmetic on <= 2k rows. Exact counts ride
    * along for the error story.
    */
  val r37 = OpQuery.oracled("r37_kmv_intersection",
    """WITH ev AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |  WHERE event_type IN ('click', 'purchase')
      |), hashed AS (
      |  SELECT event_type,
      |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM ev
      |), sk AS (
      |  SELECT event_type, h FROM hashed
      |  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= 64
      |), both_t AS (
      |  SELECT h, count(*) AS n_types FROM sk GROUP BY 1
      |), merged AS (
      |  SELECT DISTINCT h FROM sk ORDER BY h LIMIT 64
      |), ms AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_merged, max(m.h) AS u_k,
      |         CAST(sum(CASE WHEN b.n_types = 2 THEN 1 ELSE 0 END) AS BIGINT) AS rho
      |  FROM merged m JOIN both_t b ON m.h = b.h
      |), ex AS (
      |  SELECT CAST(count(*) AS BIGINT) AS exact_union,
      |         CAST(sum(CASE WHEN nt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
      |  FROM (SELECT user_id, count(*) AS nt FROM ev GROUP BY 1)
      |)
      |SELECT n_merged, u_k, rho, exact_union, exact_inter,
      |       CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
      |            ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(u_k AS DOUBLE) END AS est_union,
      |       CASE WHEN n_merged < 64 THEN CAST(rho AS DOUBLE)
      |            ELSE CAST(rho AS DOUBLE) * (CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(u_k AS DOUBLE)) / CAST(64 AS DOUBLE) END AS est_inter
      |FROM ms CROSS JOIN ex""".stripMargin,
    doc = "KMV sketch set-intersection (click-AND-purchase users): mergeable k-smallest-hashes sketch, exactly oracle-checked") { (spark, dir) =>
    val k = 64
    val ev = Sources.table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "user_id").distinct()
    val hashed = ev.select(col("event_type"),
      expr("md5_u60(CAST(user_id AS STRING))").as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
    val sk = hashed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select("event_type", "h")
    val bothT = sk.groupBy("h").agg(count(lit(1)).as("n_types"))
    val merged = sk.select("h").distinct().orderBy("h").limit(k)
    val ms = merged.join(bothT, "h")
      .agg(count(lit(1)).cast("bigint").as("n_merged"),
        max("h").as("u_k"),
        sum(when(col("n_types") === 2, 1L).otherwise(0L)).cast("bigint").as("rho"))
    val ex = ev.groupBy("user_id").agg(count(lit(1)).as("nt"))
      .agg(count(lit(1)).cast("bigint").as("exact_union"),
        sum(when(col("nt") === 2, 1L).otherwise(0L)).cast("bigint").as("exact_inter"))
    ms.crossJoin(ex)
      .withColumn("est_union", expr(
        """CASE WHEN n_merged < 64 THEN CAST(n_merged AS DOUBLE)
          |     ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(u_k AS DOUBLE) END""".stripMargin))
      .withColumn("est_inter", expr(
        """CASE WHEN n_merged < 64 THEN CAST(rho AS DOUBLE)
          |     ELSE CAST(rho AS DOUBLE) * (CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(u_k AS DOUBLE)) / CAST(64 AS DOUBLE) END""".stripMargin))
      .select("n_merged", "u_k", "rho", "exact_union", "exact_inter",
        "est_union", "est_inter")
  }

  /** Histogram quantile sketch, fully oracle-checkable (the companion
    * to r16's engine-native `percentile_approx`, whose sketch guts are
    * private): bucket every price into fixed $1000-wide integer-cent
    * bins, then read p50/p90/p99 off the cumulative histogram with
    * linear interpolation inside the landing bucket. Exact error bound
    * (half a bucket), and — unlike an exact percentile, which must
    * globally sort or multi-pass the full column — the 100 TB cost is
    * ONE partially-aggregated shuffle of at most a few thousand
    * (bucket, count) rows per task; the quantile read-off happens on
    * the tiny histogram. Every count is an exact integer and the one
    * interpolating division is the same IEEE op in both engines.
    */
  val r40 = OpQuery.oracled("r40_histogram_quantiles",
    """WITH v AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      |), hist AS (
      |  SELECT cents // 100000 AS bucket, count(*) AS cnt
      |  FROM v GROUP BY 1
      |), cum AS (
      |  SELECT bucket, cnt,
      |         sum(cnt) OVER (ORDER BY bucket) AS cum_cnt,
      |         coalesce(sum(cnt) OVER (ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cnt,
      |         (SELECT count(*) FROM v) AS n
      |  FROM hist
      |), qs AS (
      |  SELECT q, CAST(ceil(q * n) AS BIGINT) AS target, n FROM
      |    (SELECT unnest([0.5, 0.9, 0.99]) AS q),
      |    (SELECT count(*) AS n FROM v)
      |), hit AS (
      |  SELECT qs.q, qs.n, cum.bucket, cum.cnt, cum.prev_cnt, qs.target,
      |         row_number() OVER (PARTITION BY qs.q ORDER BY cum.bucket) AS rn
      |  FROM qs JOIN cum ON cum.cum_cnt >= qs.target
      |)
      |SELECT CAST(q AS DOUBLE) AS q, CAST(n AS BIGINT) AS n,
      |       (bucket * 100000 + CAST(target - prev_cnt AS DOUBLE) / cnt * 100000)
      |         / 100.0 AS est_value
      |FROM hit WHERE rn = 1
      |ORDER BY q""".stripMargin,
    doc = "mergeable fixed-width histogram quantiles (p50/p90/p99 with half-bucket error; one bounded shuffle)") { (spark, dir) =>
    val hist = Sources.table(spark, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      .select(expr("cents DIV 100000").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    // shared read-off with the streaming twin (Windows.histogramQuantiles)
    graft.api.Windows.histogramQuantiles(hist, Seq.empty,
        "bucket", "cnt", Seq(0.5, 0.9, 0.99), 100000L)
      .select(col("q"), col("n"), (col("est") / 100.0).as("est_value"))
      .orderBy("q")
  }

  val all: Seq[OpQuery] = Seq(r13, r14, r15, e06, r16, r34, r37, r40)
}
