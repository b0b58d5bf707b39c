package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.Checkpoints.LineageOps

import graft.io.Sources

/** Event-stream analytics over the `events` table — the batch twins of
  * the streaming pipelines in graft.stream (same transforms, bounded
  * input), SURVEY.md §2.9 generalization.
  *
  * Timestamp discipline: `Sources.canonicalEventTime` normalizes `ts`
  * to a long of epoch nanoseconds at load, whatever the physical
  * parquet encoding (TIMESTAMP(NANOS)-as-long via nanosAsLong, or
  * µs/ms TIMESTAMP / TIMESTAMP_NTZ converted exactly). DuckDB reads
  * any of those as a microsecond TIMESTAMP — so every oracled
  * computation here drops to epoch microseconds (`ts div 1000` /
  * `epoch_us(ts)`) before any comparison, ordering, or output
  * (SURVEY.md §7.4.6; EventTimeCompatSpec pins the cross-encoding
  * equivalence).
  */
object EventOps {

  /** ts (long epoch-nanos) truncated to epoch microseconds. */
  private val tsUs: Column = expr("ts div 1000")

  val e01 = OpQuery.oracled("e01_event_type_stats",
    """SELECT event_type,
      |       count(*) AS cnt,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1 ORDER BY event_type""".stripMargin,
    doc = "per-type event profile (A1/A5 over the event stream)") { (spark, dir) =>
    Sources.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy("event_type")
  }

  /** Tumbling one-hour windows — the batch form of the streaming
    * `window($"ts", "1 hour")` aggregation; keyed by epoch seconds of
    * the window start so both engines agree at any timestamp resolution.
    */
  val e02 = OpQuery.oracled("e02_hourly_event_counts",
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
      |       event_type, count(*) AS cnt
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin,
    doc = "tumbling event-time window (batch twin of streaming window agg, §2.9)") { (spark, dir) =>
    Sources.table(spark, dir, "events")
      .withColumn("hour_start", expr("(ts div 3600000000000) * 3600"))
      .groupBy("hour_start", "event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("hour_start", "event_type")
  }

  /** Gap-based sessionization (30-minute inactivity): lag to detect
    * session starts, running sum to number sessions, then per-session
    * rollup. One shuffle on user_id; both window passes reuse it.
    */
  val e03 = OpQuery.oracled("e03_user_sessions",
    """WITH ordered AS (
      |  SELECT user_id, event_id,
      |         epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM ordered
      |), numbered AS (
      |  SELECT user_id, ts_us,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id
      |                                    ORDER BY ts_us, event_id) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id,
      |       count(*) AS n_events,
      |       min(ts_us) AS start_us,
      |       max(ts_us) - min(ts_us) AS duration_us
      |FROM numbered
      |GROUP BY 1, 2
      |ORDER BY user_id, session_id""".stripMargin,
    doc = "gap-based sessionization (lag + running window) — streaming session_window batch twin") { (spark, dir) =>
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Sources.table(spark, dir, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .orderBy("user_id", "session_id")
  }

  /** Semi-structured extraction: pull an int out of the JSON props
    * payload — the batch twin of the streaming from_json decode (S4).
    */
  val e04 = OpQuery.oracled("e04_json_props_sum",
    """SELECT event_type,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) AS cnt
      |FROM events
      |GROUP BY 1 ORDER BY event_type""".stripMargin,
    doc = "JSON payload decode (S4/F8 generalized to get_json_object)") { (spark, dir) =>
    Sources.table(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** Latest event per user — keyed dedup by recency (the batch twin of
    * watermarked streaming dropDuplicates, fixing the reference's
    * unbounded-state defect at KINESIS:213).
    */
  val e05 = OpQuery.oracled("e05_latest_event_per_user",
    """WITH ranked AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events
      |)
      |SELECT user_id, event_type AS last_event_type, ts_us AS last_ts_us
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id""".stripMargin,
    doc = "top-1-per-key by recency (W1 over event time; keyed dedup)") { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
    Sources.table(spark, dir, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("ts_us").as("last_ts_us"))
      .orderBy("user_id")
  }

  /** As-of join: for every purchase, the most recent click by the same
    * user at-or-before the purchase time. Implemented as a single
    * carry-forward window (running max of click times) instead of a
    * range self-join — one shuffle on user_id, no O(n*m) pair blowup,
    * the scalable formulation of an as-of join when both sides share a
    * partition key.
    */
  val e07 = OpQuery.oracled("e07_asof_click_before_purchase",
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_us(ts) AS ts_us,
      |         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY epoch_us(ts), event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      |  FROM events
      |)
      |SELECT user_id, event_id, ts_us,
      |       last_click_us,
      |       ts_us - last_click_us AS us_since_click
      |FROM ordered
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, ts_us, event_id""".stripMargin,
    doc = "as-of join via carry-forward window (generalized operator the reference lacks)") { (spark, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.table(spark, dir, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("last_click_us"),
        (col("ts_us") - col("last_click_us")).as("us_since_click"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Ordered conversion funnel: first view → first click within an
    * hour of it → first purchase within an hour of that, per user. The
    * sequential-pattern query behind every "where do users drop off"
    * dashboard; order matters (a click before the view does not count),
    * which is what separates this from e01's flat type counts.
    *
    * Scale shape: each stage is a type-filtered scan aggregated to one
    * row per user (min-ts), then an equi-join on user_id to gate the
    * next stage — uniform keys, three shuffles total, no windows over
    * the full stream and no per-user event lists.
    */
  /** e08's oracle, shared VERBATIM with the streaming funnel qs23
    * (the e35/qs19 pairing): the streamed per-user stage table's
    * readout must land on the flat-table funnel exactly.
    */
  private[ops] val funnelOracleSql: String =
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS v_us
      |  FROM events WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click'
      |    AND epoch_us(e.ts) > v.v_us
      |    AND epoch_us(e.ts) <= v.v_us + 3600000000
      |  GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND epoch_us(e.ts) > c.c_us
      |    AND epoch_us(e.ts) <= c.c_us + 3600000000
      |  GROUP BY 1
      |)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_view_click,
      |       (SELECT count(*) FROM p) AS n_full_funnel,
      |       CAST((SELECT count(*) FROM c) AS DOUBLE)
      |         / (SELECT count(*) FROM v) AS view_click_rate,
      |       CAST((SELECT count(*) FROM p) AS DOUBLE)
      |         / (SELECT count(*) FROM v) AS full_funnel_rate""".stripMargin

  val e08 = OpQuery.oracled("e08_funnel_conversion", funnelOracleSql,
    doc = "ordered view→click→purchase funnel with per-stage time gates") { (spark, dir) =>
    val hourUs = 3600000000L
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsUs.as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("v_us") && col("us") <= col("v_us") + hourUs)
      .groupBy("user_id").agg(min("us").as("c_us"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("c_us") && col("us") <= col("c_us") + hourUs)
      .groupBy("user_id").agg(min("us").as("p_us"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
      .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
        (col("n_view_click").cast("double") / col("n_view")).as("view_click_rate"),
        (col("n_full_funnel").cast("double") / col("n_view")).as("full_funnel_rate"))
  }

  /** Weekly cohort retention: users cohorted by the week of their first
    * signup event; retention(k) = fraction of the cohort active (any
    * event) k weeks later, k = 0..3. Weeks are epoch-microsecond
    * buckets (`us div week`), not calendar weeks — integer arithmetic
    * both engines compute identically, immune to locale/week-start
    * differences.
    *
    * Scale shape: cohort assignment is one min-aggregate per user;
    * activity is a distinct on (user, week) — both shuffle on uniform
    * user ids; the retention matrix is tiny (weeks x 4) however large
    * the stream.
    */
  val e09 = OpQuery.oracled("e09_cohort_retention",
    """WITH su AS (
      |  SELECT user_id, min(epoch_us(ts)) // 604800000000 AS w0
      |  FROM events WHERE event_type = 'signup' GROUP BY 1
      |), act AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
      |  FROM events
      |), cs AS (
      |  SELECT w0, count(*) AS cohort_size FROM su GROUP BY 1
      |), r AS (
      |  SELECT su.user_id, su.w0, act.w - su.w0 AS k
      |  FROM act JOIN su USING (user_id)
      |  WHERE act.w - su.w0 BETWEEN 0 AND 3
      |)
      |SELECT r.w0 AS cohort_week, CAST(r.k AS BIGINT) AS k,
      |       count(DISTINCT r.user_id) AS n_active,
      |       CAST(max(cs.cohort_size) AS BIGINT) AS cohort_size,
      |       CAST(count(DISTINCT r.user_id) AS DOUBLE)
      |         / max(cs.cohort_size) AS retention
      |FROM r JOIN cs ON cs.w0 = r.w0
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin,
    doc = "weekly signup-cohort retention matrix (k = 0..3 weeks out)") { (spark, dir) =>
    val weekUs = 604800000000L
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), tsUs.as("us"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(expr(s"min(us) div $weekUs").as("w0"))
    val act = ev.select(col("user_id"), expr(s"us div $weekUs").as("w")).distinct()
    val cs = su.groupBy("w0").agg(count(lit(1)).as("cohort_size"))
    val r = act.join(su, "user_id")
      .withColumn("k", col("w") - col("w0"))
      .filter(col("k").between(0, 3))
    r.join(cs, "w0")
      .groupBy(col("w0").as("cohort_week"), col("k").cast("bigint").as("k"))
      .agg(countDistinct("user_id").as("n_active"),
        max("cohort_size").cast("bigint").as("cohort_size"),
        (countDistinct("user_id").cast("double") / max("cohort_size"))
          .as("retention"))
      .orderBy("cohort_week", "k")
  }

  /** Batch twin of [[graft.stream.Pipelines.trendingTopK]]: the top-2
    * event types of every hour window, ranked through the custom
    * bounded-heap [[graft.plans.GroupTopK]] operator. The oracle is the
    * row_number window formulation — the heap-based plan must be
    * output-equivalent to the full per-window sort it replaces, which
    * is exactly the substitution contract that makes it safe when a
    * window holds millions of keys.
    */
  val e10 = OpQuery.oracled("e10_trending_topk_per_hour",
    """WITH c AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
      |         event_type, count(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |), r AS (
      |  SELECT hour_start, event_type, cnt,
      |         row_number() OVER (PARTITION BY hour_start
      |                            ORDER BY cnt DESC, event_type ASC) AS rn
      |  FROM c
      |)
      |SELECT hour_start, event_type, CAST(cnt AS BIGINT) AS cnt
      |FROM r WHERE rn <= 2
      |ORDER BY hour_start, cnt DESC, event_type""".stripMargin,
    doc = "trending top-k per hour window via the custom GroupTopK operator (batch twin of the streaming pipeline)") { (spark, dir) =>
    val c = Sources.table(spark, dir, "events")
      .withColumn("hour_start", expr("(ts div 3600000000000) * 3600"))
      .groupBy("hour_start", "event_type").agg(count(lit(1)).as("cnt"))
    graft.api.Windows.topKPerGroup(c, Seq("hour_start"),
        Seq(("cnt", true), ("event_type", false)), 2)
      .select(col("hour_start"), col("event_type"),
        col("cnt").cast("bigint").as("cnt"))
      .orderBy(col("hour_start"), col("cnt").desc, col("event_type"))
  }

  /** As-of join as a NATIVE operator ([[graft.plans.AsOfJoin]] via
    * [[graft.api.Joins.asOfJoin]]): every purchase matched to the last
    * click at or before it, per user, with the click's event id as the
    * deterministic tie-break. Where e07 composes the semantics from a
    * union + carry-forward window (both streams globally sorted per
    * key) and the oracle's formulation explodes every
    * (purchase, earlier-click) candidate pair before ranking, the
    * native exec asks the planner for co-partitioned key-sorted inputs
    * and produces the answer in ONE merge pass per partition holding a
    * single current-best row — the shape that survives a hot user with
    * millions of clicks.
    */
  val e11 = OpQuery.oracled("e11_asof_join_native",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |), p AS (
      |  SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT event_id AS c_event, user_id AS c_user, ts_us AS c_ts, value AS c_value
      |  FROM e WHERE event_type = 'click'
      |), cand AS (
      |  SELECT p.event_id, c.c_ts, c.c_value,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.c_ts DESC, c.c_event DESC) AS rn
      |  FROM p JOIN c ON c.c_user = p.user_id AND c.c_ts <= p.ts_us
      |)
      |SELECT p.event_id, p.user_id, p.ts_us, m.c_ts, m.c_value
      |FROM p LEFT JOIN (SELECT event_id, c_ts, c_value FROM cand WHERE rn = 1) m
      |  ON m.event_id = p.event_id
      |ORDER BY p.event_id""".stripMargin,
    doc = "native as-of join operator: last click at-or-before each purchase, one merge pass") { (spark, dir) =>
    val e = Sources.table(spark, dir, "events").withColumn("ts_us", tsUs)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id").as("c_user"),
        col("ts_us").as("c_ts"), col("value").as("c_value"))
    graft.api.Joins.asOfJoin(p, c,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
        leftTimeCol = "ts_us", rightTimeCol = "c_ts",
        rightTiebreak = Seq("c_event"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("c_ts"),
        col("c_value"))
      .orderBy("event_id")
  }

  /** e11 with a look-back bound: the click must fall within the hour
    * before the purchase (attribution windows expire). Exercises the
    * operator's merge_asof-style tolerance — the match state still
    * carries forward (a later purchase can match the same click), only
    * the emit is gated.
    */
  val e12 = OpQuery.oracled("e12_asof_join_tolerance",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |), p AS (
      |  SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT event_id AS c_event, user_id AS c_user, ts_us AS c_ts, value AS c_value
      |  FROM e WHERE event_type = 'click'
      |), cand AS (
      |  SELECT p.event_id, c.c_ts, c.c_value,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.c_ts DESC, c.c_event DESC) AS rn
      |  FROM p JOIN c ON c.c_user = p.user_id AND c.c_ts <= p.ts_us
      |   AND c.c_ts >= p.ts_us - 3600000000
      |)
      |SELECT p.event_id, p.user_id, p.ts_us, m.c_ts, m.c_value
      |FROM p LEFT JOIN (SELECT event_id, c_ts, c_value FROM cand WHERE rn = 1) m
      |  ON m.event_id = p.event_id
      |ORDER BY p.event_id""".stripMargin,
    doc = "as-of join with a one-hour look-back tolerance (attribution window)") { (spark, dir) =>
    val e = Sources.table(spark, dir, "events").withColumn("ts_us", tsUs)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id").as("c_user"),
        col("ts_us").as("c_ts"), col("value").as("c_value"))
    graft.api.Joins.asOfJoin(p, c,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
        leftTimeCol = "ts_us", rightTimeCol = "c_ts",
        rightTiebreak = Seq("c_event"), toleranceUs = Some(3600000000L))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("c_ts"),
        col("c_value"))
      .orderBy("event_id")
  }

  /** Event-transition matrix: for each user's time-ordered stream, the
    * (event_type -> next event_type) bigram counts — the Markov-chain
    * fuel behind funnel diagnostics and next-action models. One window
    * pass (lead over user partitions, event_id tie-break for equal
    * timestamps) then a 25-cell aggregate: the shuffle is on user_id
    * once, never on the transition pairs.
    */
  val e13 = OpQuery.oracled("e13_event_transitions",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY epoch_us(ts), event_id) AS next_type
      |  FROM events
      |)
      |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |FROM o WHERE next_type IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY from_type, to_type""".stripMargin,
    doc = "per-user event-transition bigram counts (Markov transition matrix)") { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Sources.table(spark, dir, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** User-journey path mining: each user's FIRST five events (by time,
    * event_id tie-break) concatenated into a path string, then the 20
    * most common journeys. The per-user collect is bounded by the
    * rank filter BEFORE the aggregation — the list can never exceed
    * five elements, so this is the safe collect shape (contrast r15's
    * unbounded collect_set anti-pattern). One shuffle on user_id, one
    * on the path.
    */
  val e14 = OpQuery.oracled("e14_top_user_paths",
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events
      |), paths AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 5
      |  GROUP BY 1
      |)
      |SELECT path, count(*) AS n_users
      |FROM paths GROUP BY 1
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    doc = "top-20 user journeys: first-5-event paths per user (bounded collect), counted") { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Sources.table(spark, dir, "events")
      .withColumn("ts_us", tsUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** Robust outlier profile per event type: median and MAD (median
    * absolute deviation) over integer cents, plus how many events sit
    * more than 10 MADs out. Two exact-percentile passes (the robust
    * twin of mean/stddev — resistant to the very outliers it hunts);
    * values go through integer cents so the deviation arithmetic is
    * bit-exact cross-engine, and the interpolated medians land on
    * exact .0/.5 doubles.
    */
  val e15 = OpQuery.oracled("e15_mad_outliers",
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), med AS (
      |  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
      |  FROM v GROUP BY 1
      |), dev AS (
      |  SELECT v.event_type, v.cents, med.med_cents,
      |         abs(v.cents - med.med_cents) AS adev
      |  FROM v JOIN med USING (event_type)
      |), mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
      |  FROM dev GROUP BY 1
      |)
      |SELECT dev.event_type,
      |       CAST(any_value(dev.med_cents) / 100 AS DOUBLE) AS median_value,
      |       CAST(any_value(mad.mad_cents) / 100 AS DOUBLE) AS mad_value,
      |       CAST(sum(CASE WHEN dev.adev > 10 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       count(*) AS cnt
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY 1
      |ORDER BY event_type""".stripMargin,
    doc = "median + MAD robust outlier profile per event type (two exact-percentile passes over integer cents)") { (spark, dir) =>
    val v = Sources.table(spark, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("bigint").as("cents"))
    val med = v.groupBy("event_type")
      .agg(percentile(col("cents"), lit(0.5)).as("med_cents"))
    val dev = v.join(med, "event_type")
      .withColumn("adev", abs(col("cents") - col("med_cents")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("adev"), lit(0.5)).as("mad_cents"))
    dev.join(mad, "event_type")
      .groupBy("event_type")
      .agg(
        (first(col("med_cents")) / 100).cast("double").as("median_value"),
        (first(col("mad_cents")) / 100).cast("double").as("mad_value"),
        sum(when(col("adev") > lit(10) * col("mad_cents"), 1).otherwise(0))
          .cast("bigint").as("n_outliers"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** Inter-event gap profile: per-user lag window derives the time
    * since the user's previous event (any type), then exact percentile
    * aggregates summarize arrival cadence per event type of the LATER
    * event — the pipeline-health metric that tells a 100 TB ingest
    * whether a source went bursty. Gaps are exact integer milliseconds
    * (epoch-ms subtraction), so the percentile interpolation is
    * deterministic across engines; the lag shuffles once on user_id
    * and the aggregation re-shuffles only the per-gap rows.
    */
  val e16 = OpQuery.oracled("e16_inter_event_gaps",
    """WITH g AS (
      |  SELECT event_type,
      |         (epoch_ns(ts) - epoch_ns(lag(ts) OVER (
      |            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS gap_ms
      |  FROM events
      |)
      |SELECT event_type,
      |       count(*) AS n_gaps,
      |       CAST(quantile_cont(gap_ms, 0.5) AS DOUBLE) AS median_gap_ms,
      |       CAST(quantile_cont(gap_ms, 0.9) AS DOUBLE) AS p90_gap_ms,
      |       CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
      |FROM g WHERE gap_ms IS NOT NULL
      |GROUP BY 1 ORDER BY event_type""".stripMargin,
    doc = "per-type inter-event arrival gaps (lag window + exact percentiles over integer ms)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // ts surfaces as BIGINT epoch-nanos on the Spark side (parquet ns
    // precision); the oracle mirrors with epoch_ns. Integer ms division
    // truncates identically in both engines on positive gaps.
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Sources.table(spark, dir, "events")
      .select(col("event_type"),
        (col("ts") - lag(col("ts"), 1).over(w)).as("gap_ns"))
      .select(col("event_type"), expr("gap_ns DIV 1000000").as("gap_ms"))
      .filter(col("gap_ms").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_gaps"),
        percentile(col("gap_ms"), lit(0.5)).cast("double").as("median_gap_ms"),
        percentile(col("gap_ms"), lit(0.9)).cast("double").as("p90_gap_ms"),
        max(col("gap_ms")).cast("bigint").as("max_gap_ms"))
      .orderBy("event_type")
  }

  /** Time-to-convert: for each user with a view, the latency to their
    * first purchase AFTER that view, summarized with exact percentiles
    * — the latency companion to e08's stage-count funnel. Two
    * aggregations shuffled on user_id (first view, then first
    * qualifying purchase); the delay frame that feeds the percentile is
    * one row per converter, so the exact percentile's sort cost is
    * bounded by converters, not events. All gaps are integer epoch-nano
    * subtractions truncated to ms identically in both engines.
    */
  val e17 = OpQuery.oracled("e17_time_to_convert",
    """WITH v AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS v_ns FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, min(epoch_ns(e.ts)) AS p_ns
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > v.v_ns
      |  GROUP BY 1
      |), d AS (
      |  SELECT (p.p_ns - v.v_ns) // 1000000 AS delay_ms
      |  FROM v JOIN p USING (user_id)
      |)
      |SELECT (SELECT count(*) FROM v) AS n_viewers,
      |       count(*) AS n_converted,
      |       CAST(quantile_cont(delay_ms, 0.5) AS DOUBLE) AS median_delay_ms,
      |       CAST(quantile_cont(delay_ms, 0.9) AS DOUBLE) AS p90_delay_ms,
      |       CAST(max(delay_ms) AS BIGINT) AS max_delay_ms
      |FROM d""".stripMargin,
    doc = "view->purchase conversion latency with exact percentiles (the latency half of the funnel)") { (spark, dir) =>
    val events = Sources.table(spark, dir, "events")
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ns"))
    val p = events.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("ts") > col("v_ns"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ns"), first(col("v_ns")).as("v_ns2"))
    val d = p.select(expr("(p_ns - v_ns2) DIV 1000000").as("delay_ms"))
    d.agg(
        count(lit(1)).as("n_converted"),
        percentile(col("delay_ms"), lit(0.5)).cast("double").as("median_delay_ms"),
        percentile(col("delay_ms"), lit(0.9)).cast("double").as("p90_delay_ms"),
        max(col("delay_ms")).cast("bigint").as("max_delay_ms"))
      .crossJoin(v.agg(count(lit(1)).as("n_viewers")))
      .select("n_viewers", "n_converted", "median_delay_ms",
        "p90_delay_ms", "max_delay_ms")
  }

  /** Hourly value-quantile profile through the mergeable-histogram
    * read-off ([[graft.api.Windows.histogramQuantiles]] — the same code
    * the r40 global query and the streaming pipeline use, here
    * exercising its GROUPED path under the oracle): per hour, p50/p90
    * of the event value off a $10-bucket histogram. The only
    * corpus-sized shuffle is the (hour, bucket) count; the quantile
    * windows run on the histogram frame, whose size is hours x
    * occupied buckets regardless of event volume.
    */
  val e18 = OpQuery.oracled("e18_hourly_value_quantiles",
    """WITH v AS (
      |  SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_start,
      |         CAST(round(value * 100) AS BIGINT) // 1000 AS bucket
      |  FROM events
      |), hist AS (
      |  SELECT hour_start, bucket, count(*) AS cnt FROM v GROUP BY 1, 2
      |), cum AS (
      |  SELECT hour_start, bucket, cnt,
      |         sum(cnt) OVER (PARTITION BY hour_start ORDER BY bucket) AS cum_cnt,
      |         coalesce(sum(cnt) OVER (PARTITION BY hour_start ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cnt,
      |         sum(cnt) OVER (PARTITION BY hour_start) AS n
      |  FROM hist
      |), hit AS (
      |  SELECT cum.hour_start, q.q, cum.n, cum.bucket, cum.cnt, cum.prev_cnt,
      |         CAST(ceil(q.q * cum.n) AS BIGINT) AS target,
      |         row_number() OVER (PARTITION BY cum.hour_start, q.q ORDER BY cum.bucket) AS rn
      |  FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9]) AS q) q
      |  WHERE cum.cum_cnt >= CAST(ceil(q.q * cum.n) AS BIGINT)
      |)
      |SELECT hour_start, CAST(q AS DOUBLE) AS q, CAST(n AS BIGINT) AS n,
      |       (bucket * 1000 + CAST(target - prev_cnt AS DOUBLE) / cnt * 1000) / 100.0
      |         AS est_value
      |FROM hit WHERE rn = 1
      |ORDER BY hour_start, q""".stripMargin,
    doc = "per-hour value quantiles via the shared mergeable-histogram read-off (grouped path of Windows.histogramQuantiles)") { (spark, dir) =>
    val hist = Sources.table(spark, dir, "events")
      .select(expr("(ts DIV 3600000000000) * 3600").as("hour_start"),
        expr("CAST(round(value * 100) AS BIGINT) DIV 1000").as("bucket"))
      .groupBy("hour_start", "bucket").agg(count(lit(1)).as("cnt"))
    graft.api.Windows.histogramQuantiles(hist, Seq("hour_start"),
        "bucket", "cnt", Seq(0.5, 0.9), 1000L)
      .select(col("hour_start"), col("q"), col("n"),
        (col("est") / 100.0).as("est_value"))
      .orderBy("hour_start", "q")
  }

  /** Per-event session-relative features — the feature-extraction
    * shape a behavioral sequence model trains on: each event gets its
    * session id (e03's gap rule), its ordinal within the session, and
    * its offset from the session start. Three windows, all partitioned
    * by user (then session) — the same single user-keyed shuffle
    * sessionization already pays; output is one row per event, so this
    * stage is the identity in volume and must never add a second
    * corpus-wide shuffle. Restricted to a deterministic user slice to
    * keep the oracle diff small.
    */
  val e19 = OpQuery.oracled("e19_session_features",
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events WHERE user_id % 100 = 0
      |), flagged AS (
      |  SELECT user_id, event_id, event_type, ts_us,
      |         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM ordered
      |), numbered AS (
      |  SELECT user_id, event_id, event_type, ts_us,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id
      |                                     ORDER BY ts_us, event_id) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, event_id, event_type,
      |       CAST(row_number() OVER (PARTITION BY user_id, session_id
      |                               ORDER BY ts_us, event_id) AS BIGINT) AS ordinal,
      |       ts_us - min(ts_us) OVER (PARTITION BY user_id, session_id) AS offset_us
      |FROM numbered
      |ORDER BY user_id, session_id, ordinal""".stripMargin,
    doc = "per-event session features (session id, ordinal, offset from session start) — sequence-model feature extraction") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wSess = Window.partitionBy("user_id", "session_id")
    val ordered = Sources.table(spark, dir, "events")
      .filter(col("user_id") % 100 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(wUser).cast("bigint"))
    ordered
      .withColumn("ordinal",
        row_number().over(wSess.orderBy("ts_us", "event_id")).cast("bigint"))
      .withColumn("offset_us", col("ts_us") - min(col("ts_us")).over(wSess))
      .select("user_id", "session_id", "event_id", "event_type",
        "ordinal", "offset_us")
      .orderBy("user_id", "session_id", "ordinal")
  }

  /** RFM purchase features with quintile scores — the classic
    * recency/frequency/monetary feature triple plus its rank-binned
    * form, as a model-ready per-user frame. One corpus-sized shuffle
    * (the per-user aggregate); the three ntile windows then run over
    * the USER-level frame, which is orders of magnitude smaller than
    * the event stream — global single-partition windows are acceptable
    * exactly because they never see raw events (same argument as the
    * r40 histogram read-off). Every ORDER BY carries user_id so the
    * quintile assignment is a total order, and money stays in integer
    * cents.
    */
  /** Quintile scores are HISTOGRAM-GRAIN since r16 (verdict item 4):
    * the previous `ntile(5)` form ran three single-partition windows
    * over the full user frame — exact, but the W2 hazard class at
    * 10⁹ users (one hot task sorting the entity dimension). The
    * histogram form cuts each metric's axis at distinct-VALUE grain
    * (`(cum_before·5) div n + 1`, the e46/e38/r67 precedent) and
    * broadcast-joins the value→bin map back — no entity sort at any
    * scale. Ties share a bin (ntile split them by user_id), which is
    * the defensible feature semantics anyway: two users with
    * identical spend should not land in different spend bins.
    */
  private def rfmBinSql(metric: String, alias: String): String =
    s"""$alias AS (
       |  SELECT $metric AS v, count(*) AS m FROM rfm GROUP BY 1
       |), ${alias}b AS (
       |  SELECT v,
       |         CAST(coalesce(sum(m) OVER (ORDER BY v
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |              0) AS BIGINT) AS cb
       |  FROM $alias
       |), ${alias}q AS (
       |  SELECT v, CAST((cb * 5) // nu + 1 AS INT) AS q
       |  FROM ${alias}b CROSS JOIN nu
       |)""".stripMargin

  val e20 = OpQuery.oracled("e20_rfm_features",
    s"""WITH rfm AS (
      |  SELECT user_id,
      |         CAST(max(epoch_us(ts)) AS BIGINT) AS last_seen_us,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1
      |), nu AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nu FROM rfm
      |), ${rfmBinSql("last_seen_us", "rb")},
      |${rfmBinSql("frequency", "fb")},
      |${rfmBinSql("monetary_cents", "mb")}
      |SELECT user_id, last_seen_us, frequency, monetary_cents,
      |       rbq.q AS r_quintile, fbq.q AS f_quintile, mbq.q AS m_quintile
      |FROM rfm
      |JOIN rbq ON rbq.v = rfm.last_seen_us
      |JOIN fbq ON fbq.v = rfm.frequency
      |JOIN mbq ON mbq.v = rfm.monetary_cents
      |ORDER BY user_id""".stripMargin,
    doc = "per-user RFM purchase features + histogram-grain quintile scores (distinct-value cumulative cuts, ties share a bin; no entity-frame sort)") { (spark, dir) =>
    val purchases = Sources.table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), tsUs.as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    graft.api.Features.quintilesHistogram(
        graft.api.Features.rfm(purchases, "user_id", "us", "cents"),
        metrics = Seq(("last_seen_us", "r_quintile"),
          ("frequency", "f_quintile"), ("monetary_cents", "m_quintile")))
      .orderBy("user_id")
  }

  /** Rolling 7-day active users per day — the WAU curve. The naive
    * formulation is a count-distinct over a sliding range window
    * (either a range self-join or per-day re-scans of a week of raw
    * events). The engine instead dedups the stream to (day, user) pairs
    * ONCE — the only corpus-sized shuffle, with map-side partial
    * distinct — then fans each pair out to the ≤7 window days it
    * contributes to and distinct-counts per window day. Work after the
    * dedup is 7 × |active-pairs| regardless of event volume; the
    * broadcast semi join against the observed-day set clips the
    * fan-out's tail past the last day of data. The DuckDB oracle keeps
    * the canonical BETWEEN range-join form, so hash parity proves the
    * fan-out rewrite exact.
    */
  val e21 = OpQuery.oracled("e21_rolling_active_users",
    """WITH du AS (
      |  SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
      |  FROM events
      |), days AS (SELECT DISTINCT day FROM du)
      |SELECT d.day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_7d
      |FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "rolling 7-day distinct actives per day: one (day,user) dedup shuffle + bounded 7x fan-out, vs the oracle's range join") { (spark, dir) =>
    graft.api.Features.rollingDistinct(
        Sources.table(spark, dir, "events")
          .select(expr("ts DIV 86400000000000").as("day"), col("user_id")),
        key = "user_id", unit = "day", windowUnits = 7)
      .orderBy("day")
  }

  /** DAU/WAU stickiness per day — the engagement ratio every product
    * dashboard tracks: same-day distinct actives over trailing-7-day
    * distinct actives ([[e21]]'s frame reused for the denominator; the
    * numerator is the windowUnits=1 degenerate case of the same
    * operator, so both legs share the one (day, user) dedup shape).
    * The ratio is one IEEE division of exact BIGINT counts.
    */
  val e28 = OpQuery.oracled("e28_dau_wau_stickiness",
    """WITH du AS (
      |  SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
      |  FROM events
      |), days AS (SELECT DISTINCT day FROM du),
      |w AS (
      |  SELECT d.day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_7d
      |  FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY 1
      |), dau AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS active_1d FROM du GROUP BY 1
      |)
      |SELECT w.day, dau.active_1d, w.active_7d,
      |       CAST(dau.active_1d AS DOUBLE) / CAST(w.active_7d AS DOUBLE)
      |         AS stickiness
      |FROM w JOIN dau ON dau.day = w.day
      |ORDER BY w.day""".stripMargin,
    doc = "DAU / trailing-7d-active stickiness per day (two legs of the rolling-distinct operator, one exact-integer IEEE ratio)") { (spark, dir) =>
    val du = Sources.table(spark, dir, "events")
      .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
    val wau = graft.api.Features.rollingDistinct(du,
        key = "user_id", unit = "day", windowUnits = 7)
    val dau = du.distinct()
      .groupBy("day").agg(count(lit(1)).cast("bigint").as("active_1d"))
    wau.join(dau, "day")
      .select(col("day"), col("active_1d"), col("active_7d"),
        (col("active_1d").cast("double") / col("active_7d").cast("double"))
          .as("stickiness"))
      .orderBy("day")
  }

  /** Consecutive-day activity streaks — the gaps-and-islands pattern:
    * `day - row_number` is constant within a run of consecutive days,
    * so one per-user window + one group-by turns runs into rows with
    * NO self-join and no iteration. Everything after the (day, user)
    * dedup is per-user partitioned work on ≤ |days| rows per user;
    * integer day arithmetic end to end.
    */
  val e22 = OpQuery.oracled("e22_activity_streaks",
    """WITH du AS (
      |  SELECT DISTINCT user_id,
      |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |  FROM events
      |), g AS (
      |  SELECT user_id, day,
      |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM du
      |), runs AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      |  FROM g GROUP BY 1, 2
      |)
      |SELECT user_id,
      |       CAST(max(len) AS BIGINT) AS longest_streak,
      |       CAST(count(*) AS BIGINT) AS n_streaks,
      |       CAST(sum(len) AS BIGINT) AS total_active_days
      |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,
    doc = "per-user consecutive-day activity streaks (gaps-and-islands: day - row_number run key, no self-join)") { (spark, dir) =>
    graft.api.Features.streaks(
        Sources.table(spark, dir, "events")
          .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
          .distinct(),
        key = "user_id", unit = "day")
      .orderBy("user_id")
  }

  /** One metric's four exact-quantile boundary scalars for e47's
    * oracle: Spark's `approxQuantile(relativeError = 0)` returns the
    * value at rank `ceil(p·n)` (1-indexed ascending, duplicates
    * counted — pinned empirically against Spark 4.1), which at
    * histogram grain is the smallest distinct value whose inclusive
    * cumulative count reaches the rank; `(k·nu + 4) // 5` is that
    * ceiling in exact integers.
    */
  private def sqBoundsSql(metric: String, alias: String): String = {
    val bs = (1 to 4).map(k =>
      s"(SELECT min(v) FROM ${alias}c WHERE cum >= ($k * nu + 4) // 5)" +
        s" AS b$k").mkString(",\n       |         ")
    s"""$alias AS (
       |  SELECT $metric AS v, count(*) AS m FROM rfm GROUP BY 1
       |), ${alias}c AS (
       |  SELECT v, sum(m) OVER (ORDER BY v) AS cum FROM $alias
       |), ${alias}q AS (
       |  SELECT $bs
       |  FROM nu
       |)""".stripMargin
  }

  private def sqScoreSql(metric: String, alias: String): String =
    s"CAST(1 + (CASE WHEN $metric > ${alias}q.b1 THEN 1 ELSE 0 END)" +
      s" + (CASE WHEN $metric > ${alias}q.b2 THEN 1 ELSE 0 END)" +
      s" + (CASE WHEN $metric > ${alias}q.b3 THEN 1 ELSE 0 END)" +
      s" + (CASE WHEN $metric > ${alias}q.b4 THEN 1 ELSE 0 END) AS INT)"

  /** e47: the SAMPLED-BOUNDARY sibling of e20 in the registry (r15
    * verdict item 4's second half): the same RFM frame scored through
    * [[graft.api.Features.quintilesSampled]] — per metric, n−1
    * boundary values from `approxQuantile` (a distributed sketch
    * aggregation; no sort anywhere, not even over distinct values)
    * and a one-map-stage `1 + #boundaries strictly below` score. At
    * `relativeError = 0` the sketch keeps all samples and the
    * boundaries are the exact rank-`ceil(p·n)` statistics — which is
    * what makes the query ORACLE-EXPRESSIBLE bit-for-bit (the
    * production dial is a small positive ε, same code path, bounded
    * sketch); rows tying ON a boundary land in the lower bin on both
    * engines by the shared strict-> rule. This puts the documented
    * scale path of the quintile family under the hash gate instead of
    * spec-only (the r15 `weak` mark).
    */
  val e47 = OpQuery.oracled("e47_rfm_quintiles_sampled",
    s"""WITH rfm AS (
      |  SELECT user_id,
      |         CAST(max(epoch_us(ts)) AS BIGINT) AS last_seen_us,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1
      |), nu AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nu FROM rfm
      |), ${sqBoundsSql("last_seen_us", "sr")},
      |${sqBoundsSql("frequency", "sf")},
      |${sqBoundsSql("monetary_cents", "sm")}
      |SELECT user_id, last_seen_us, frequency, monetary_cents,
      |       ${sqScoreSql("last_seen_us", "sr")} AS r_quintile,
      |       ${sqScoreSql("frequency", "sf")} AS f_quintile,
      |       ${sqScoreSql("monetary_cents", "sm")} AS m_quintile
      |FROM rfm CROSS JOIN srq CROSS JOIN sfq CROSS JOIN smq
      |ORDER BY user_id""".stripMargin,
    doc = "per-user RFM features + sampled-boundary quintiles (approxQuantile sketch boundaries at relativeError 0, strict-above scoring; the sort-free scale path of the quintile family under the hash gate)") { (spark, dir) =>
    val purchases = Sources.table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), tsUs.as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    graft.api.Features.quintilesSampled(
        graft.api.Features.rfm(purchases, "user_id", "us", "cents"),
        metrics = Seq(("last_seen_us", "r_quintile"),
          ("frequency", "f_quintile"), ("monetary_cents", "m_quintile")),
        relativeError = 0.0)
      .orderBy("user_id")
  }

  /** Traffic-concentration (Pareto) report: what share of all events
    * the top 10% of users generate — the skew diagnostic that decides
    * whether per-user operators downstream need salting. The top-10%
    * cutoff is integer rank arithmetic, never a float percentile; the
    * only float op is the one share division in the final row.
    *
    * HISTOGRAM-GRAIN since r16 (verdict item 4): the previous form
    * ranked every user through one single-partition `row_number`
    * window — the W2 hazard at 10⁹ users. Users sharing a per-user
    * count are interchangeable for the report's SUMS (every user in a
    * value group contributes the same `c`), so the cutoff moves to
    * distinct-VALUE grain: with `cb` = users strictly above value `c`
    * and `K = n_users div 10` (`rk·10 ≤ n` ⟺ `rk ≤ K`), a value
    * group of `m` users contributes `clamp(K − cb, 0, m)` of its
    * members — identical totals to the user-grain rank for ANY
    * tie-break, with the one window running over distinct count
    * values (the e46/e38/r67 precedent).
    */
  val e23 = OpQuery.oracled("e23_pareto_concentration",
    """WITH uc AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1
      |), tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_users,
      |         CAST(sum(c) AS BIGINT) AS total_events
      |  FROM uc
      |), h AS (
      |  SELECT c, CAST(count(*) AS BIGINT) AS m FROM uc GROUP BY 1
      |), hb AS (
      |  SELECT c, m,
      |         CAST(coalesce(sum(m) OVER (ORDER BY c DESC
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |              0) AS BIGINT) AS cb
      |  FROM h
      |), take AS (
      |  SELECT c, least(greatest((n_users // 10) - cb, 0), m) AS k
      |  FROM hb CROSS JOIN tot
      |)
      |SELECT CAST(sum(k) AS BIGINT) AS n_top_users,
      |       CAST(sum(k * c) AS BIGINT) AS top_events,
      |       CAST(max(tot.total_events) AS BIGINT) AS total_events,
      |       CAST(sum(k * c) AS DOUBLE) / max(tot.total_events) AS top_share
      |FROM take CROSS JOIN tot""".stripMargin,
    doc = "top-10% user traffic share (Pareto skew diagnostic; histogram-grain integer rank cutoff over distinct per-user counts)") { (spark, dir) =>
    val uc = Sources.table(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    val tot = uc.agg(count(lit(1)).as("n_users"),
      sum(col("c")).as("total_events"))
    val wb = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val take = uc.groupBy("c").agg(count(lit(1)).cast("bigint").as("m"))
      .withColumn("cb", coalesce(sum("m").over(wb), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("k",
        least(greatest(expr("(n_users div 10) - cb"), lit(0L)), col("m")))
    take.agg(
        sum(col("k")).cast("bigint").as("n_top_users"),
        sum(col("k") * col("c")).cast("bigint").as("top_events"),
        max(col("total_events")).cast("bigint").as("total_events"),
        (sum(col("k") * col("c")).cast("double") / max(col("total_events")))
          .as("top_share"))
  }

  /** Event-grain lag features — each purchase row carrying its user's
    * previous three purchase amounts and the gap to the previous one:
    * the autoregressive feature matrix a sequence model consumes
    * directly, complementing e19 (session-relative) and e20 (user-
    * grain) features. One shuffle on user_id; the four lag windows
    * share a single (user, time) sort, so the plan is one Window node.
    * Missing history is -1, not NULL, to keep the sort keys and model
    * input dense.
    */
  val e24 = OpQuery.oracled("e24_purchase_lag_features",
    """WITH p AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT user_id, event_id, us, cents,
      |       CAST(coalesce(lag(cents, 1) OVER w, -1) AS BIGINT) AS cents_lag1,
      |       CAST(coalesce(lag(cents, 2) OVER w, -1) AS BIGINT) AS cents_lag2,
      |       CAST(coalesce(lag(cents, 3) OVER w, -1) AS BIGINT) AS cents_lag3,
      |       CAST(coalesce(us - lag(us, 1) OVER w, -1) AS BIGINT) AS gap1_us
      |FROM p
      |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |ORDER BY user_id, us, event_id""".stripMargin,
    doc = "per-purchase lag-3 amount + inter-purchase gap features (autoregressive model inputs; one shared window sort)") { (spark, dir) =>
    graft.api.Features.lagFeatures(
        Sources.table(spark, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            expr("ts DIV 1000").as("us"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        key = "user_id", order = Seq("us", "event_id"), value = "cents",
        lags = Seq(1, 2, 3))
      .orderBy("user_id", "us", "event_id")
  }

  /** Dense per-user daily activity grid — time-series gap filling: each
    * user's observed [first_day, last_day] range materialized with
    * zero-filled rows for silent days (the densification step before
    * any fixed-stride sequence model or moving-average feature). The
    * grid comes from a bounded `sequence` fan-out per user (range ≤ the
    * corpus's day span), and the count join is co-partitioned with the
    * grid on (user_id, day) — the grid generation itself never
    * shuffles beyond the per-user range frame.
    */
  val e25 = OpQuery.oracled("e25_daily_gap_fill",
    """WITH dc AS (
      |  SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2
      |), rng AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM dc GROUP BY 1
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM rng
      |)
      |SELECT g.user_id, g.day,
      |       CAST(coalesce(dc.n_events, 0) AS BIGINT) AS n_events,
      |       CAST(CASE WHEN dc.day IS NULL THEN 1 ELSE 0 END AS INT) AS was_missing
      |FROM grid g
      |LEFT JOIN dc ON dc.user_id = g.user_id AND dc.day = g.day
      |ORDER BY g.user_id, g.day""".stripMargin,
    doc = "per-user dense daily grid with zero-filled silent days (time-series densification before stride models)") { (spark, dir) =>
    graft.api.Features.denseGrid(
        Sources.table(spark, dir, "events")
          .select(col("user_id"), expr("ts DIV 86400000000000").as("day")),
        key = "user_id", unit = "day")
      .orderBy("user_id", "day")
  }

  /** Per-type z-score normalization of the value column — distributed
    * feature scaling. The group statistics are EXACT integer sums
    * (count, sum of cents, sum of squared cents), so the mean and the
    * population variance enter float land only in the final per-row
    * expression, whose op tree is mirrored token-for-token in the
    * oracle SQL — every float op is elementwise-deterministic given
    * identical inputs, which the integer sums guarantee. One broadcast
    * of the per-type stats back onto the stream; at trillion-row scale
    * the squared sums outgrow int64 and lift to DECIMAL(38,0) — same
    * plan, wider type.
    */
  val e26 = OpQuery.oracled("e26_zscore_normalization",
    """WITH v AS (
      |  SELECT event_id, event_type,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(cents) AS BIGINT) AS s1,
      |         CAST(sum(cents * cents) AS BIGINT) AS s2
      |  FROM v GROUP BY 1
      |)
      |SELECT v.event_id, v.event_type, v.cents,
      |       (CAST(v.cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n) /
      |         sqrt((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |              / (CAST(n AS DOUBLE) * n)) AS z
      |FROM v JOIN st USING (event_type)
      |ORDER BY event_id""".stripMargin,
    doc = "per-type z-score feature scaling (exact integer moment sums; float ops only in the mirrored final expression)") { (spark, dir) =>
    graft.api.Features.zscore(
        Sources.table(spark, dir, "events")
          .select(col("event_id"), col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")),
        group = "event_type", value = "cents")
      .select("event_id", "event_type", "cents", "z")
      .orderBy("event_id")
  }

  /** Multi-touch attribution assignment: for every purchase, the
    * count and time-bounds of the user's view touches in the trailing
    * 7 days — the table first-touch / last-touch / linear credit
    * models all read from (linear credit per touch is 1/n_touches,
    * left to the consumer so the stored assignment stays exact
    * integers). Complements e07's single as-of pick: attribution
    * needs EVERY touch in the window, not the latest one.
    *
    * The trailing window is a RANGE frame over the epoch-µs order key
    * — one shuffle on user_id, no self-join, no fan-out: the frame
    * machinery counts/min/maxes the in-range views per purchase row
    * directly. (A range join would re-shuffle both sides and fan out
    * per touch; the frame form is why this stays one pass at 100 TB.)
    * Zero-touch purchases are filtered (their bounds would be NULL —
    * nullable sort keys are banned by the determinism rules, and an
    * unattributed conversion has no row in an assignment table).
    */
  val e27 = OpQuery.oracled("e27_touch_attribution",
    """WITH base AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events
      |), framed AS (
      |  SELECT user_id, event_id, event_type, ts_us,
      |         count(CASE WHEN event_type = 'view' THEN 1 END)
      |           OVER w AS n_touches,
      |         min(CASE WHEN event_type = 'view' THEN ts_us END)
      |           OVER w AS first_touch_us,
      |         max(CASE WHEN event_type = 'view' THEN ts_us END)
      |           OVER w AS last_touch_us
      |  FROM base
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
      |               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, event_id, ts_us,
      |       CAST(n_touches AS BIGINT) AS n_touches,
      |       first_touch_us, last_touch_us
      |FROM framed
      |WHERE event_type = 'purchase' AND n_touches >= 1
      |ORDER BY user_id, ts_us, event_id""".stripMargin,
    doc = "multi-touch attribution assignment: per purchase, count + time bounds of trailing-7d view touches via one RANGE frame (no self-join, no fan-out)") { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-604800000000L, 0L)
    val isView = col("event_type") === "view"
    Sources.table(spark, dir, "events")
      .withColumn("ts_us", tsUs)
      // one select => one Window node (chained withColumn would insert
      // Projects between the three frames and defeat CollapseWindow)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"),
        count(when(isView, lit(1))).over(w).as("n_touches"),
        min(when(isView, col("ts_us"))).over(w).as("first_touch_us"),
        max(when(isView, col("ts_us"))).over(w).as("last_touch_us"))
      .filter(col("event_type") === "purchase" && col("n_touches") >= 1)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("n_touches").cast("bigint").as("n_touches"),
        col("first_touch_us"), col("last_touch_us"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Time-bounded event profile through `Sources.eventsBetween` — the
    * one registry query whose scan is pruned by an event-time range
    * predicate on the PHYSICAL ts column (PushedFilters + row-group
    * stats), not filtered above the normalization projection. At
    * 100 TB "profile last week" must read last week, not the store;
    * this keeps that path driver-oracled, not just spec-asserted.
    * Window: [2024-01-08, 2024-01-15) UTC, inside every SF's 30-day
    * January 2024 span.
    */
  val e29 = OpQuery.oracled("e29_time_pruned_profile",
    """SELECT event_type, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      |       CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
      |       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts <  TIMESTAMP '2024-01-15 00:00:00'
      |GROUP BY 1 ORDER BY event_type""".stripMargin,
    doc = "per-type profile of one week, scan-pruned via eventsBetween (physical-ts pushdown under the canonical event-time layer)") { (spark, dir) =>
    Sources.eventsBetween(spark, dir,
        1704672000000000000L, 1705276800000000000L)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"),
        expr("CAST(min(ts) div 1000 AS BIGINT)").as("first_us"),
        expr("CAST(max(ts) div 1000 AS BIGINT)").as("last_us"))
      .orderBy("event_type")
  }

  /** Scripted-traffic (bot) detection by inter-arrival regularity: a
    * human's event gaps are bursty, a cron job's are metronomic — the
    * squared coefficient of variation `cv² = Var(g)/E(g)²` of each
    * user's gap sequence separates them, and it reduces to EXACT
    * integer arithmetic: with n gaps in whole seconds,
    * `cv² = (n·Σg² − (Σg)²) / (Σg)²` — the products of the BIGINT sums
    * run in DECIMAL(38,0) (the momStd overflow class: a decade-long
    * metronomic user's (Σg)² passes 2^63, where Spark wraps silently
    * and DuckDB promotes/errors — exact decimal matches HUGEINT
    * bit-for-bit), then one final double division. Dropping the gap to
    * whole seconds first keeps the SUMS themselves in BIGINT. This is
    * the traffic-quality filter a training-data pipeline runs before
    * trusting engagement signals: one lag window + one aggregation,
    * both shuffled on user_id — nothing quadratic, nothing driver-side.
    */
  val e30 = OpQuery.oracled("e30_bot_regularity",
    """WITH g AS (
      |  SELECT user_id,
      |         (epoch_ns(ts) - epoch_ns(lag(ts) OVER (
      |            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000000 AS gap_s
      |  FROM events
      |), a AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |         CAST(sum(gap_s) AS BIGINT) AS s1,
      |         CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
      |  FROM g WHERE gap_s IS NOT NULL
      |  GROUP BY 1
      |  HAVING count(*) >= 5 AND CAST(sum(gap_s) AS BIGINT) > 0
      |)
      |SELECT user_id, n_gaps,
      |       CAST(s1 AS DOUBLE) / n_gaps AS mean_gap_s,
      |       CAST(CAST(n_gaps AS DECIMAL(38,0)) * s2
      |            - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
      |         / CAST(CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE) AS cv2,
      |       CAST(CASE WHEN CAST(CAST(n_gaps AS DECIMAL(38,0)) * s2
      |                           - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
      |                      / CAST(CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
      |                      < 0.25
      |            THEN 1 ELSE 0 END AS INT) AS scripted
      |FROM a ORDER BY user_id""".stripMargin,
    doc = "bot detection by inter-arrival regularity: per-user gap cv^2 from exact integer sums, one division; cv2 < 0.25 flags metronomic traffic") { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val a = Sources.table(spark, dir, "events")
      .select(col("user_id"),
        (col("ts") - lag(col("ts"), 1).over(w)).as("gap_ns"))
      .select(col("user_id"), expr("gap_ns DIV 1000000000").as("gap_s"))
      .filter(col("gap_s").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_gaps"),
        sum(col("gap_s")).cast("bigint").as("s1"),
        sum(col("gap_s") * col("gap_s")).cast("bigint").as("s2"))
      .filter(col("n_gaps") >= 5 && col("s1") > 0)
    // moment products in DECIMAL(38,0) — the momStd overflow class: a
    // decade-long metronomic user's Σgap² (and (Σgap)²) can pass 2^63,
    // where Spark wraps silently and DuckDB promotes
    val cv2 = (col("n_gaps").cast("decimal(38,0)") * col("s2")
      - col("s1").cast("decimal(38,0)") * col("s1")).cast("double") /
      (col("s1").cast("decimal(38,0)") * col("s1")).cast("double")
    a.select(col("user_id"), col("n_gaps"),
        (col("s1").cast("double") / col("n_gaps")).as("mean_gap_s"),
        cv2.as("cv2"),
        when(cv2 < 0.25, 1).otherwise(0).cast("int").as("scripted"))
      .orderBy("user_id")
  }

  /** Day-of-week × hour-of-day seasonality heatmap — the traffic-shape
    * profile that decides batch-window placement and staffing curves.
    * Both axes are INTEGER epoch arithmetic (epoch day 0 = a Thursday;
    * `(day + 4) % 7` relabels so 0 = Sunday), never calendar functions
    * — the recipe's timezone-proof bucketing, mirrored digit-for-digit
    * in the oracle. Counts are exact; each cell's share of total is
    * one division against a 1-row broadcast total.
    */
  val e31 = OpQuery.oracled("e31_seasonality_profile",
    """WITH g AS (
      |  SELECT ((epoch_ns(ts) // 1000 // 86400000000) + 4) % 7 AS dow,
      |         (epoch_ns(ts) // 1000 % 86400000000) // 3600000000 AS hour,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
      |       CAST(cnt AS BIGINT) AS cnt,
      |       CAST(cnt AS DOUBLE) / tot.n AS share
      |FROM g CROSS JOIN tot
      |ORDER BY dow, hour""".stripMargin,
    doc = "dow x hour seasonality heatmap in pure integer epoch arithmetic (0=Sunday via (day+4)%7); exact counts + one share division") { (spark, dir) =>
    val g = Sources.table(spark, dir, "events")
      .select(
        ((expr("ts div 1000 div 86400000000") + 4) % 7).as("dow"),
        expr("(ts div 1000 % 86400000000) div 3600000000").as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("cnt"))
    val tot = g.agg(sum(col("cnt")).cast("bigint").as("n"))
    g.crossJoin(broadcast(tot))
      .select(col("dow").cast("bigint").as("dow"),
        col("hour").cast("bigint").as("hour"),
        col("cnt").cast("bigint").as("cnt"),
        (col("cnt").cast("double") / col("n")).as("share"))
      .orderBy("dow", "hour")
  }

  /** First-order Markov next-event prediction accuracy — the e13
    * transition matrix USED as a model and scored in-sample: for each
    * observed transition, the prediction is the argmax next type given
    * the previous type (ties to the lexicographically first, pinned in
    * both engines), and accuracy is the hit fraction. This is the
    * eval-loop shape (train table → argmax policy → join back → score)
    * that grades any sequence model; with only a handful of event
    * types the matrix is a broadcast dimension and the tape join
    * shuffles once on the type key. Exact integer hit counts, one
    * division per row.
    */
  val e32 = OpQuery.oracled("e32_markov_next_event_accuracy",
    """WITH tape AS (
      |  SELECT event_type AS prev,
      |         lead(event_type) OVER (
      |           PARTITION BY user_id ORDER BY ts, event_id) AS next
      |  FROM events
      |), trans AS (
      |  SELECT prev, next, count(*) AS c FROM tape
      |  WHERE next IS NOT NULL GROUP BY 1, 2
      |), pred AS (
      |  SELECT prev, next AS predicted FROM (
      |    SELECT prev, next,
      |           row_number() OVER (PARTITION BY prev
      |                              ORDER BY c DESC, next) AS rn
      |    FROM trans) WHERE rn = 1
      |)
      |SELECT t.prev,
      |       CAST(count(*) AS BIGINT) AS n_transitions,
      |       CAST(sum(CASE WHEN t.next = p.predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      |       CAST(sum(CASE WHEN t.next = p.predicted THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*) AS accuracy
      |FROM tape t JOIN pred p ON p.prev = t.prev
      |WHERE t.next IS NOT NULL
      |GROUP BY 1 ORDER BY t.prev""".stripMargin,
    doc = "first-order Markov next-event accuracy: e13's transition matrix as an argmax policy joined back onto the tape; exact hit counts, one division") { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tape = Sources.table(spark, dir, "events")
      .select(col("event_type").as("prev"),
        lead(col("event_type"), 1).over(w).as("next"))
      .filter(col("next").isNotNull)
      .persist()
    val trans = tape.groupBy("prev", "next").agg(count(lit(1)).as("c"))
    val wp = Window.partitionBy("prev").orderBy(col("c").desc, col("next"))
    val pred = trans.withColumn("rn", row_number().over(wp))
      .filter(col("rn") === 1)
      .select(col("prev"), col("next").as("predicted"))
    tape.join(broadcast(pred), "prev")
      .groupBy("prev")
      .agg(
        count(lit(1)).cast("bigint").as("n_transitions"),
        sum(when(col("next") === col("predicted"), 1).otherwise(0))
          .cast("bigint").as("n_correct"),
        (sum(when(col("next") === col("predicted"), 1).otherwise(0))
          .cast("double") / count(lit(1))).as("accuracy"))
      .orderBy("prev")
  }

  /** Hourly event-rate change-point detection per type — one-sided
    * CUSUM over the hourly count series
    * ([[graft.api.Features.cusumDrift]]): the monitor a continuously
    * ingesting pipeline runs to catch a source going hot (scraper
    * loop, bot flood) or the upstream rate shifting. The recursive
    * CUSUM fold S_t = max(0, S_{t−1} + y_t) is computed closed-form
    * from a prefix sum and a running min (two window functions — the
    * oracle carries the identical identity), every intermediate is an
    * exact integer scaled by the per-type hour count, and floats
    * appear only in two mirrored expressions: the k·σ allowance
    * (k = 0.5, re-entering integer land through ceil) and the final
    * threshold compare against h·sqrt(n·s2 − s1²) (h = 4).
    */
  val e33 = OpQuery.oracled("e33_rate_change_points",
    """WITH hc AS (
      |  SELECT event_type,
      |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2
      |), st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(n_events) AS BIGINT) AS s1,
      |         CAST(sum(n_events * n_events) AS BIGINT) AS s2,
      |         CAST(ceil(0.5 * sqrt(CAST(
      |                  CAST(count(*) AS DECIMAL(38,0))
      |                    * sum(n_events * n_events)
      |                  - CAST(sum(n_events) AS DECIMAL(38,0))
      |                    * sum(n_events)
      |                  AS DOUBLE))) AS BIGINT) AS allow
      |  FROM hc GROUP BY 1
      |), ser AS (
      |  SELECT hc.event_type, hc.hour, hc.n_events, st.n, st.s1, st.s2,
      |         sum(st.n * hc.n_events - st.s1 - st.allow)
      |           OVER (PARTITION BY hc.event_type ORDER BY hc.hour
      |                 ROWS UNBOUNDED PRECEDING) AS p
      |  FROM hc JOIN st USING (event_type)
      |), cs AS (
      |  SELECT event_type, hour, n_events, n, s1, s2,
      |         p - least(0, min(p) OVER (PARTITION BY event_type
      |                                   ORDER BY hour
      |                                   ROWS UNBOUNDED PRECEDING))
      |           AS s_scaled
      |  FROM ser
      |)
      |SELECT event_type, hour, n_events,
      |       CAST(s_scaled AS BIGINT) AS s_scaled,
      |       CAST(CASE WHEN CAST(s_scaled AS DOUBLE) >
      |                      4.0 * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2
      |                                      - CAST(s1 AS DECIMAL(38,0)) * s1
      |                                      AS DOUBLE))
      |                 THEN 1 ELSE 0 END AS INT) AS drift
      |FROM cs ORDER BY event_type, hour""".stripMargin,
    doc = "per-type hourly-rate CUSUM change points (closed-form " +
      "prefix-sum/running-min fold in exact scaled integers; float " +
      "only in the mirrored threshold compare)") { (spark, dir) =>
    val hourly = Sources.table(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts DIV 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    graft.api.Features.cusumDrift(hourly, group = "event_type",
        time = "hour", value = "n_events", h = 4.0)
      .select(col("event_type"), col("hour"), col("n_events"),
        col("s_scaled"), col("drift"))
      .orderBy("event_type", "hour")
  }

  /** Seasonality strength as a forecast-error contest — the
    * model-selection diagnostic behind capacity planning: per event
    * type, the seasonal-naive forecast (this hour yesterday, lag 24 on
    * the dense hourly grid) versus the persistence forecast (the
    * previous hour, lag 1), scored by summed absolute error over the
    * same eligible hours. A ratio < 1 means daily seasonal structure
    * out-predicts short-term momentum — complements e31's shape
    * profile with an out-of-model accuracy statement (the same
    * relative-MAE construction as MASE, with persistence as the
    * scaling method so every quantity stays an exact integer).
    *
    * Scale shape: the hourly grid is types × hours — metadata-sized at
    * any corpus scale (10 years ≈ 88k hours) — so the gap-fill
    * cross-join, the per-type lag windows, and the final aggregate all
    * run on a frame dwarfed by the one shuffle that builds the hourly
    * counts from the raw events.
    */
  val e34 = OpQuery.oracled("e34_seasonal_strength",
    """WITH b AS (
      |  SELECT CAST(epoch_us(min(ts)) // 3600000000 AS BIGINT) AS h0,
      |         CAST(epoch_us(max(ts)) // 3600000000 AS BIGINT) AS h1
      |  FROM events
      |), ty AS (SELECT DISTINCT event_type FROM events
      |), grid AS (
      |  SELECT ty.event_type, unnest(generate_series(b.h0, b.h1)) AS hr
      |  FROM ty, b
      |), cnt AS (
      |  SELECT event_type,
      |         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), g AS (
      |  SELECT grid.event_type, grid.hr, coalesce(cnt.c, 0) AS c
      |  FROM grid LEFT JOIN cnt
      |    ON cnt.event_type = grid.event_type AND cnt.hr = grid.hr
      |), lagd AS (
      |  SELECT event_type, hr, c,
      |         lag(c, 1)  OVER w AS c1,
      |         lag(c, 24) OVER w AS c24
      |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY hr)
      |)
      |SELECT event_type,
      |       count(*) AS n_hours,
      |       CAST(sum(abs(c - c24)) AS BIGINT) AS sae_seasonal,
      |       CAST(sum(abs(c - c1)) AS BIGINT) AS sae_persistence,
      |       CASE WHEN sum(abs(c - c1)) > 0
      |         THEN CAST(sum(abs(c - c24)) AS DOUBLE) / sum(abs(c - c1))
      |         ELSE 0.0 END AS seasonal_strength
      |FROM lagd
      |WHERE hr >= (SELECT h0 FROM b) + 24
      |GROUP BY 1 ORDER BY event_type""".stripMargin,
    doc = "seasonal-naive vs persistence forecast error per type over the gap-filled hourly grid (exact integer SAEs, one mirrored ratio)") { (spark, dir) =>
    seasonalStrength(Sources.table(spark, dir, "events")
      .select(col("event_type"), expr("ts div 3600000000000").as("hr")))
  }

  /** e34's kernel over any (event_type, hr) frame — split out so the
    * spec can pin it on a hand-built series. See [[e34]].
    */
  private[graft] def seasonalStrength(
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bounds = ev.agg(min("hr").as("h0"), max("hr").as("h1"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val cnt = ev.groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
    val g = grid.join(cnt, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hr")
    g.select(col("event_type"), col("hr"), col("c"),
        lag(col("c"), 1).over(w).as("c1"),
        lag(col("c"), 24).over(w).as("c24"))
      .crossJoin(broadcast(bounds.select((col("h0") + 24).as("hmin"))))
      .filter(col("hr") >= col("hmin"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("c") - col("c24"))).as("sae_seasonal"),
        sum(abs(col("c") - col("c1"))).as("sae_persistence"))
      .select(col("event_type"), col("n_hours"),
        col("sae_seasonal").cast("bigint").as("sae_seasonal"),
        col("sae_persistence").cast("bigint").as("sae_persistence"),
        when(col("sae_persistence") > 0,
          col("sae_seasonal").cast("double") / col("sae_persistence"))
          .otherwise(lit(0.0)).as("seasonal_strength"))
      .orderBy("event_type")
  }

  /** A/B experiment readout with a DETERMINISTIC hash arm — the
    * analysis leg of an online experiment, computable identically by
    * any engine because the arm is a pure function of the user id
    * (same portable md5-nibble uniform the sampling operators use,
    * [[graft.api.Sampling.uniform32Sql]]) rather than a stored
    * assignment table. Exposure = a user's first view event;
    * conversion = any purchase in the 7 days after it (strictly
    * after, closed on the right). Output is one row of exact BIGINT
    * counts plus three mirrored fixed-order IEEE doubles: the two arm
    * conversion rates and the pooled two-proportion z statistic
    * (sqrt is correctly-rounded in both engines — the t29 Wilson-gate
    * precedent). Scale: two aggregates shuffled on user_id (first
    * view, then qualifying purchases); the z arithmetic runs on a
    * 1-row frame. Comparisons at epoch-µs per the event-time
    * discipline above.
    */
  private val abRateC = "(CAST(conv_control AS DOUBLE) / n_control)"
  private val abRateT = "(CAST(conv_treatment AS DOUBLE) / n_treatment)"
  private val abPool =
    "(CAST(conv_control + conv_treatment AS DOUBLE) / (n_control + n_treatment))"
  private val abZ =
    s"(($abRateT) - ($abRateC)) / sqrt((($abPool) * (CAST(1 AS DOUBLE) - ($abPool)))" +
      " * ((CAST(1 AS DOUBLE) / n_control) + (CAST(1 AS DOUBLE) / n_treatment)))"
  private[ops] val abArmSql =
    s"(${graft.api.Sampling.uniform32Sql("user_id")} % 2)"

  /** The arm-conditional aggregation + mirrored rate/z tail of the A/B
    * readout, over a per-exposed-user frame `(arm int, conv long)` —
    * shared by the batch operator (e35) and the streaming state-fold
    * twin (qs19), so "streamed state equals the batch answer" is
    * pinned through literally the same readout code.
    */
  private[ops] def abReadout(perUser: DataFrame): DataFrame =
    perUser
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_control"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).cast("bigint")
          .as("conv_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_treatment"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).cast("bigint")
          .as("conv_treatment"))
      .withColumn("rate_control", expr(abRateC))
      .withColumn("rate_treatment", expr(abRateT))
      .withColumn("z_score", expr(abZ))

  /** The full e35 oracle — also qs19's oracle VERBATIM (the streaming
    * fold must land on the batch answer).
    */
  private[ops] val abOracleSql: String = {
    // same arm expression, key qualified for the oracle's two-table FROM
    val armSqlV = s"(${graft.api.Sampling.uniform32Sql("v.user_id")} % 2)"
    s"""WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), conv AS (
        |  SELECT DISTINCT e.user_id
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) > v.v_us
        |    AND epoch_us(e.ts) <= v.v_us + 604800000000
        |), per AS (
        |  SELECT CAST($armSqlV AS INT) AS arm,
        |         CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
        |  FROM v LEFT JOIN conv c ON c.user_id = v.user_id
        |), agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_control,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_treatment
        |  FROM per
        |)
        |SELECT n_control, conv_control, n_treatment, conv_treatment,
        |       $abRateC AS rate_control,
        |       $abRateT AS rate_treatment,
        |       $abZ AS z_score
        |FROM agg""".stripMargin
  }

  val e35 = OpQuery.oracled("e35_ab_experiment_readout", abOracleSql,
    doc = "A/B experiment readout: portable hash-armed split, first-view exposure, 7-day conversion window, pooled two-proportion z from exact integer counts") { (spark, dir) =>
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("us") > col("v_us") &&
        col("us") <= col("v_us") + lit(604800000000L))
      .select("user_id").distinct()
      .withColumn("cv", lit(1L))
    abReadout(
      v.join(conv, Seq("user_id"), "left")
        .select(expr(abArmSql).cast("int").as("arm"),
          coalesce(col("cv"), lit(0L)).as("conv")))
  }

  /** Discrete-time churn LIFE TABLE
    * ([[graft.api.Features.hazardLifeTable]], weekly periods): per
    * weeks-since-first-event, the users still at risk, the users whose
    * last event lands there (churned — unless within a week of the
    * corpus end, which is CENSORING: "quiet so far", not "gone"), and
    * the per-week hazard in exact ppm. The survival curve itself is a
    * cumulative product — not integer-exact — so the engine ships the
    * life table (each hazard is ONE division) and the curve is a
    * client-side fold; the same split as t40's log-free power-law
    * profile. Complements e09's cohort retention: retention asks "who
    * came back in week k", the hazard asks "given you survived to week
    * k, what's the chance week k is your last".
    */
  val e36 = OpQuery.oracled("e36_churn_hazard_table",
    """WITH life AS (
      |  SELECT user_id, min(epoch_us(ts)) AS first_us,
      |         max(epoch_us(ts)) AS last_us
      |  FROM events GROUP BY 1
      |), fin AS (
      |  SELECT max(epoch_us(ts)) AS end_us FROM events
      |), pu AS (
      |  SELECT (last_us - first_us) // 604800000000 AS k,
      |         (end_us - last_us) < 604800000000 AS censored
      |  FROM life, fin
      |), pp AS (
      |  SELECT k, count(*) AS n_ended,
      |         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS n_churned,
      |         sum(CASE WHEN censored THEN 1 ELSE 0 END) AS n_censored
      |  FROM pu GROUP BY 1
      |), axis AS (
      |  SELECT unnest(generate_series(0, (SELECT max(k) FROM pp))) AS k
      |), f AS (
      |  SELECT axis.k, coalesce(pp.n_ended, 0) AS n_ended,
      |         coalesce(pp.n_churned, 0) AS n_churned,
      |         coalesce(pp.n_censored, 0) AS n_censored
      |  FROM axis LEFT JOIN pp ON pp.k = axis.k
      |), ar AS (
      |  SELECT k, n_churned, n_censored,
      |         sum(n_ended) OVER (ORDER BY k DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
      |  FROM f
      |)
      |SELECT CAST(k AS BIGINT) AS period,
      |       CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |       CAST(n_churned AS BIGINT) AS n_churned,
      |       CAST(n_censored AS BIGINT) AS n_censored,
      |       CAST((n_churned * 1000000) // n_at_risk AS BIGINT) AS hazard_ppm
      |FROM ar ORDER BY period""".stripMargin,
    doc = "discrete-time churn life table: weekly at-risk/churned/censored counts + exact-ppm hazard (survival curve = client-side fold of the hazards)") { (spark, dir) =>
    graft.api.Features.hazardLifeTable(
        Sources.table(spark, dir, "events")
          .select(col("user_id"), tsUs.as("us")),
        "user_id", "us", periodUs = 604800000000L)
      .orderBy("period")
  }

  /** L28-style ENGAGEMENT-DEPTH CURVE (the "power-user curve"): per
    * aligned 28-day window, the histogram of users by how many distinct
    * days they were active, with a suffix cumulative count ("users
    * active on ≥ d days" — the curve product teams read right-to-left)
    * and each bar's share of the window's actives in exact ppm. The
    * shape of this histogram — smile vs slope — is the standard
    * engagement-depth diagnostic that single-ratio metrics like e28's
    * DAU/WAU stickiness compress away, and it complements e09 (cohort
    * retention: who came BACK) and e21 (rolling actives: how MANY) with
    * the missing axis: how DEEPLY each active user engaged.
    *
    * Determinism/scale: the window key and day are pure integer epoch
    * arithmetic (`us // 86400000000 // 28` — the e31 timezone-proof
    * bucketing); the per-(window, user) distinct-day count is one
    * two-phase aggregate shuffled on (win, user_id); the histogram is a
    * second aggregate at (win, active_days) grain — at most 28 rows per
    * window FOREVER, so the suffix-sum window function runs on the
    * bounded histogram, never on user-grain rows (the e36 at-risk
    * pattern). Shares are exact floor-ppm: `n · 10⁶ // win_users`, no
    * doubles anywhere in the output.
    */
  /** e37 kernel on a (day, user_id) frame — factored for the hand
    * fixture in FeaturesSpec; see [[e37]] for the full contract.
    */
  def engagementDepthCurve(d: DataFrame): DataFrame = {
    val ua = d
      .groupBy(expr("day div 28").as("win"), col("user_id"))
      .agg(countDistinct(col("day")).as("active_days"))
    val hist = ua.groupBy("win", "active_days")
      .agg(count(lit(1)).as("n_users"))
    val wSuf = Window.partitionBy("win").orderBy(col("active_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("win")
    hist
      .withColumn("n_at_least", sum("n_users").over(wSuf))
      .withColumn("win_users", sum("n_users").over(wTot))
      .select(col("win").cast("bigint").as("win"),
        col("active_days").cast("bigint").as("active_days"),
        col("n_users").cast("bigint").as("n_users"),
        col("n_at_least").cast("bigint").as("n_users_at_least"),
        expr("(n_users * 1000000) div win_users").cast("bigint")
          .as("share_ppm"))
      .orderBy("win", "active_days")
  }

  val e37 = OpQuery.oracled("e37_engagement_depth_curve",
    """WITH d AS (
      |  SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day, user_id
      |  FROM events
      |), ua AS (
      |  SELECT day // 28 AS win, user_id,
      |         count(DISTINCT day) AS active_days
      |  FROM d GROUP BY 1, 2
      |), hist AS (
      |  SELECT win, active_days, count(*) AS n_users
      |  FROM ua GROUP BY 1, 2
      |), c AS (
      |  SELECT win, active_days, n_users,
      |         sum(n_users) OVER (PARTITION BY win ORDER BY active_days DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS n_at_least,
      |         sum(n_users) OVER (PARTITION BY win) AS win_users
      |  FROM hist
      |)
      |SELECT CAST(win AS BIGINT) AS win,
      |       CAST(active_days AS BIGINT) AS active_days,
      |       CAST(n_users AS BIGINT) AS n_users,
      |       CAST(n_at_least AS BIGINT) AS n_users_at_least,
      |       CAST((n_users * 1000000) // win_users AS BIGINT) AS share_ppm
      |FROM c ORDER BY win, active_days""".stripMargin,
    doc = "engagement-depth (L28) curve: per 28-day window, users bucketed by distinct active days, suffix 'at least d days' counts + exact-ppm shares; windows run on the <=28-row histogram, not user grain") { (spark, dir) =>
    engagementDepthCurve(
      Sources.table(spark, dir, "events")
        .select(expr("(ts div 1000) div 86400000000").as("day"),
          col("user_id")))
  }

  /** e38 kernel on an (event_type, c) frame (one row per user) — the
    * HISTOGRAM form of the Gini sum: group users by their count value,
    * then `S = Σ_v v·(2·C_v·m_v + m_v²)` where `m_v` is the number of
    * users at value v and `C_v` the users strictly below — algebraically
    * identical to the textbook `Σ(2i−n−1)x_(i)` over sorted users
    * (a tie block's Σ(2i−1) is order-free), but the rank window runs on
    * the DISTINCT-VALUE histogram, never on user grain — no single
    * reducer ever sorts a type's full user list. Factored for the hand
    * fixture in FeaturesSpec.
    */
  def giniConcentration(uc: DataFrame): DataFrame = {
    val h = uc.groupBy("event_type", "c")
      .agg(count(lit(1)).cast("bigint").as("m"))
    val wb = Window.partitionBy("event_type").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val k = h.withColumn("cb",
      coalesce(sum("m").over(wb), lit(0L)).cast("bigint"))
    k.groupBy("event_type")
      .agg(sum("m").cast("bigint").as("n_users"),
        sum(col("c") * col("m")).cast("bigint").as("total_events"),
        sum(col("c") * (lit(2L) * col("cb") * col("m")
          + col("m") * col("m"))).cast("bigint").as("s"))
      .select(col("event_type"), col("n_users"), col("total_events"),
        (col("s") - col("n_users") * col("total_events")).cast("bigint")
          .as("gini_num"),
        ((col("s") - col("n_users") * col("total_events")).cast("double")
          / (col("n_users") * col("total_events"))).as("gini"))
      .orderBy("event_type")
  }

  /** Per-type GINI COEFFICIENT of user activity — the full-distribution
    * inequality statistic complementing e23's single top-10% share: 0 =
    * every active user contributes equally, →1 = one user is the whole
    * stream (computed over OBSERVED users; silent users carry no rows,
    * which is the honest frame for traffic concentration). Exact by
    * construction: the numerator `Σ(2i−n−1)·c` is pure BIGINT
    * arithmetic folded on the count-value histogram (see
    * [[giniConcentration]] — no user-grain sort, so a 10⁹-user type
    * never lands on one reducer), and the coefficient is ONE final IEEE
    * division, bit-identical in both engines.
    */
  val e38 = OpQuery.oracled("e38_gini_concentration",
    """WITH uc AS (
      |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), h AS (
      |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS m
      |  FROM uc GROUP BY 1, 2
      |), k AS (
      |  SELECT event_type, c, m,
      |         CAST(coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY c
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS cb
      |  FROM h
      |), t AS (
      |  SELECT event_type, CAST(sum(m) AS BIGINT) AS n_users,
      |         CAST(sum(c * m) AS BIGINT) AS total_events,
      |         CAST(sum(c * (2 * cb * m + m * m)) AS BIGINT) AS s
      |  FROM k GROUP BY 1
      |)
      |SELECT event_type, n_users, total_events,
      |       CAST(s - n_users * total_events AS BIGINT) AS gini_num,
      |       CAST(s - n_users * total_events AS DOUBLE)
      |         / (n_users * total_events) AS gini
      |FROM t ORDER BY event_type""".stripMargin,
    doc = "per-type Gini coefficient of user activity: exact BIGINT numerator folded on the count-value histogram (no user-grain sort), one final division — the full-distribution skew statistic next to e23's top-share") { (spark, dir) =>
    giniConcentration(
      Sources.table(spark, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).cast("bigint").as("c"))
        .select("event_type", "c"))
  }

  // e39's pre/post boundary: 2024-01-08 in epoch microseconds — week 1
  // is the covariate window, the rest of the fixture the outcome window
  private val cupedBoundaryUs = 1704672000000000L

  /** CUPED-ADJUSTED A/B readout (Deng et al., WSDM 2013) — the
    * variance-reduction companion to e35's plain two-proportion
    * readout: each user's PRE-experiment activity (week-1 click count
    * `x`) explains away part of the outcome noise, so the adjusted
    * per-arm rate `ȳ_a − θ·(x̄_a − x̄)` detects smaller effects with
    * the same sample. θ is the pooled OLS slope
    * `(N·Σxy − Σx·Σy) / (N·Σx² − (Σx)²)` — every operand an exact
    * BIGINT of counts (x is a count, y a 0/1 flag), ONE division; the
    * adjusted rate is one mirrored fixed-order IEEE chain (the e35 z
    * precedent: sub/mul/div on identical exact-integer inputs is
    * bit-stable cross-engine). Arms are the e35 md5 hash of user_id —
    * a pure function, so pre-period data cannot leak arm assignment.
    *
    * Scale shape: ONE per-user aggregate shuffled on user_id builds
    * (arm, x, y); the pooled moments are a second aggregate to ONE
    * row, broadcast back; the readout is an arm-grain aggregate.
    * Nothing user-grain survives past the first shuffle.
    */
  val e39 = OpQuery.oracled("e39_cuped_adjusted_readout",
    s"""WITH u AS (
      |  SELECT user_id, CAST($abArmSql AS INT) AS arm,
      |         CAST(sum(CASE WHEN event_type = 'click'
      |                   AND epoch_us(ts) < $cupedBoundaryUs
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |         CAST(max(CASE WHEN event_type = 'purchase'
      |                   AND epoch_us(ts) >= $cupedBoundaryUs
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), th AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nn,
      |         CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(CAST(count(*) AS DECIMAL(38,0)) * CAST(sum(x * y) AS BIGINT)
      |              - CAST(sum(x) AS DECIMAL(38,0)) * CAST(sum(y) AS BIGINT)
      |              AS DOUBLE)
      |           / CAST(CAST(count(*) AS DECIMAL(38,0)) * CAST(sum(x * x) AS BIGINT)
      |                  - CAST(sum(x) AS DECIMAL(38,0)) * CAST(sum(x) AS BIGINT)
      |                  AS DOUBLE) AS theta
      |  FROM u
      |)
      |SELECT u.arm,
      |       CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(u.x) AS BIGINT) AS pre_clicks,
      |       CAST(sum(u.y) AS BIGINT) AS conv,
      |       CAST(sum(u.y) AS DOUBLE) / count(*) AS raw_rate,
      |       max(th.theta) AS theta,
      |       CAST(sum(u.y) AS DOUBLE) / count(*)
      |         - max(th.theta) * (CAST(sum(u.x) AS DOUBLE) / count(*)
      |                            - CAST(max(th.sx) AS DOUBLE) / max(th.nn))
      |         AS adj_rate
      |FROM u CROSS JOIN th
      |GROUP BY u.arm ORDER BY arm""".stripMargin,
    doc = "CUPED variance-reduced A/B readout: pooled OLS slope over exact BIGINT moments (one division), per-arm adjusted rate as one mirrored IEEE chain — detects smaller effects than e35's raw rates at the same sample") { (spark, dir) =>
    cupedReadout(
      Sources.table(spark, dir, "events")
        .groupBy(col("user_id"), expr(abArmSql).cast("int").as("arm"))
        .agg(
          sum(when(col("event_type") === "click" &&
            tsUs < cupedBoundaryUs, 1L).otherwise(0L)).cast("bigint")
            .as("x"),
          max(when(col("event_type") === "purchase" &&
            tsUs >= cupedBoundaryUs, 1L).otherwise(0L)).cast("bigint")
            .as("y")))
  }

  /** e39 kernel on an (arm, x, y) per-user frame — factored for the
    * hand fixture in FeaturesSpec; see [[e39]] for the full contract.
    */
  def cupedReadout(u: DataFrame): DataFrame = {
    val th = u.agg(
        count(lit(1)).cast("bigint").as("nn"),
        sum("x").cast("bigint").as("sx"),
        sum(col("x") * col("y")).cast("bigint").as("sxy"),
        sum(col("y")).cast("bigint").as("sy"),
        sum(col("x") * col("x")).cast("bigint").as("sxx"))
      // moment products in DECIMAL(38,0) — the r14-ADVICE momStd
      // overflow class: BIGINT wraps silently in Spark while DuckDB
      // promotes, so the slope would diverge at large totals
      .select(col("nn"), col("sx"),
        ((col("nn").cast("decimal(38,0)") * col("sxy")
          - col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
          (col("nn").cast("decimal(38,0)") * col("sxx")
            - col("sx").cast("decimal(38,0)") * col("sx")).cast("double"))
          .as("theta"))
    u.crossJoin(broadcast(th))
      .groupBy("arm")
      .agg(
        count(lit(1)).cast("bigint").as("n_users"),
        sum("x").cast("bigint").as("pre_clicks"),
        sum("y").cast("bigint").as("conv"),
        (sum("y").cast("double") / count(lit(1))).as("raw_rate"),
        max("theta").as("theta"),
        (sum("y").cast("double") / count(lit(1))
          - max("theta") * (sum("x").cast("double") / count(lit(1))
            - max("sx").cast("double") / max("nn"))).as("adj_rate"))
      .orderBy("arm")
  }

  // e40's mirrored IEEE tail over the six exact counts: the four cell
  // rates and the difference-in-differences estimate, each a fixed
  // expression tree of correctly-rounded ops (the e35/e39 doctrine).
  private val didPreC = "(CAST(pre_control AS DOUBLE) / n_control)"
  private val didPostC = "(CAST(post_control AS DOUBLE) / n_control)"
  private val didPreT = "(CAST(pre_treatment AS DOUBLE) / n_treatment)"
  private val didPostT = "(CAST(post_treatment AS DOUBLE) / n_treatment)"
  private val didEst =
    s"((($didPostT) - ($didPreT)) - (($didPostC) - ($didPreC)))"

  /** e40 kernel over a per-user frame `(arm int, pre_n long,
    * post_n long)` — the 2×2 cell counts + mirrored IEEE rate/DiD
    * tail, factored for the hand fixture in FeaturesSpec.
    */
  def didReadout(perUser: DataFrame): DataFrame =
    perUser
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_control"),
        sum(when(col("arm") === 0, col("pre_n")).otherwise(0L))
          .cast("bigint").as("pre_control"),
        sum(when(col("arm") === 0, col("post_n")).otherwise(0L))
          .cast("bigint").as("post_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_treatment"),
        sum(when(col("arm") === 1, col("pre_n")).otherwise(0L))
          .cast("bigint").as("pre_treatment"),
        sum(when(col("arm") === 1, col("post_n")).otherwise(0L))
          .cast("bigint").as("post_treatment"))
      .withColumn("rate_pre_control", expr(didPreC))
      .withColumn("rate_post_control", expr(didPostC))
      .withColumn("rate_pre_treatment", expr(didPreT))
      .withColumn("rate_post_treatment", expr(didPostT))
      .withColumn("did_estimate", expr(didEst))

  /** DIFFERENCE-IN-DIFFERENCES readout — the quasi-experimental
    * companion to e35 (randomized z) and e39 (CUPED variance
    * reduction): per-user purchase counts in the pre and post halves
    * of the observation window, a fixed user panel (every user with
    * any event, zero-filled by conditional sums — no join), arms from
    * the same portable md5 uniform as e35 so assignment is a pure
    * function of user_id. The DiD estimate
    * `(post_T − pre_T) − (post_C − pre_C)` (per-user means) removes
    * any arm-constant level difference and any period shock common to
    * both arms. The period cut is data-derived and deterministic: the
    * midpoint of the observed day range, `(min_day + max_day + 1) div
    * 2`, computed once and broadcast. Output is one row of six exact
    * BIGINT panel counts plus five mirrored fixed-order IEEE doubles.
    *
    * Scale shape: one aggregate shuffled on user_id (the panel), a
    * 1-row bound frame broadcast into it, then a 1-row readout — no
    * step holds more than the user-grain frame.
    */
  val e40 = OpQuery.oracled("e40_did_readout", {
    val armSql = s"(${graft.api.Sampling.uniform32Sql("user_id")} % 2)"
    s"""WITH d AS (
      |  SELECT user_id, event_type,
      |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |  FROM events
      |), b AS (
      |  SELECT CAST((min(day) + max(day) + 1) // 2 AS BIGINT) AS cut FROM d
      |), per AS (
      |  SELECT CAST($armSql AS INT) AS arm,
      |         CAST(sum(CASE WHEN event_type = 'purchase'
      |                        AND day < (SELECT cut FROM b)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
      |         CAST(sum(CASE WHEN event_type = 'purchase'
      |                        AND day >= (SELECT cut FROM b)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS post_n
      |  FROM d GROUP BY user_id
      |), agg AS (
      |  SELECT
      |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_control,
      |    CAST(sum(CASE WHEN arm = 0 THEN pre_n ELSE 0 END) AS BIGINT)
      |      AS pre_control,
      |    CAST(sum(CASE WHEN arm = 0 THEN post_n ELSE 0 END) AS BIGINT)
      |      AS post_control,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_treatment,
      |    CAST(sum(CASE WHEN arm = 1 THEN pre_n ELSE 0 END) AS BIGINT)
      |      AS pre_treatment,
      |    CAST(sum(CASE WHEN arm = 1 THEN post_n ELSE 0 END) AS BIGINT)
      |      AS post_treatment
      |  FROM per
      |)
      |SELECT n_control, pre_control, post_control,
      |       n_treatment, pre_treatment, post_treatment,
      |       $didPreC AS rate_pre_control,
      |       $didPostC AS rate_post_control,
      |       $didPreT AS rate_pre_treatment,
      |       $didPostT AS rate_post_treatment,
      |       $didEst AS did_estimate
      |FROM agg""".stripMargin
  },
    doc = "difference-in-differences readout: hash-armed fixed user panel, data-derived midpoint period cut, per-arm pre/post purchase counts + mirrored IEEE rates and DiD estimate") { (spark, dir) =>
    val d = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 86400000000000").as("day"))
    val cut = d.agg(
      expr("CAST((min(day) + max(day) + 1) div 2 AS BIGINT)").as("cut"))
    didReadout(
      d.crossJoin(broadcast(cut))
        .groupBy("user_id", "cut")
        .agg(
          sum(when(col("event_type") === "purchase" &&
            col("day") < col("cut"), 1L).otherwise(0L))
            .cast("bigint").as("pre_n"),
          sum(when(col("event_type") === "purchase" &&
            col("day") >= col("cut"), 1L).otherwise(0L))
            .cast("bigint").as("post_n"))
        .select(expr(abArmSql).cast("int").as("arm"),
          col("pre_n"), col("post_n")))
  }

  // e41's mirrored IEEE tail: Pearson r from the five exact BIGINT
  // moments — numerator/variances in DECIMAL(38,0) first (exact; in
  // plain BIGINT Spark silently wraps on overflow while DuckDB
  // promotes, so large per-key totals would diverge — r14 ADVICE),
  // then one fixed-order chain of correctly-rounded double ops.
  private val corrNum =
    "(CAST(n_days AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
  private val corrVx =
    "(CAST(n_days AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
  private val corrVy =
    "(CAST(n_days AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy)"
  // constant series have no defined correlation: NULL explicitly on
  // both sides (engines differ on double x/0 — NULL vs Infinity)
  private val corrR =
    s"(CASE WHEN $corrVx = 0 OR $corrVy = 0 THEN NULL " +
      s"ELSE CAST($corrNum AS DOUBLE) / (sqrt(CAST($corrVx AS DOUBLE)) * sqrt(CAST($corrVy AS DOUBLE))) END)"

  /** e41 kernel over a zero-filled (day, event_type, c) grid —
    * factored for the hand fixture in FeaturesSpec.
    */
  def metricCorrelation(grid: DataFrame): DataFrame = {
    val a = grid.select(col("day"), col("event_type").as("type_a"),
      col("c").as("x"))
    val b = grid.select(col("day"), col("event_type").as("type_b"),
      col("c").as("y"))
    a.join(b, "day").filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum("x").cast("bigint").as("sx"),
        sum("y").cast("bigint").as("sy"),
        sum(col("x") * col("y")).cast("bigint").as("sxy"),
        sum(col("x") * col("x")).cast("bigint").as("sxx"),
        sum(col("y") * col("y")).cast("bigint").as("syy"))
      .select(col("type_a"), col("type_b"), col("n_days"),
        expr(corrR).as("pearson_r"))
      .orderBy("type_a", "type_b")
  }

  /** METRIC CORRELATION MATRIX — exact Pearson correlation between
    * every pair of event types' daily-count series: the "which metrics
    * move together" table behind anomaly triage (a drop in `click`
    * that `view` does not share is a client bug, one they share is
    * traffic). Series are the per-(day, type) counts on the DENSE day
    * grid (distinct observed days × observed types, absent cells
    * zero-filled — a missing day IS a zero, and dropping it would bias
    * r toward busy days). All five moments are exact BIGINTs; r is one
    * mirrored fixed-order IEEE chain per pair (sqrt is
    * correctly-rounded — the e35 doctrine). At 100-TB daily volumes
    * the moment registers widen to DECIMAL(38,0); the shape is
    * unchanged.
    *
    * Scale shape: the count aggregate shuffles raw events once on
    * (day, type); everything after runs at day grain (the compressed
    * grain, e23's precedent) — the pair fan-out is T² per day, bounded
    * by the metric catalog, never by traffic.
    */
  val e41 = OpQuery.oracled("e41_metric_correlation",
    s"""WITH d AS (
      |  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |         event_type
      |  FROM events
      |), c AS (
      |  SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM d GROUP BY 1, 2
      |), grid AS (
      |  SELECT dd.day, tt.event_type, coalesce(c.c, 0) AS c
      |  FROM (SELECT DISTINCT day FROM d) dd
      |  CROSS JOIN (SELECT DISTINCT event_type FROM d) tt
      |  LEFT JOIN c ON c.day = dd.day AND c.event_type = tt.event_type
      |), m AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         CAST(count(*) AS BIGINT) AS n_days,
      |         CAST(sum(a.c) AS BIGINT) AS sx,
      |         CAST(sum(b.c) AS BIGINT) AS sy,
      |         CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
      |         CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
      |         CAST(sum(b.c * b.c) AS BIGINT) AS syy
      |  FROM grid a JOIN grid b ON b.day = a.day
      |  WHERE a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT type_a, type_b, n_days, $corrR AS pearson_r
      |FROM m ORDER BY type_a, type_b""".stripMargin,
    doc = "pairwise Pearson correlation of per-type daily count series on the dense zero-filled day grid: exact BIGINT moments, one mirrored IEEE chain per pair; day-grain after one raw shuffle") { (spark, dir) =>
    val d = Sources.table(spark, dir, "events")
      .select(expr("ts DIV 86400000000000").as("day"), col("event_type"))
    val counts = d.groupBy("day", "event_type")
      .agg(count(lit(1)).cast("bigint").as("c"))
    // eager localCheckpoint (the g21/s24 lesson): the grid feeds BOTH
    // sides of the pair self-join — on raw lineage each side would
    // re-scan events three times (counts + the two distincts)
    val grid = d.select("day").distinct()
      .crossJoin(broadcast(d.select("event_type").distinct()))
      .join(counts, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("c"))
      .cutLineage
    metricCorrelation(grid)
  }

  /** SEASONAL ANOMALY FLAGS — e31's hour-of-week seasonality and
    * e15's median+MAD robustness composed into the dashboard alert
    * rule: per event type, the dense hourly count grid (absent hours
    * ARE zeros — e34's gap-fill doctrine; dropping them would teach
    * the baseline that quiet hours never happen), each hour compared
    * to its (dow, hour-of-day) slot's median across weeks, flagged
    * when the deviation exceeds 3·MAD AND an absolute floor of 5
    * events (the floor keeps a sparse slot with MAD 0 from flagging
    * every nonzero hour — the standard robust-alert hurdle). Medians
    * and MADs are exact percentiles of integers (halves exactly
    * representable — the e15 doctrine), so the whole surface is
    * bit-stable; the full grid is emitted with the flag AS DATA, so
    * the oracle re-proves baseline, deviation and rule on every row.
    *
    * Scale shape: counts shuffle raw events once on (type, hour); the
    * grid, slot medians and flags all run at hour grain (bounded by
    * time span × metric count, never by traffic).
    */
  val e42 = OpQuery.oracled("e42_seasonal_anomaly_flags",
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 1000 // 3600000000 AS hr,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), span AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
      |grid AS (
      |  SELECT t.event_type, g.hr, coalesce(h.c, 0) AS c
      |  FROM (SELECT DISTINCT event_type FROM h) t
      |  CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM span),
      |                                            (SELECT hi FROM span)))
      |                AS hr) g
      |  LEFT JOIN h ON h.event_type = t.event_type AND h.hr = g.hr
      |), slot AS (
      |  SELECT event_type, hr, c,
      |         ((hr // 24) + 4) % 7 AS dow, hr % 24 AS hod
      |  FROM grid
      |), med AS (
      |  SELECT event_type, dow, hod, quantile_cont(c, 0.5) AS med
      |  FROM slot GROUP BY 1, 2, 3
      |), dev AS (
      |  SELECT s.event_type, s.hr, s.c, s.dow, s.hod, m.med,
      |         abs(s.c - m.med) AS adev
      |  FROM slot s JOIN med m ON m.event_type = s.event_type
      |    AND m.dow = s.dow AND m.hod = s.hod
      |), mad AS (
      |  SELECT event_type, dow, hod, quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY 1, 2, 3
      |)
      |SELECT d.event_type, CAST(d.hr AS BIGINT) AS hr, d.c,
      |       d.med, m.mad,
      |       CAST(CASE WHEN d.adev > 3 * m.mad AND d.adev >= 5
      |                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
      |FROM dev d JOIN mad m ON m.event_type = d.event_type
      |  AND m.dow = d.dow AND m.hod = d.hod
      |ORDER BY d.event_type, d.hr""".stripMargin,
    doc = "hour-of-week robust anomaly flags: dense zero-filled hourly grid, per-slot median + MAD baseline across weeks, 3*MAD + absolute-floor rule emitted as data on every grid row") { (spark, dir) =>
    val h = Sources.table(spark, dir, "events")
      .select(expr("ts div 3600000000000").as("hr"), col("event_type"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).cast("bigint").as("c"))
    val span = h.agg(min("hr").as("lo"), max("hr").as("hi"))
    // eager localCheckpoint: the dense grid feeds the median pass, the
    // deviation join and the final flag join — raw lineage would
    // re-scan events once per consumer (the g21/s24 lesson)
    val grid = h.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("hr"))
      .join(h, Seq("event_type", "hr"), "left")
      .na.fill(0L, Seq("c"))
      .cutLineage
    seasonalAnomalyFlags(grid)
  }

  /** e42 kernel on a dense (event_type, hr, c) hourly grid — factored
    * for the hand fixture in FeaturesSpec; see [[e42]].
    */
  def seasonalAnomalyFlags(grid: DataFrame): DataFrame = {
    val slotted = grid
      .withColumn("dow", expr("(hr div 24 + 4) % 7"))
      .withColumn("hod", col("hr") % 24)
    val wSlot = Seq("event_type", "dow", "hod").map(col)
    val med = slotted.groupBy(wSlot: _*)
      .agg(percentile(col("c"), lit(0.5)).as("med"))
    // checkpointed for the same reason: dev feeds both the MAD pass
    // and the final flag join
    val dev = slotted.join(med, Seq("event_type", "dow", "hod"))
      .withColumn("adev", abs(col("c") - col("med")))
      .cutLineage
    val mad = dev.groupBy(wSlot: _*)
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(mad, Seq("event_type", "dow", "hod"))
      .select(col("event_type"), col("hr").cast("bigint").as("hr"),
        col("c"), col("med"), col("mad"),
        when(col("adev") > lit(3) * col("mad") && col("adev") >= 5, 1)
          .otherwise(0).cast("int").as("is_anomaly"))
      .orderBy("event_type", "hr")
  }

  /** COHORT LTV CURVE — e09's retention triangle with the revenue
    * axis: users grouped by FIRST-EVENT week (the signup cohort),
    * each cohort's purchase value per weeks-since-cohort in exact
    * integer cents, zero-filled through the cohort's observable k
    * range (a quiet week is a 0, and the cumulative curve needs it),
    * cumulated over k, and normalized to exact floor cents-per-user.
    * This is the curve a data team reads payback periods off; unlike
    * e09 it weighs WHAT users spend, not whether they return.
    *
    * Scale shape: one user-grain shuffle (first week), one
    * (cohort, k) aggregate of purchases, then everything runs at
    * cohort×week grain (bounded by the calendar, not by traffic);
    * the running sum partitions by cohort.
    */
  val e43 = OpQuery.oracled("e43_cohort_ltv_curve",
    """WITH f AS (
      |  SELECT user_id,
      |         min(epoch_us(ts) // 604800000000) AS wk0
      |  FROM events GROUP BY 1
      |), sz AS (
      |  SELECT wk0, CAST(count(*) AS BIGINT) AS n_users FROM f GROUP BY 1
      |), mx AS (
      |  SELECT max(epoch_us(ts) // 604800000000) AS hi FROM events
      |), pur AS (
      |  SELECT f.wk0,
      |         CAST(epoch_us(e.ts) // 604800000000 - f.wk0 AS BIGINT) AS k,
      |         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
      |           AS cents
      |  FROM events e JOIN f ON f.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2
      |), grid AS (
      |  SELECT g.wk0, g.n_users, g.k, coalesce(p.cents, 0) AS week_cents
      |  FROM (
      |    SELECT s.wk0, s.n_users,
      |           unnest(generate_series(0, mx.hi - s.wk0)) AS k
      |    FROM sz s CROSS JOIN mx) g
      |  LEFT JOIN pur p ON p.wk0 = g.wk0 AND p.k = g.k
      |), cum AS (
      |  SELECT wk0, n_users, k, week_cents,
      |         sum(week_cents) OVER (PARTITION BY wk0 ORDER BY k
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      |  FROM grid
      |)
      |SELECT CAST(wk0 AS BIGINT) AS cohort_week, CAST(k AS INT) AS k,
      |       n_users, CAST(week_cents AS BIGINT) AS week_cents,
      |       CAST(cum_cents AS BIGINT) AS cum_cents,
      |       CAST(cum_cents // n_users AS BIGINT) AS ltv_cents
      |FROM cum ORDER BY cohort_week, k""".stripMargin,
    doc = "cohort lifetime-value curve: first-event-week cohorts, per weeks-since-cohort purchase cents (zero-filled through each cohort's observable range), cumulative + exact floor cents-per-user") { (spark, dir) =>
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000 div 604800000000").as("wk"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val f = ev.groupBy("user_id").agg(min("wk").as("wk0"))
    val sz = f.groupBy("wk0")
      .agg(count(lit(1)).cast("bigint").as("n_users"))
    val mx = ev.agg(max("wk").as("hi"))
    val pur = ev.filter(col("event_type") === "purchase")
      .join(f, "user_id")
      .groupBy(col("wk0"), (col("wk") - col("wk0")).cast("bigint").as("k"))
      .agg(sum("cents").cast("bigint").as("cents"))
    val grid = sz.crossJoin(broadcast(mx))
      .select(col("wk0"), col("n_users"),
        explode(sequence(lit(0L), col("hi") - col("wk0"))).as("k"))
      .join(pur, Seq("wk0", "k"), "left")
      .na.fill(0L, Seq("cents"))
      .withColumnRenamed("cents", "week_cents")
    ltvCurve(grid)
  }

  /** e43 kernel on a dense (wk0, n_users, k, week_cents) cohort grid —
    * factored for the hand fixture in FeaturesSpec; see [[e43]].
    */
  def ltvCurve(grid: DataFrame): DataFrame =
    grid
      .withColumn("cum_cents", sum("week_cents").over(
        Window.partitionBy("wk0").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("wk0").cast("bigint").as("cohort_week"),
        col("k").cast("int").as("k"), col("n_users"),
        col("week_cents").cast("bigint").as("week_cents"),
        col("cum_cents").cast("bigint").as("cum_cents"),
        expr("CAST(cum_cents div n_users AS BIGINT)").as("ltv_cents"))
      .orderBy("cohort_week", "k")

  // e44's mirrored MDE tail over the four exact counts: pooled rate,
  // standard error, minimum detectable effect at alpha=5% two-sided /
  // 80% power (the z constants are plain double literals — identical
  // text on both engines), observed diff and the powered verdict.
  private val pwrPool =
    "(CAST(conv_control + conv_treatment AS DOUBLE) / (n_control + n_treatment))"
  private val pwrSe =
    s"(sqrt((($pwrPool) * (CAST(1 AS DOUBLE) - ($pwrPool)))" +
      " * ((CAST(1 AS DOUBLE) / n_control) + (CAST(1 AS DOUBLE) / n_treatment))))"
  private val pwrMde =
    s"((CAST(1.959963984540054 AS DOUBLE) + CAST(0.8416212335729143 AS DOUBLE)) * $pwrSe)"
  private val pwrObs =
    "((CAST(conv_treatment AS DOUBLE) / n_treatment) - (CAST(conv_control AS DOUBLE) / n_control))"

  /** e44 kernel over the one-row (n_control, conv_control,
    * n_treatment, conv_treatment) count frame — factored for the hand
    * fixture in FeaturesSpec.
    */
  def powerReadout(counts: DataFrame): DataFrame =
    counts
      .withColumn("pooled_rate", expr(pwrPool))
      .withColumn("observed_diff", expr(pwrObs))
      .withColumn("mde_abs", expr(pwrMde))
      .withColumn("is_powered",
        when(expr(s"abs($pwrObs) >= $pwrMde"), 1).otherwise(0).cast("int"))

  /** EXPERIMENT POWER READOUT — the "was this experiment big enough"
    * table completing the experimentation suite (e35 z, e39 CUPED,
    * e40 DiD): from e35's exact exposure/conversion counts, the
    * minimum detectable effect at the standard alpha=5% two-sided /
    * 80% power operating point, `MDE = (z_{0.975}+z_{0.80})·SE` with
    * the pooled-rate standard error, and the verdict — is the
    * OBSERVED difference at least the MDE? A significant-looking
    * result below the MDE is noise dressed up; a null result with a
    * huge MDE was never a test. All counts exact BIGINTs via the same
    * lineage as e35 (hash arm, first-view exposure, 7-day window);
    * the tail is one mirrored fixed-order IEEE chain on a 1-row
    * frame.
    */
  val e44 = OpQuery.oracled("e44_experiment_power", {
    val armSqlV = s"(${graft.api.Sampling.uniform32Sql("v.user_id")} % 2)"
    s"""WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), conv AS (
        |  SELECT DISTINCT e.user_id
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) > v.v_us
        |    AND epoch_us(e.ts) <= v.v_us + 604800000000
        |), per AS (
        |  SELECT CAST($armSqlV AS INT) AS arm,
        |         CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
        |  FROM v LEFT JOIN conv c ON c.user_id = v.user_id
        |), agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_control,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_treatment
        |  FROM per
        |)
        |SELECT n_control, conv_control, n_treatment, conv_treatment,
        |       $pwrPool AS pooled_rate,
        |       $pwrObs AS observed_diff,
        |       $pwrMde AS mde_abs,
        |       CAST(CASE WHEN abs($pwrObs) >= $pwrMde THEN 1 ELSE 0 END
        |            AS INT) AS is_powered
        |FROM agg""".stripMargin
  },
    doc = "experiment power readout: minimum detectable effect at alpha=5%/80% power from e35's exact exposure/conversion counts + the observed-vs-MDE verdict — the sample-size sanity table of the experimentation suite") { (spark, dir) =>
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("us") > col("v_us") &&
        col("us") <= col("v_us") + lit(604800000000L))
      .select("user_id").distinct()
      .withColumn("cv", lit(1L))
    powerReadout(
      v.join(conv, Seq("user_id"), "left")
        .select(expr(abArmSql).cast("int").as("arm"),
          coalesce(col("cv"), lit(0L)).as("conv"))
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("bigint")
            .as("n_control"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L))
            .cast("bigint").as("conv_control"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("bigint")
            .as("n_treatment"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L))
            .cast("bigint").as("conv_treatment")))
  }

  /** e45's per-look arithmetic, shared engine/oracle: the e35 z chain
    * behind a degenerate-look guard (an empty arm or an all-or-nothing
    * pooled rate has no defined z — explicit NULL on both sides, the
    * e41 constant-series precedent), and the O'Brien–Fleming boundary
    * `z_K · sqrt(K/k)` — spending almost no alpha early (the boundary
    * at look 1 of 4 is 2·z_K) and converging to the fixed-sample
    * critical value at the horizon. 2.024 is the standard K=4,
    * two-sided α=0.05 OBF terminal value (Jennison & Turnbull,
    * "Group Sequential Methods", table 2.3); it enters as the same
    * literal in both dialects, and sqrt/div/mul are correctly-rounded
    * IEEE ops in a fixed order (t31 doctrine), so the boundary and
    * the crossing flags are bit-identical.
    */
  private val gstLooksK = 4
  private val gstZGuarded =
    s"(CASE WHEN n_control = 0 OR n_treatment = 0" +
      s" OR conv_control + conv_treatment = 0" +
      s" OR conv_control + conv_treatment = n_control + n_treatment" +
      s" THEN NULL ELSE $abZ END)"
  private val gstBoundary =
    s"(2.024 * sqrt(CAST($gstLooksK AS DOUBLE) / CAST(look AS DOUBLE)))"

  /** e45 kernel over a per-exposed-user frame
    * `(arm int, v_us long, conv_us long-nullable)` — factored for the
    * hand fixture in FeaturesSpec. `conv_us` is the user's FIRST
    * qualifying conversion time; a look only counts conversions
    * already observed at its cut (`conv_us <= cut_us`) — the
    * what-we-knew-at-the-look discipline that makes an interim z an
    * honest monitoring statistic instead of a peek at the future.
    * Look cuts are pure integer-µs arithmetic over the exposure span
    * (`lo + (hi-lo)·k div K`), so every count is exact and the oracle
    * reproduces the table bit-for-bit.
    */
  def gstLooks(perUser: DataFrame, nLooks: Int = gstLooksK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the OBF boundary below hardcodes the K=4 terminal value 2.024
    // (Jennison & Turnbull table 2.3) — a different look count needs a
    // different table constant, so any other nLooks would silently
    // produce a statistically WRONG monitor (r15 ADVICE): refuse it.
    require(nLooks == gstLooksK,
      s"gstLooks supports exactly $gstLooksK looks (the 2.024 OBF " +
        s"terminal constant is the K=$gstLooksK table value); got $nLooks")
    val span = perUser.agg(min("v_us").as("lo"), max("v_us").as("hi"))
    val cuts = perUser.sparkSession.range(1, nLooks + 1)
      .select(col("id").cast("int").as("look"))
      .crossJoin(broadcast(span))
      .select(col("look"),
        (col("lo") + expr(s"((hi - lo) * look) div $nLooks")).as("cut_us"))
    // K-row fan of the USER-grain frame, aggregated immediately —
    // map-side combine keeps the shuffle at K rows per partition
    // whatever the corpus size
    val agg = perUser.crossJoin(broadcast(cuts))
      .filter(col("v_us") <= col("cut_us"))
      .withColumn("conv_at",
        when(col("conv_us").isNotNull && col("conv_us") <= col("cut_us"), 1L)
          .otherwise(0L))
      .groupBy("look", "cut_us")
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_control"),
        sum(when(col("arm") === 0, col("conv_at")).otherwise(0L))
          .cast("bigint").as("conv_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_treatment"),
        sum(when(col("arm") === 1, col("conv_at")).otherwise(0L))
          .cast("bigint").as("conv_treatment"))
    agg
      .withColumn("z_score", expr(gstZGuarded))
      .withColumn("obf_boundary", expr(gstBoundary))
      .withColumn("crossed",
        when(col("z_score").isNotNull &&
          abs(col("z_score")) > col("obf_boundary"), 1)
          .otherwise(0).cast("int"))
      .withColumn("stopped_by_now",
        max(col("crossed")).over(Window.orderBy("look")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .orderBy("look")
  }

  /** e45: GROUP-SEQUENTIAL MONITORING of the e35 experiment — the
    * r14-verdict "new design, not new readout" extension of the
    * experimentation suite (e35 z / e39 CUPED / e40 DiD / e44 MDE all
    * answer at the horizon; this answers the question a live
    * experiment actually asks: CAN WE STOP YET, without inflating
    * false positives by peeking). Four equally-spaced interim looks
    * over the exposure span; at each look the cumulative
    * exposure/conversion counts AS OBSERVED BY THAT TIME, the pooled
    * z, the O'Brien–Fleming boundary, and the crossing/stopped flags.
    * mSPRT (the always-valid alternative) needs exp/ln — not
    * correctly-rounded, off the oracle surface per the t31/t40
    * doctrine; OBF needs only sqrt, so the whole monitor is
    * bit-checkable.
    */
  /** The full group-sequential oracle, shared VERBATIM between the
    * batch e45 and the streaming qs29 (the e35/qs19 `abOracleSql`
    * pattern): both engines must land on the same look table whether
    * the per-user (arm, v_us, conv_us) frame was derived in one batch
    * pass or folded incrementally across micro-batch runs.
    */
  private[ops] val gstOracleSql: String = {
    val armSqlV = s"(${graft.api.Sampling.uniform32Sql("v.user_id")} % 2)"
    s"""WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), cv AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS conv_us
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) > v.v_us
        |    AND epoch_us(e.ts) <= v.v_us + 604800000000
        |  GROUP BY 1
        |), per AS (
        |  SELECT CAST($armSqlV AS INT) AS arm, v.v_us, cv.conv_us
        |  FROM v LEFT JOIN cv ON cv.user_id = v.user_id
        |), span AS (
        |  SELECT min(v_us) AS lo, max(v_us) AS hi FROM per
        |), cuts AS (
        |  SELECT CAST(g.look AS INT) AS look,
        |         lo + ((hi - lo) * g.look) // $gstLooksK AS cut_us
        |  FROM span, (SELECT unnest(generate_series(1, $gstLooksK)) AS look) g
        |), agg AS (
        |  SELECT c.look, c.cut_us,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_control,
        |    CAST(sum(CASE WHEN arm = 0 AND conv_us IS NOT NULL
        |                   AND conv_us <= c.cut_us THEN 1 ELSE 0 END)
        |         AS BIGINT) AS conv_control,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treatment,
        |    CAST(sum(CASE WHEN arm = 1 AND conv_us IS NOT NULL
        |                   AND conv_us <= c.cut_us THEN 1 ELSE 0 END)
        |         AS BIGINT) AS conv_treatment
        |  FROM per JOIN cuts c ON per.v_us <= c.cut_us
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT look, CAST(cut_us AS BIGINT) AS cut_us,
        |         n_control, conv_control, n_treatment, conv_treatment,
        |         $gstZGuarded AS z_score,
        |         $gstBoundary AS obf_boundary
        |  FROM agg
        |), flagged AS (
        |  SELECT *,
        |         CAST(CASE WHEN z_score IS NOT NULL
        |                    AND abs(z_score) > obf_boundary
        |               THEN 1 ELSE 0 END AS INT) AS crossed
        |  FROM scored
        |)
        |SELECT look, cut_us, n_control, conv_control, n_treatment,
        |       conv_treatment, z_score, obf_boundary, crossed,
        |       CAST(max(crossed) OVER (ORDER BY look
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS INT) AS stopped_by_now
        |FROM flagged ORDER BY look""".stripMargin
  }

  val e45 = OpQuery.oracled("e45_group_sequential_readout", gstOracleSql,
    doc = "group-sequential experiment monitor: 4 interim looks over the exposure span, cumulative counts as-observed-at-the-look, pooled z vs O'Brien-Fleming boundaries, crossing + stopped flags - the can-we-stop-yet table of the experimentation suite") { (spark, dir) =>
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val cv = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("us") > col("v_us") &&
        col("us") <= col("v_us") + lit(604800000000L))
      .groupBy("user_id").agg(min(col("us")).as("conv_us"))
    gstLooks(
      v.join(cv, Seq("user_id"), "left")
        .select(expr(abArmSql).cast("int").as("arm"),
          col("v_us"), col("conv_us")))
  }

  // e46's shared per-stratum tail: the e40 DiD strings behind an
  // empty-arm guard (a stratum missing one arm has no defined DiD —
  // NULL on both sides, excluded from the pool), plus the precision
  // weight n_c·n_t/(n_c+n_t) — the inverse-variance-flavored weight
  // that gives a stratum influence in proportion to how much both its
  // arms can actually say (a stratum with 3 treatment users cannot
  // dominate the pooled estimate however large its control side).
  private val sdidGuarded =
    s"(CASE WHEN n_control = 0 OR n_treatment = 0 THEN NULL" +
      s" ELSE $didEst END)"
  private val sdidW =
    "(CAST(n_control AS DOUBLE) * n_treatment / (n_control + n_treatment))"
  // pooled estimate as a FIXED-ORDER pivot chain over the three
  // strata, never a sum() over double rows (aggregation order is not
  // deterministic in either engine; a left-associated three-term
  // chain is)
  private def sdidTermNum(k: Int) =
    s"(CASE WHEN d$k IS NULL OR w$k IS NULL THEN CAST(0 AS DOUBLE)" +
      s" ELSE w$k * d$k END)"
  private def sdidTermDen(k: Int) =
    s"(CASE WHEN d$k IS NULL OR w$k IS NULL THEN CAST(0 AS DOUBLE)" +
      s" ELSE w$k END)"
  private val sdidPooledNum =
    s"(${sdidTermNum(1)} + ${sdidTermNum(2)} + ${sdidTermNum(3)})"
  private val sdidPooledDen =
    s"(${sdidTermDen(1)} + ${sdidTermDen(2)} + ${sdidTermDen(3)})"
  private val sdidPooled =
    s"(CASE WHEN $sdidPooledDen = 0 THEN NULL" +
      s" ELSE $sdidPooledNum / $sdidPooledDen END)"

  /** e46 kernel over a per-user frame `(arm int, pre_n long,
    * post_n long)` — factored for the hand fixture in FeaturesSpec.
    * Strata are assigned at HISTOGRAM grain: the cumulative user
    * count below each distinct pre-period value cuts the axis into
    * `nStrata` near-equal bands (`(cum_before · S) div n + 1`), so
    * every user sharing a value lands in the same stratum
    * deterministically and the rank window runs on distinct VALUES,
    * never on the user dimension (the e38 Gini / r67 decile
    * precedent — no billion-row single-reducer sort). Output: one row
    * per populated stratum plus the stratum-0 pooled row, whose
    * did_estimate is the precision-weighted combination and whose
    * counts/rates are the plain totals (so the distance between
    * stratum 0's pooled DiD and e40's raw DiD on the same panel IS
    * the measured confounding adjustment).
    */
  def stratifiedDid(perUser: DataFrame, nStrata: Int = 3): DataFrame = {
    require(nStrata == 3, "the pooled pivot chain is written for 3 strata")
    val n = perUser.agg(count(lit(1)).cast("bigint").as("nu"))
    val wb = Window.orderBy("pre_n")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = perUser.groupBy("pre_n")
      .agg(count(lit(1)).cast("bigint").as("m"))
      .withColumn("cb", coalesce(sum("m").over(wb), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("pre_n"),
        (expr(s"(cb * $nStrata) div nu") + 1).cast("int").as("stratum"))
    val cell = perUser.join(broadcast(bounds), "pre_n")
      .groupBy("stratum")
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_control"),
        sum(when(col("arm") === 0, col("pre_n")).otherwise(0L))
          .cast("bigint").as("pre_control"),
        sum(when(col("arm") === 0, col("post_n")).otherwise(0L))
          .cast("bigint").as("post_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_treatment"),
        sum(when(col("arm") === 1, col("pre_n")).otherwise(0L))
          .cast("bigint").as("pre_treatment"),
        sum(when(col("arm") === 1, col("post_n")).otherwise(0L))
          .cast("bigint").as("post_treatment"))
      .withColumn("did_estimate", expr(sdidGuarded))
      .withColumn("w", expr(sdidW))
      .cutLineage // read twice: the stratum rows and the pooled pivot
    val pivCols = (1 to nStrata).flatMap(k => Seq(
      max(when(col("stratum") === k, col("w"))).as(s"w$k"),
      max(when(col("stratum") === k, col("did_estimate"))).as(s"d$k"))) ++
      Seq(
        sum("n_control").cast("bigint").as("n_control"),
        sum("pre_control").cast("bigint").as("pre_control"),
        sum("post_control").cast("bigint").as("post_control"),
        sum("n_treatment").cast("bigint").as("n_treatment"),
        sum("pre_treatment").cast("bigint").as("pre_treatment"),
        sum("post_treatment").cast("bigint").as("post_treatment"))
    val piv = cell.agg(pivCols.head, pivCols.tail: _*)
    val pooled = piv.select(
      lit(0).cast("int").as("stratum"),
      col("n_control"), col("pre_control"), col("post_control"),
      col("n_treatment"), col("pre_treatment"), col("post_treatment"),
      expr(sdidPooled).as("did_estimate"),
      expr(sdidPooledDen).as("w"))
    cell.select(col("stratum"), col("n_control"), col("pre_control"),
        col("post_control"), col("n_treatment"), col("pre_treatment"),
        col("post_treatment"), col("did_estimate"), col("w"))
      .unionByName(pooled)
      .orderBy("stratum")
  }

  /** e46: STRATIFIED difference-in-differences — the r14-verdict
    * "new design" causal extension: e40's raw DiD is confounded when
    * baseline activity differs across arms AND predicts the outcome
    * trend, so the panel is post-stratified into pre-period-activity
    * terciles and the per-stratum DiDs are pooled with precision
    * weights (the Cochran–Mantel–Haenszel construction applied to the
    * DiD estimand). Stratum 0 carries the pooled estimate next to the
    * plain totals; strata 1–3 show where the effect actually lives.
    */
  val e46 = OpQuery.oracled("e46_stratified_did", {
    val armSql = s"(${graft.api.Sampling.uniform32Sql("user_id")} % 2)"
    s"""WITH d AS (
      |  SELECT user_id, event_type,
      |         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      |  FROM events
      |), b AS (
      |  SELECT CAST((min(day) + max(day) + 1) // 2 AS BIGINT) AS cut FROM d
      |), pu AS (
      |  SELECT CAST($armSql AS INT) AS arm,
      |         CAST(sum(CASE WHEN event_type = 'purchase'
      |                        AND day < (SELECT cut FROM b)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
      |         CAST(sum(CASE WHEN event_type = 'purchase'
      |                        AND day >= (SELECT cut FROM b)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS post_n
      |  FROM d GROUP BY user_id
      |), n AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nu FROM pu
      |), bounds AS (
      |  SELECT pre_n,
      |         CAST((coalesce(sum(m) OVER (ORDER BY pre_n
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |               0) * 3) // nu + 1 AS INT) AS stratum
      |  FROM (SELECT pre_n, CAST(count(*) AS BIGINT) AS m
      |        FROM pu GROUP BY 1) h, n
      |), cell AS (
      |  SELECT s.stratum,
      |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_control,
      |    CAST(sum(CASE WHEN arm = 0 THEN pre_n ELSE 0 END) AS BIGINT)
      |      AS pre_control,
      |    CAST(sum(CASE WHEN arm = 0 THEN post_n ELSE 0 END) AS BIGINT)
      |      AS post_control,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_treatment,
      |    CAST(sum(CASE WHEN arm = 1 THEN pre_n ELSE 0 END) AS BIGINT)
      |      AS pre_treatment,
      |    CAST(sum(CASE WHEN arm = 1 THEN post_n ELSE 0 END) AS BIGINT)
      |      AS post_treatment
      |  FROM pu JOIN bounds s USING (pre_n)
      |  GROUP BY 1
      |), scored AS (
      |  SELECT stratum, n_control, pre_control, post_control,
      |         n_treatment, pre_treatment, post_treatment,
      |         $sdidGuarded AS did_estimate,
      |         $sdidW AS w
      |  FROM cell
      |), piv AS (
      |  SELECT
      |    max(CASE WHEN stratum = 1 THEN w END) AS w1,
      |    max(CASE WHEN stratum = 1 THEN did_estimate END) AS d1,
      |    max(CASE WHEN stratum = 2 THEN w END) AS w2,
      |    max(CASE WHEN stratum = 2 THEN did_estimate END) AS d2,
      |    max(CASE WHEN stratum = 3 THEN w END) AS w3,
      |    max(CASE WHEN stratum = 3 THEN did_estimate END) AS d3,
      |    CAST(sum(n_control) AS BIGINT) AS n_control,
      |    CAST(sum(pre_control) AS BIGINT) AS pre_control,
      |    CAST(sum(post_control) AS BIGINT) AS post_control,
      |    CAST(sum(n_treatment) AS BIGINT) AS n_treatment,
      |    CAST(sum(pre_treatment) AS BIGINT) AS pre_treatment,
      |    CAST(sum(post_treatment) AS BIGINT) AS post_treatment
      |  FROM scored
      |)
      |SELECT stratum, n_control, pre_control, post_control,
      |       n_treatment, pre_treatment, post_treatment,
      |       did_estimate, w
      |FROM scored
      |UNION ALL
      |SELECT CAST(0 AS INT) AS stratum,
      |       n_control, pre_control, post_control,
      |       n_treatment, pre_treatment, post_treatment,
      |       $sdidPooled AS did_estimate,
      |       $sdidPooledDen AS w
      |FROM piv
      |ORDER BY stratum""".stripMargin
  },
    doc = "stratified difference-in-differences: pre-period-activity terciles assigned at histogram grain, per-stratum DiD behind an empty-arm guard, precision-weighted pooled estimate via a fixed-order pivot chain (stratum 0)") { (spark, dir) =>
    val d = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 86400000000000").as("day"))
    val cut = d.agg(
      expr("CAST((min(day) + max(day) + 1) div 2 AS BIGINT)").as("cut"))
    stratifiedDid(
      d.crossJoin(broadcast(cut))
        .groupBy("user_id", "cut")
        .agg(
          sum(when(col("event_type") === "purchase" &&
            col("day") < col("cut"), 1L).otherwise(0L))
            .cast("bigint").as("pre_n"),
          sum(when(col("event_type") === "purchase" &&
            col("day") >= col("cut"), 1L).otherwise(0L))
            .cast("bigint").as("post_n"))
        .select(expr(abArmSql).cast("int").as("arm"),
          col("pre_n"), col("post_n")))
  }

  /** Frequent length-3 gap-subsequence mining over user event streams
    * — the sequential-pattern axis (GSP, Srikant & Agrawal EDBT'96;
    * PrefixSpan, Pei et al. ICDE'01) the transition family doesn't
    * cover: e13 counts ADJACENT bigrams and e14 ranks whole path
    * strings, but "did a… then eventually b… then eventually c happen,
    * in order, with anything in between" is a different relation —
    * pattern support is per-USER existence of a subsequence with
    * arbitrary gaps, the shape funnel definitions and curriculum
    * mining actually use.
    *
    * The existence test is the greedy-earliest unrolling: user u
    * supports (a,b,c) iff taking u's EARLIEST a, then the earliest b
    * strictly after it, leaves any c strictly after that. Greedy is
    * exact for existence — any witness (t₁<t₂<t₃) stays a witness when
    * t₁ is moved to the earliest a (t₂,t₃ unchanged), then t₂ to the
    * earliest b after the new t₁ — so two keyed min-aggregates and one
    * semi-style probe replace the T³ subsequence join a naive encoding
    * would run per user.
    *
    * Scale shape: every join is co-partitioned on user_id (one shuffle
    * key reused across all three stages — AQE reuses the exchange);
    * intermediate grains are bounded by users×T and users×T² for an
    * event-type alphabet of size T (here 5), never by event count
    * squared; the final aggregate is over ≤T³ pattern keys. Support is
    * a count of DISTINCT users, taken on the (user,a,b,c) grain that
    * the last dedup already pinned, so the pattern table is exact.
    */
  val e48 = OpQuery.oracled("e48_frequent_event_sequences",
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      |), fa AS (
      |  SELECT user_id, event_type AS a, min(ts_us) AS ta
      |  FROM ev GROUP BY 1, 2
      |), fab AS (
      |  SELECT fa.user_id, fa.a, e.event_type AS b, min(e.ts_us) AS tab
      |  FROM fa JOIN ev e ON e.user_id = fa.user_id AND e.ts_us > fa.ta
      |  GROUP BY 1, 2, 3
      |), fabc AS (
      |  SELECT DISTINCT f.user_id, f.a, f.b, e.event_type AS c
      |  FROM fab f JOIN ev e ON e.user_id = f.user_id AND e.ts_us > f.tab
      |), u AS (
      |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ev
      |)
      |SELECT a, b, c, CAST(count(*) AS BIGINT) AS support,
      |       CAST((count(*) * 1000000) // (SELECT n_users FROM u)
      |            AS BIGINT) AS support_ppm
      |FROM fabc
      |GROUP BY 1, 2, 3
      |ORDER BY a, b, c""".stripMargin,
    doc = "frequent length-3 gap-subsequence patterns (GSP/PrefixSpan axis): per-user greedy-earliest existence via two keyed min-aggregates, support = distinct users, ppm vs the full user base") { (spark, dir) =>
    frequentSequences3(
      Sources.table(spark, dir, "events")
        .withColumn("ts_us", tsUs)
        .select(col("user_id"), col("event_type"), col("ts_us")))
  }

  /** e48's kernel over a (user_id, event_type, ts_us) frame — factored
    * so the greedy-earliest existence argument is spec-drivable
    * against a brute-force subsequence witness on arbitrary fixtures.
    */
  private[graft] def frequentSequences3(ev: DataFrame): DataFrame = {
    val fa = ev
      .groupBy(col("user_id"), col("event_type").as("a"))
      .agg(min("ts_us").as("ta"))
    val fab = fa.join(ev, Seq("user_id"))
      .filter(col("ts_us") > col("ta"))
      .groupBy(col("user_id"), col("a"), col("event_type").as("b"))
      .agg(min("ts_us").as("tab"))
    val fabc = fab.join(ev, Seq("user_id"))
      .filter(col("ts_us") > col("tab"))
      .select(col("user_id"), col("a"), col("b"), col("event_type").as("c"))
      .distinct()
    val users = ev.agg(countDistinct("user_id").cast("bigint").as("n_users"))
    fabc.groupBy("a", "b", "c")
      .agg(count(lit(1)).cast("bigint").as("support"))
      .crossJoin(broadcast(users))
      .select(col("a"), col("b"), col("c"), col("support"),
        expr("CAST((support * 1000000) div n_users AS BIGINT)")
          .as("support_ppm"))
      .orderBy("a", "b", "c")
  }

  /** Split-conformal one-sided prediction bound with holdout coverage
    * — the distribution-free interval axis (Vovk, Gammerman & Shafer,
    * "Algorithmic Learning in a Random World", 2005; Lei et al., JASA
    * 2018) the experimentation family doesn't cover: e35/e44/e45 test
    * HYPOTHESES about means, but "give me a value bound that will
    * contain at least (1−α) of future observations, no distributional
    * assumptions" is a calibration statement, and it's how a serving
    * pipeline sets anomaly thresholds with a guarantee instead of a
    * z-score heuristic.
    *
    * Split conformal: the md5-deterministic half of events (t06's
    * split doctrine, so membership is engine-independent) calibrates;
    * the bound at level 1−α is the k-th order statistic of the
    * calibration scores with k = ⌈(1−α)(n_c+1)⌉ (clamped to n_c);
    * coverage is then MEASURED on the other half — the finite-sample
    * guarantee E[coverage] ≥ 1−α made empirical, per level. Scores
    * are exact integer cents (e47's round idiom).
    *
    * Scale shape: the order statistic comes from
    * `approxQuantile(relativeError = 0)` — a distributed sketch
    * aggregation, no sort anywhere (e47's pinned doctrine: it returns
    * the rank-⌈p·n⌉ statistic; probing at p = (k−½)/n_c makes the
    * target rank exactly k, robust to ulp rounding in p). n_c and the
    * three thresholds are the only driver-side scalars (the S8
    * discipline); coverage is one broadcast fan-out (3 levels) and a
    * single map-side-combined aggregate over the holdout.
    */
  val e49 = OpQuery.oracled("e49_conformal_value_bound",
    """WITH s AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |         (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 16
      |           + (instr('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1) AS bkt
      |  FROM events
      |), calib AS (
      |  SELECT cents FROM s WHERE bkt < 128
      |), test AS (
      |  SELECT cents FROM s WHERE bkt >= 128
      |), nc AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_calib FROM calib
      |), h AS (
      |  SELECT cents AS v, count(*) AS m FROM calib GROUP BY 1
      |), hc AS (
      |  SELECT v, sum(m) OVER (ORDER BY v) AS cum FROM h
      |), lv AS (
      |  SELECT unnest([80, 90, 95]) AS level_pct
      |), ks AS (
      |  SELECT level_pct, n_calib,
      |         least((level_pct * (n_calib + 1) + 99) // 100, n_calib) AS k
      |  FROM lv CROSS JOIN nc
      |), thr AS (
      |  SELECT level_pct, n_calib,
      |         (SELECT min(v) FROM hc WHERE cum >= ks.k) AS threshold_cents
      |  FROM ks
      |)
      |SELECT t.level_pct, t.n_calib,
      |       CAST(count(*) AS BIGINT) AS n_test,
      |       t.threshold_cents,
      |       CAST(sum(CASE WHEN test.cents <= t.threshold_cents
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
      |       CAST((sum(CASE WHEN test.cents <= t.threshold_cents
      |                      THEN 1 ELSE 0 END) * 1000000) // count(*)
      |            AS BIGINT) AS coverage_ppm
      |FROM thr t CROSS JOIN test
      |GROUP BY 1, 2, 4
      |ORDER BY level_pct""".stripMargin,
    doc = "split-conformal one-sided value bound at 80/90/95% with measured holdout coverage: md5-deterministic calibration split, exact rank-k threshold via the relativeError-0 sketch (no sort), coverage ppm per level") { (spark, dir) =>
    import spark.implicits._
    val s = Sources.table(spark, dir, "events")
      .select(col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("bkt", graft.api.Sampling.hashBucket(col("event_id")))
    val calib = s.filter(col("bkt") < 128).select("cents")
    val test = s.filter(col("bkt") >= 128).select("cents")
    val nc = calib.count()
    require(nc >= 20, s"e49 calibration split has $nc rows; needs >= 20 " +
      "so the 95% rank stays inside the sample")
    val levels = Seq(80, 90, 95)
    val ks = levels.map(l => math.min((l * (nc + 1) + 99) / 100, nc))
    val probs = ks.map(k => (k - 0.5) / nc).toArray
    val bounds = calib.stat.approxQuantile("cents", probs, 0.0)
    val thr = levels.zip(ks).zip(bounds)
      .map { case ((l, _), b) => (l, nc, b.toLong) }
      .toDF("level_pct", "n_calib", "threshold_cents")
    test.crossJoin(broadcast(thr))
      .groupBy("level_pct", "n_calib", "threshold_cents")
      .agg(count(lit(1)).cast("bigint").as("n_test"),
        sum(when(col("cents") <= col("threshold_cents"), 1L).otherwise(0L))
          .cast("bigint").as("n_covered"))
      .select(col("level_pct"), col("n_calib"), col("n_test"),
        col("threshold_cents"), col("n_covered"),
        expr("CAST((n_covered * 1000000) div n_test AS BIGINT)")
          .as("coverage_ppm"))
      .orderBy("level_pct")
  }

  /** Delete-a-group jackknife standard error for a RATIO metric — the
    * resampling-variance axis (Kott, "The Delete-a-Group Jackknife",
    * JOS 2001; the method large experimentation platforms use for
    * ratio metrics where the delta-method's independence assumptions
    * are shaky): e44 computes ANALYTIC power from a variance formula,
    * but a ratio of sums over correlated per-user contributions wants
    * a design-based error bar — partition the UNITS (users, by the
    * t06 md5 split doctrine, so membership is engine-independent)
    * into G groups, recompute θ with each group deleted, and read the
    * spread.
    *
    * Everything before the output tail is exact: per-group sums
    * (v_g, c_g) in BIGINT; each leave-one-out estimate quantized to
    * integer micros through ONE fixed-order IEEE chain
    * (div·mul·trunc); the jackknife sum-of-squares G·Σm²−(Σm)² in
    * DECIMAL(38,0) (the momStd overflow class — m² outgrows int64);
    * SE = √((G−1)·ss)/G as the one sqrt/div tail (t31 doctrine).
    *
    * Scale shape: one keyed aggregate to G rows, a broadcast scalar
    * attach, a 16-row collect only for the loud degenerate-group
    * guard (S8 discipline) — the corpus is scanned once, nothing is
    * sorted, and G is a constant.
    */
  val e50 = OpQuery.oracled("e50_jackknife_ratio_se",
    """WITH p AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |         ((instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
      |           + (instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1)) // 16 AS g
      |  FROM events WHERE event_type = 'purchase'
      |), grp AS (
      |  SELECT g, CAST(sum(cents) AS BIGINT) AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM p GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(v) AS BIGINT) AS tv, CAST(sum(c) AS BIGINT) AS tc,
      |         CAST(count(*) AS BIGINT) AS ng
      |  FROM grp
      |), m AS (
      |  SELECT CAST(trunc((CAST(tv - v AS DOUBLE) / CAST(tc - c AS DOUBLE))
      |                    * 1000000.0) AS BIGINT) AS m
      |  FROM grp CROSS JOIN tot
      |), ja AS (
      |  SELECT CAST(sum(m) AS BIGINT) AS sm,
      |         sum(CAST(m AS DECIMAL(38,0)) * m) AS sm2
      |  FROM m
      |)
      |SELECT ng AS n_groups, tc AS n_purchases, tv AS total_cents,
      |       CAST(trunc((CAST(tv AS DOUBLE) / CAST(tc AS DOUBLE))
      |                  * 1000000.0) AS BIGINT) AS theta_micros,
      |       sm // ng AS jk_mean_micros,
      |       CAST(trunc(sqrt(CAST((ng * sm2 - CAST(sm AS DECIMAL(38,0)) * sm)
      |                            * (ng - 1) AS DOUBLE)) / ng) AS BIGINT)
      |         AS se_micros
      |FROM ja CROSS JOIN tot""".stripMargin,
    doc = "delete-a-group jackknife SE of the average-order-value ratio: 16 md5 user groups, leave-one-out estimates in integer micros, DECIMAL(38,0) sum-of-squares, sqrt/div tail") { (spark, dir) =>
    val grp = Sources.table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (graft.api.Sampling.hashBucket(col("user_id"))
          .cast("long") / lit(16L)).cast("long").as("g"))
      .groupBy("g")
      .agg(sum("cents").cast("bigint").as("v"),
        count(lit(1)).cast("bigint").as("c"))
    // loud degenerate-group guard: a group owning ALL purchases would
    // null its leave-one-out divisor; ≤16 rows by construction
    val gs = grp.collect().map(r => (r.getLong(1), r.getLong(2)))
    val totalC = gs.map(_._2).sum
    gs.foreach { case (_, cg) =>
      require(cg < totalC,
        s"e50 degenerate: one md5 group holds all $totalC purchases") }
    val tot = grp.agg(sum("v").cast("bigint").as("tv"),
      sum("c").cast("bigint").as("tc"),
      count(lit(1)).cast("bigint").as("ng"))
    val ja = grp.crossJoin(broadcast(tot))
      .select(expr(
        """CAST((CAST(tv - v AS DOUBLE) / CAST(tc - c AS DOUBLE))
          |     * 1000000.0 AS BIGINT)""".stripMargin).as("m"))
      .agg(sum("m").cast("bigint").as("sm"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("sm2"))
    ja.crossJoin(broadcast(tot))
      .select(col("ng").as("n_groups"), col("tc").as("n_purchases"),
        col("tv").as("total_cents"),
        expr("""CAST((CAST(tv AS DOUBLE) / CAST(tc AS DOUBLE))
               |     * 1000000.0 AS BIGINT)""".stripMargin)
          .as("theta_micros"),
        expr("sm div ng").as("jk_mean_micros"),
        expr("""CAST(sqrt(CAST((ng * sm2 - CAST(sm AS DECIMAL(38,0)) * sm)
               |               * (ng - 1) AS DOUBLE)) / ng AS BIGINT)"""
          .stripMargin).as("se_micros"))
  }

  val all: Seq[OpQuery] = Seq(e01, e02, e03, e04, e05, e07, e08, e09, e10,
    e11, e12, e13, e14, e15, e16, e17, e18, e19, e20, e21, e22, e23, e24,
    e25, e26, e27, e28, e29, e30, e31, e32, e33, e34, e35, e36, e37, e38,
    e39, e40, e41, e42, e43, e44, e45, e46, e47, e48, e49, e50)
}
