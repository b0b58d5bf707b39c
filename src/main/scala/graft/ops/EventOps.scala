package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Event-stream analytics over the `events` table — the batch twins of
  * the streaming pipelines in graft.stream (same transforms, bounded
  * input), SURVEY.md §2.9 generalization.
  *
  * Timestamp discipline: `ts` is nanosecond parquet. Spark reads it as a
  * long of epoch nanoseconds (spark.sql.legacy.parquet.nanosAsLong) while
  * DuckDB truncates to a microsecond TIMESTAMP on read — so every oracled
  * computation here drops to epoch microseconds (`ts div 1000` /
  * `epoch_us(ts)`) before any comparison, ordering, or output
  * (SURVEY.md §7.4.6).
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

  val all: Seq[OpQuery] = Seq(e01, e02, e03, e04, e05, e07)
}
