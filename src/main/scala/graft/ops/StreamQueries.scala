package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.stream.Pipelines

/** Streaming pipelines under the driver's hard correctness signal:
  * each query EXECUTES a Structured Streaming job to completion
  * (file source → transforms → checkpointed parquet sink,
  * `Trigger.AvailableNow`) inside `fn`, then returns the sink's
  * contents — so the DuckDB oracle hash-compares an actual streaming
  * run, not a batch twin. This promotes the §2.9 surface (S3 file
  * source, S4 envelope decode, S5 append sink + checkpoint,
  * watermarked stateful operators) from spec-verified to
  * oracle-verified.
  *
  * Determinism contract (what makes a STREAMING run oracle-able):
  *  - every run starts from a fresh checkpoint and empty sink (wiped
  *    in `fn`), so no state leaks between runs;
  *  - `AvailableNow` with no file cap processes the whole backlog as
  *    one micro-batch: the initial watermark (0) drops nothing, and
  *    the run then advances the watermark once to
  *    `ms-truncated max(event_ts) − delay` and flushes append-mode
  *    results in the commit batch that follows;
  *  - therefore exactly the windows with `window_end <= watermark`
  *    are emitted — a pure function of the input the oracle's `wm`
  *    CTE re-derives (the trailing windows still open at end-of-input
  *    are withheld, which IS append-mode semantics, not data loss).
  *
  * The scale story is the streaming engine's own: state is bounded by
  * the watermark horizon (open windows only), the sink commits
  * per-batch via the checkpoint WAL, and the same pipeline runs
  * unmodified against a message bus by swapping the source profile
  * ([[graft.io.Sources.IoProfile]]).
  */
object StreamQueries {

  /** Per-SF scratch root for a streaming query's sink + checkpoint. */
  private def scratch(dir: String, qname: String): String = {
    val sf = new java.io.File(dir).getName.replace(".", "_")
    s"/root/repo/target/stream/$sf/$qname"
  }

  private def wipe(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  /** Streaming file source over the events table with the canonical
    * epoch-ns `ts` (same normalization as the batch
    * [[graft.io.Sources.table]], applied to the streaming frame).
    * The fixture ships events as a single parquet FILE and the file
    * streaming source requires a directory, so the stream lists the
    * SF dir with a glob filter pinned to that file.
    */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val sch = spark.read.parquet(s"$dir/events.parquet").schema
    Sources.canonicalEventTime(
      spark.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** qs1: an actual streaming run of the watermarked tumbling-window
    * aggregation (the §2.9 W-surface) — hourly event counts per type,
    * append mode, flushed to a parquet sink by `AvailableNow`. The
    * oracle recomputes the same windows in SQL and keeps exactly those
    * closed by the final watermark (`wm` CTE: millisecond-truncated
    * max event time minus the 1 h delay — Spark tracks event-time
    * watermarks in milliseconds).
    */
  val qs1 = OpQuery.oracled("qs1_stream_hourly_counts",
    """WITH wm AS (
      |  SELECT (epoch_us(max(ts)) // 1000) * 1000 - 3600000000 AS w
      |  FROM events
      |)
      |SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
      |       event_type, count(*) AS cnt
      |FROM events
      |WHERE (CAST(epoch(date_trunc('hour', ts)) AS BIGINT) + 3600) * 1000000
      |      <= (SELECT w FROM wm)
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin,
    doc = "streaming watermarked hourly window counts, run to completion " +
      "through a checkpointed parquet sink (oracle mirrors the final " +
      "watermark's append-mode flush)") { (spark, dir) =>
    val root = scratch(dir, "qs1")
    wipe(root)
    val windowed = eventStream(spark, dir)
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .count()
      .select(col("window.start").cast("long").as("hour_start"),
        col("event_type"), col("count").as("cnt"))
    Pipelines.runToCompletion(
      Pipelines.sink(windowed, s"$root/sink", s"$root/ckpt"))
    spark.read.parquet(s"$root/sink")
      .orderBy("hour_start", "event_type")
  }

  /** The envelope fixture qs2 streams: the events table serialized to
    * the `(data string)` JSON wire shape (one inner-JSON record per
    * row — the Kinesis/Kafka envelope), cached per SF. Doubles
    * round-trip exactly (Jackson emits the shortest string that
    * parses back to the same IEEE value), so the decoded stream is
    * value-identical to the source table.
    */
  private[graft] def ensureEnvelopeInput(spark: SparkSession,
      dir: String): String = synchronized {
    val sf = new java.io.File(dir).getName.replace(".", "_")
    val loc = s"/root/repo/target/stream/$sf/envelope_input"
    val fp = graft.io.DerivedCache.fingerprint(dir, Seq("events"))
    if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
      Sources.table(spark, dir, "events")
        .select(to_json(struct(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))).as("data"))
        .coalesce(4)
        .write.mode("overwrite").json(loc)
      graft.io.DerivedCache.stamp(loc, fp)
    }
    loc
  }

  /** qs2: an actual streaming run of the reference's ingest shape —
    * JSON envelope files in, [[graft.io.Sources.decodeEnvelope]]
    * (`from_json` → flatten), row-level cleaning (drop the `error`
    * events), watermarked keyed dedup, checkpointed parquet sink out.
    * This is S3+S4+S5 plus a stateful operator under the hard signal;
    * the oracle re-derives the cleaned projection straight from the
    * events table (the wire round-trip is value-exact).
    */
  val qs2 = OpQuery.oracled("qs2_stream_envelope_clean",
    """SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value
      |FROM events
      |WHERE event_type <> 'error'
      |ORDER BY event_id""".stripMargin,
    doc = "streaming envelope ingest: JSON wire decode + clean + " +
      "watermarked dedup through a checkpointed sink, vs the batch " +
      "projection oracle") { (spark, dir) =>
    val input = ensureEnvelopeInput(spark, dir)
    val root = scratch(dir, "qs2")
    wipe(s"$root/sink"); wipe(s"$root/ckpt")
    val inner = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val cleaned = Sources
      .decodeEnvelope(Sources.streamEnvelope(spark, input), inner)
      .filter(col("event_id").isNotNull && col("event_type") =!= "error")
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicates("event_id")
      .drop("event_ts")
    Pipelines.runToCompletion(
      Pipelines.sink(cleaned, s"$root/sink", s"$root/ckpt"))
    spark.read.parquet(s"$root/sink")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  val all: Seq[OpQuery] = Seq(
    qs1,
    qs2.copy(prepare = (s, d) => { ensureEnvelopeInput(s, d); () }))
}
