package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Readers for the engine. Everything is expressed against plain paths so
  * the same code runs on a laptop, local[32], or a 1000-executor cluster;
  * cloud-only connectors (Kafka / Kinesis / Delta) slot in behind the
  * same signatures.
  *
  * Reference shapes covered: S1/S2 batch scans
  * (`(Clone) mount_s3_in_databricks.py:21-24,62-75`), S4 envelope decode
  * (`(Clone) kinesis_streaming_process_in_databricks.py:83-85,109-111`).
  */
object Sources {

  /** All driver-provided star-schema tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one parquet table from a scale-factor directory. The events
    * table's event-time is normalized to the engine's canonical
    * representation on the way in — see [[canonicalEventTime]]; other
    * tables load as-is (a future table that happens to carry a `ts`
    * column is not governed by the events contract).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") canonicalEventTime(df) else df
  }

  /** Canonical event-time contract: downstream operators always see
    * `ts` as a LONG of epoch-nanoseconds, whatever the physical parquet
    * encoding was. Accepted encodings:
    *
    *   - TIMESTAMP(NANOS) parquet read as a long via
    *     `spark.sql.legacy.parquet.nanosAsLong` — already canonical;
    *   - TIMESTAMP / TIMESTAMP_NTZ (micro- or milli-second parquet,
    *     the overwhelmingly common case in the wild, and what the
    *     reference itself declares — `(Clone)
    *     kinesis_streaming_process_in_databricks.py:75-81`) —
    *     converted to epoch-nanos exactly (µs × 1000 cannot overflow:
    *     epoch-µs ≈ 1.8e15, × 1000 ≪ Long.MaxValue).
    *
    * The NTZ→LTZ cast inside `unix_micros` uses the session timezone;
    * every entry point (Verify/Bench/PlanAudit/TestSpark) pins it to
    * UTC, so the recovered integer is the raw parquet value — the same
    * number DuckDB's `epoch_us(ts)` yields on the oracle side.
    *
    * Anything else fails fast with a named error instead of letting 31
    * queries die of `DATATYPE_MISMATCH` one by one (round-7 lesson:
    * fixture drift must be loud).
    */
  def canonicalEventTime(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case None | Some(LongType) => df
      case Some(TimestampType) =>
        // LTZ is an instant; unix_micros is session-tz-independent
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        // the NTZ→LTZ cast interprets the wall-clock in the session
        // timezone: only UTC recovers the raw parquet integer. Fail
        // loudly rather than silently shifting every event by the
        // caller's zone offset.
        val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
        require(tz == "UTC",
          s"canonicalEventTime on a TIMESTAMP_NTZ ts requires " +
            s"spark.sql.session.timeZone=UTC (got $tz)")
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalArgumentException(
          s"events.ts: expected LongType (epoch-ns, nanosAsLong) or " +
            s"TimestampType/TimestampNTZType, got $other — fixture " +
            "drift; extend Sources.canonicalEventTime for this encoding")
    }

  /** Events restricted to `[fromNs, toNs)` canonical event-time, with
    * the range predicate applied to the PHYSICAL ts column BEFORE
    * normalization. Filtering after [[canonicalEventTime]] would put
    * the predicate above a projection the scan cannot see through —
    * no PushedFilters, no row-group stats pruning, a full scan at
    * 100 TB. Here the physical filter is a (boundary-rounded) superset
    * prune that reaches the parquet reader, and the exact canonical
    * bound is re-applied after normalization.
    */
  def eventsBetween(spark: SparkSession, sfDir: String,
      fromNs: Long, toNs: Long): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val pruned = raw.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        raw.filter(col("ts") >= fromNs && col("ts") < toNs)
      case Some(t) if t == TimestampType || t == TimestampNTZType =>
        // floor/ceil to the containing microseconds so the physical
        // prune never drops a boundary row the exact filter would keep.
        // Ceiling computed as floorDiv(toNs-1)+1 rather than
        // floorDiv(toNs+999): the +999 form overflows for toNs near
        // Long.MaxValue (a plausible "unbounded" sentinel), wrapping the
        // physical prune negative and silently emptying the scan. For
        // toNs == Long.MinValue the exact range is empty, so any finite
        // prune bound is a valid superset.
        val fromUs = Math.floorDiv(fromNs, 1000L)
        val toUs =
          if (toNs == Long.MinValue) Long.MinValue / 1000L
          else Math.floorDiv(toNs - 1L, 1000L) + 1L
        raw.filter(col("ts") >= timestamp_micros(lit(fromUs)).cast(t) &&
          col("ts") < timestamp_micros(lit(toUs)).cast(t))
      case _ => raw
    }
    canonicalEventTime(pruned)
      .filter(col("ts") >= fromNs && col("ts") < toNs)
  }

  /** Load every table and register a temp view per table so DataFrame and
    * `spark.sql` entry points stay in sync (SURVEY.md §3.3).
    */
  def loadAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    tableNames.map { n =>
      val df = table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap

  /** One line per table: the RAW on-disk schema (before any
    * normalization). Printed by Verify/Bench at startup so a fixture
    * regeneration that changes an encoding is visible in every run log
    * instead of surfacing as dozens of unrelated analysis errors
    * (round-7 lesson).
    */
  def schemaManifest(spark: SparkSession, sfDir: String): Seq[String] =
    tableNames.map { n =>
      val line =
        try spark.read.parquet(s"$sfDir/$n.parquet").schema.simpleString
        catch {
          case scala.util.control.NonFatal(e) =>
            s"unreadable: ${e.getMessage}"
        }
      s"[schema] $n: $line"
    }

  /** Batch JSON scan with an explicit schema — the production path.
    * Schema inference (`inferJson`) is kept as a tested option because the
    * reference's batch side relies on it.
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Batch JSON scan with schema inference (reference parity:
    * `(Clone) mount_s3_in_databricks.py:69-74`). Not for 100 TB paths —
    * inference is an extra full read.
    */
  def inferJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("inferSchema", "true").json(path)

  /** Decode a stream envelope: a single binary/string `data` column
    * holding one JSON record per row (the Kinesis/Kafka wire shape) into
    * typed columns. Works identically for batch and streaming frames.
    */
  def decodeEnvelope(envelope: DataFrame, schema: StructType): DataFrame =
    envelope
      .select(from_json(col("data").cast("string"), schema).as("data"))
      .select(col("data.*"))

  /** Streaming file source with the `(data string)` envelope, mirroring
    * the reference's Kinesis source shape
    * (`(Clone) kinesis_streaming_process_in_databricks.py:34-42`).
    */
  def streamEnvelope(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "data", org.apache.spark.sql.types.StringType))))
      .json(dir)

  /** Connector profile: the ONLY thing that changes between a laptop
    * run and a cloud deployment. Pipelines are written once against the
    * `(data string)` envelope; the profile decides whether that
    * envelope comes from JSON files (offline/tests) or a message bus
    * (whose jars ship with the cluster), and which sink format the
    * cleaned frames take.
    */
  final case class IoProfile(
      sourceFormat: String,
      sourceOptions: Map[String, String],
      sinkFormat: String)

  object IoProfile {
    /** Offline/test profile: JSON envelope files in, parquet out. */
    def localFiles(dir: String): IoProfile =
      IoProfile("json", Map("path" -> dir), "parquet")

    /** Cloud profile: Kafka topic in, Delta out. Compiles and builds
      * everywhere; `.load()` resolves the connector jar at runtime.
      */
    def kafka(brokers: String, topic: String): IoProfile =
      IoProfile("kafka",
        Map("kafka.bootstrap.servers" -> brokers, "subscribe" -> topic),
        "delta")
  }

  /** Profile-driven streaming envelope source: same downstream code for
    * every profile. File sources carry the envelope schema explicitly;
    * bus sources (kafka/kinesis) expose the wire `value`, cast to the
    * envelope column.
    */
  def streamEnvelopeVia(spark: SparkSession, profile: IoProfile): DataFrame = {
    val reader = spark.readStream.format(profile.sourceFormat)
    profile.sourceOptions.foreach { case (k, v) => reader.option(k, v) }
    profile.sourceFormat match {
      case "json" | "text" | "csv" | "parquet" =>
        reader.schema(StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "data", org.apache.spark.sql.types.StringType))))
          .load().select(col("data"))
      case _ => // kafka/kinesis wire shape: (key, value, ...) binary
        reader.load().select(col("value").cast("string").as("data"))
    }
  }
}
