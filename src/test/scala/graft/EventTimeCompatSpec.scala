package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources
import graft.ops.EventOps

/** The canonical event-time contract (Sources.canonicalEventTime): the
  * same events rows written as epoch-nanos LONG, TIMESTAMP and
  * TIMESTAMP_NTZ parquet must load to identical frames and produce
  * identical query results — round 7 lost 31 queries to exactly this
  * encoding drifting underneath the engine.
  */
class EventTimeCompatSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** One tiny events table (schema-identical to the driver fixtures),
    * ts held as epoch-micros for exact reconstruction in every encoding.
    */
  private lazy val baseUs = Seq(
    // (event_id, ts_us, user_id, event_type, value, props)
    (1L, 1735689600000000L, 10L, "view", 1.5, """{"a":1}"""),
    (2L, 1735689612345678L, 10L, "click", 2.0, """{"a":2}"""),
    (3L, 1735693200000000L, 11L, "view", 0.5, """{"a":3}"""),
    (4L, 1735693212000000L, 12L, "purchase", 9.9, """{"a":4}"""),
    (5L, 1735696800000001L, 11L, "view", 1.0, """{"a":5}"""))
    .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")

  private def writeFixture(tsCol: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft_evt").toString
    baseUs.withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val longNsDir = writeFixture(col("ts_us") * 1000L)
  private lazy val ltzDir = writeFixture(timestamp_micros(col("ts_us")))
  private lazy val ntzDir =
    writeFixture(timestamp_micros(col("ts_us")).cast("timestamp_ntz"))

  test("all encodings load to the canonical long-nanos ts") {
    for (dir <- Seq(longNsDir, ltzDir, ntzDir)) {
      val ev = Sources.table(spark, dir, "events")
      assert(ev.schema("ts").dataType == LongType, s"dir=$dir")
      val ns = ev.orderBy("event_id").select("ts").as[Long].collect()
      assert(ns.toSeq == baseUs.orderBy("event_id").select($"ts_us" * 1000L)
        .as[Long].collect().toSeq, s"dir=$dir")
    }
  }

  test("an event-time query is encoding-invariant") {
    def run(dir: String): Seq[Row] =
      EventOps.e02.fn(spark, dir).collect().toSeq
    val expected = run(longNsDir)
    assert(expected.nonEmpty)
    assert(run(ltzDir) == expected)
    assert(run(ntzDir) == expected)
  }

  test("eventsBetween is encoding-invariant and boundary-exact") {
    // [second event inclusive, fifth event exclusive) in canonical ns
    val lo = 1735689612345678L * 1000L
    val hi = 1735696800000001L * 1000L
    for (dir <- Seq(longNsDir, ltzDir, ntzDir)) {
      val got = Sources.eventsBetween(spark, dir, lo, hi)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(2L, 3L, 4L), s"dir=$dir")
    }
  }

  test("eventsBetween with an unbounded-sentinel upper bound keeps every row") {
    // toNs = Long.MaxValue: the old `toNs + 999` ceiling wrapped negative
    // and the physical prune silently emptied the scan on timestamp
    // encodings. Long.MinValue lower bound exercises the mirrored edge.
    for (dir <- Seq(longNsDir, ltzDir, ntzDir)) {
      val got = Sources.eventsBetween(spark, dir, Long.MinValue, Long.MaxValue)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L, 4L, 5L), s"dir=$dir")
      // degenerate empty range at the sentinel floor must not overflow
      assert(Sources.eventsBetween(spark, dir, Long.MinValue, Long.MinValue)
        .count() == 0L, s"dir=$dir")
    }
  }

  test("an unsupported ts encoding fails fast with a named error") {
    val dir = writeFixture(col("ts_us").cast("string"))
    val e = intercept[IllegalArgumentException] {
      Sources.table(spark, dir, "events")
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
