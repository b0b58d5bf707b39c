package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables

/** Tables.upsert must carry MERGE semantics, not "coalesce per column":
  * a matched update row wins wholesale (its NULLs null out base
  * values), and a duplicate update key — which would fan out its base
  * row — fails loudly instead of silently multiplying rows.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, Option("alice"), Option(10L)),
    (2L, Option("bob"), Option(20L)),
    (3L, Option("carol"), Option(30L))).toDF("id", "name", "score")

  test("upsert updates matched keys, inserts new keys, keeps the rest") {
    val updates = Seq(
      (2L, Option("bobby"), Option(25L)),
      (4L, Option("dave"), Option(40L))).toDF("id", "name", "score")
    val got = Tables.upsert(base, updates, "id")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "alice", 10L), (2L, "bobby", 25L),
      (3L, "carol", 30L), (4L, "dave", 40L)))
  }

  test("a NULL in an update column nulls the base value (update wins wholesale)") {
    val updates = Seq((2L, Option.empty[String], Option(99L)))
      .toDF("id", "name", "score")
    val got = Tables.upsert(base, updates, "id")
      .filter($"id" === 2L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(got.toSeq == Seq((2L, None, 99L)))
  }

  test("diff classifies added / removed / changed / unchanged keys") {
    val before = Seq(
      (1L, Option("alice"), Option(10L)),
      (2L, Option("bob"), Option(20L)),
      (3L, Option("carol"), Option(30L))).toDF("id", "name", "score")
    val after = Seq(
      (1L, Option("alice"), Option(10L)),   // unchanged
      (2L, Option("bob"), Option(21L)),     // changed
      (4L, Option("dave"), Option(40L)))    // added; 3 removed
    .toDF("id", "name", "score")
    val got = Tables.diff(before, after, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("compact merges a splintered table into few right-sized files, content intact") {
    val in = java.nio.file.Files.createTempDirectory("graft_compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out").toString + "/t"
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    docs.repartition(16).write.mode("overwrite").parquet(in) // splinter: 16 small files
    def partFiles(p: String) =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .count(_.getName.startsWith("part-"))
    assert(partFiles(in) == 16)
    val n = Tables.compact(spark, in, out, targetFileBytes = 64L * 1024)
    assert(n < 16, s"expected fewer files than 16, got $n")
    assert(partFiles(out) == n, s"requested $n files, found ${partFiles(out)}")
    val a = docs.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(out).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b, "compaction must not change table content")
  }

  test("clustered compaction restores pruning power and refreshes the zone map") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("graft_ccomp_in").toString
    val outBase = java.nio.file.Files.createTempDirectory("graft_ccomp_out").toString
    val out = outBase + "/t"
    val stats = outBase + "/stats"
    val ev = graft.io.Sources.table(spark, TestSpark.sf0001, "events")
      .withColumn("us", expr("ts div 1000"))
    // micro-batch debris: 12 files partitioned on a non-time key, so
    // every file's time range spans the whole table
    ev.repartition(12, col("event_id")).write.mode("overwrite").parquet(in)
    val n = Tables.compactClustered(spark, in, out, "us", stats,
      targetFileBytes = 24L * 1024)
    val statFrame = spark.read.parquet(stats).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(statFrame.length == n, s"one stats row per file: $n vs ${statFrame.length}")
    // stats must equal the actual per-file min/max on disk
    val actual = graft.io.ZoneMap.stats(spark, out, "us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(statFrame.toSet == actual)
    // range clustering: files ordered by min must not interleave
    // (non-overlapping up to boundary-duplicate keys)
    val ranges = statFrame.map(s => (s._2, s._3)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB,
        s"file ranges overlap after clustering: $hiA > $loB")
      case _ => ()
    }
    // content identical
    val a = ev.orderBy("event_id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(out).orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b, "clustered compaction must not change table content")
    // the fragmented layout's stats prune nothing for a narrow window;
    // the compacted one's must skip most files
    val span = ev.agg(min("us"), max("us")).head()
    val (lo, hi) = (span.getLong(0), span.getLong(0) +
      (span.getLong(1) - span.getLong(0)) / 10)
    val fragStats = graft.io.ZoneMap.stats(spark, in, "us")
    val fragTouched = fragStats.filter(col("max_us") >= lo && col("min_us") < hi).count()
    val compTouched = statFrame.count(s => s._3 >= lo && s._2 < hi)
    assert(fragTouched == 12L, s"fragmented layout should touch all files, got $fragTouched")
    assert(compTouched < n, s"compacted layout should skip files: $compTouched of $n")
  }

  test("applyCdc: update, insert, delete, and delete-of-absent-key no-op in one batch") {
    val changes = Seq(
      (2L, Option("bobby"), Option(25L), "U"),  // update
      (4L, Option("dave"), Option(40L), "U"),   // insert
      (3L, Option.empty[String], Option.empty[Long], "D"), // delete
      (9L, Option.empty[String], Option.empty[Long], "D")  // absent: no-op
    ).toDF("id", "name", "score", "op")
    val got = Tables.applyCdc(base, changes, "id", "op")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "alice", 10L), (2L, "bobby", 25L),
      (4L, "dave", 40L)), got.toString)
  }

  test("applyCdc: a bad op value raises instead of silently passing through") {
    val changes = Seq((2L, Option("x"), Option(1L), "X"))
      .toDF("id", "name", "score", "op")
    val e = intercept[Exception] {
      Tables.applyCdc(base, changes, "id", "op").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bad op value")), e.toString)
  }

  test("duplicate update keys raise instead of fanning out the base row") {
    val updates = Seq(
      (2L, Option("x"), Option(1L)),
      (2L, Option("y"), Option(2L))).toDF("id", "name", "score")
    val e = intercept[Exception] {
      Tables.upsert(base, updates, "id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate update key")), e.toString)
  }

  test("schema-evolved scan: union schema + null backfill on the old generation") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sf0001
    val loc = graft.ops.JoinOps.ensureEvolved(spark, dir)
    // the old generation was written without the column at all
    val v1 = spark.read.parquet(s"$loc/v1")
    assert(!v1.columns.contains("o_channel"), v1.columns.mkString(","))
    // the merged read surfaces the union schema...
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$loc/v1", s"$loc/v2")
    assert(merged.columns.contains("o_channel"), merged.columns.mkString(","))
    // ...with nulls exactly where the old files are
    val nullChannel = merged.filter(col("o_channel").isNull).count()
    assert(nullChannel == v1.count(), s"$nullChannel vs ${v1.count()}")
    val preCutoffNonNull = merged
      .filter(col("o_orderdate") < "1996-01-01" && col("o_channel").isNotNull)
      .count()
    assert(preCutoffNonNull == 0)
  }
}
