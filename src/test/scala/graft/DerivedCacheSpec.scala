package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.DerivedCache

/** Derived-artifact staleness: every target/-cached build (bucketed
  * twins, partitioned/zone-mapped layouts, media staging, edge list)
  * must rebuild when its source fixture changes — a regenerated
  * fixture serving stale derived data into a value-oracled query is
  * the silent-wrong-answer failure class round 7 hit.
  */
class DerivedCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint tracks source file changes and table sets") {
    val dir = Files.createTempDirectory("graft_dc").toString
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val fp1 = DerivedCache.fingerprint(dir, Seq("t"))
    assert(fp1 == DerivedCache.fingerprint(dir, Seq("t")), "not stable")
    assert(fp1 != DerivedCache.fingerprint(dir, Seq("missing")),
      "absent table must fingerprint differently")
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(fp1 != DerivedCache.fingerprint(dir, Seq("t")),
      "rewrite must change the fingerprint")
  }

  test("isFresh requires ready marker AND matching stamp") {
    val loc = Files.createTempDirectory("graft_dc_art").toString
    val ready = s"$loc/_SUCCESS"
    assert(!DerivedCache.isFresh(loc, ready, "fp"))
    Files.createFile(Paths.get(ready))
    assert(!DerivedCache.isFresh(loc, ready, "fp"),
      "unstamped artifact (pre-guard build) must count as stale")
    DerivedCache.stamp(loc, "fp")
    assert(DerivedCache.isFresh(loc, ready, "fp"))
    assert(!DerivedCache.isFresh(loc, ready, "fp2"),
      "changed source fingerprint must invalidate")
  }

  test("ensurePartitioned rebuilds when the events fixture is regenerated") {
    val dir = Files.createTempDirectory("graft_dc_part").toString
    def writeEvents(ids: Seq[Long]): Unit =
      ids.map(i => (i, i * 1000000000L, i, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    writeEvents(Seq(1L, 2L))
    val loc = graft.ops.JoinOps.ensurePartitioned(spark, dir)
    assert(spark.read.parquet(loc).count() == 2L)
    writeEvents(Seq(3L, 4L, 5L))
    assert(spark.read.parquet(graft.ops.JoinOps.ensurePartitioned(spark, dir))
      .count() == 3L, "stale partitioned layout served after regeneration")
  }

  test("media staging clears stale payload files on rebuild") {
    val dir = Files.createTempDirectory("graft_dc_media").toString
    def writeDocs(ids: Seq[Long]): Unit =
      ids.map(i => (i, s"text-$i", "en", "web", 6L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeDocs(Seq(10L, 20L, 11L))
    val out = graft.ops.Multimodal.ensureMediaFiles(spark, dir)
    def bins(): Set[String] =
      Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.endsWith(".bin")).toSet
    assert(bins() == Set("media_10.bin", "media_20.bin"))
    writeDocs(Seq(30L, 31L))
    graft.ops.Multimodal.ensureMediaFiles(spark, dir)
    assert(bins() == Set("media_30.bin"),
      "stale media payloads leaked into the staging dir after regeneration")
  }
}
