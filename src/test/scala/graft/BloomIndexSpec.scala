package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.BloomIndex

/** File-level Bloom index: pruning must be a strict file subset and
  * invisible behind the caller's equality predicate.
  */
class BloomIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def build(): (String, String) = {
    val tmp = Files.createTempDirectory("bloomidx").toString
    val data = s"$tmp/data"
    val stats = s"$tmp/stats"
    // unique keys, laid out so each file holds a distinct key slice —
    // the "high-cardinality key scattered across files" shape the
    // index exists for
    val df = (0 until 4000).map(i => (i.toLong, i % 8)).toDF("k", "gid")
    df.repartitionByRange(8, col("gid")).write.parquet(data)
    BloomIndex.build(spark, data, "k", stats, bits = 1 << 12, hashes = 4)
    (data, stats)
  }

  test("point lookup reads a strict file subset and equals the full scan") {
    val (data, stats) = build()
    val full = spark.read.parquet(data)
    val pruned = BloomIndex.prunedRead(spark, data, stats, "13",
      bits = 1 << 12, hashes = 4)
    assert(pruned.inputFiles.toSet.subsetOf(full.inputFiles.toSet))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no pruning: ${pruned.inputFiles.length} of ${full.inputFiles.length} files")
    val a = pruned.filter($"k" === 13L).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = full.filter($"k" === 13L).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b && a == Set((13L, 5)))
  }

  test("a never-indexed key yields zero rows behind the kept predicate") {
    val (data, stats) = build()
    val pruned = BloomIndex.prunedRead(spark, data, stats, "999999",
      bits = 1 << 12, hashes = 4)
    // possible false-positive files may be read; the caller's equality
    // predicate — which pruning must never replace — sees nothing
    assert(pruned.columns.toSeq == Seq("k", "gid"))
    assert(pruned.filter($"k" === 999999L).count() == 0)
  }

  test("driver-side probe positions match the build-side expression") {
    // same md5 halves, same KM arithmetic: rebuild one key's positions
    // through Spark SQL and compare with the Scala probe
    val bits = 1 << 12
    val mod60 = 1152921504606846976L
    val viaSql = spark.sql(
      s"""SELECT ((CAST(conv(substr(md5('42'), 1, 15), 16, 10) AS BIGINT)
         |  + i * CAST(conv(substr(md5('42'), 17, 15), 16, 10) AS BIGINT)) % $mod60) % $bits
         |FROM (SELECT explode(sequence(0, 3)) AS i)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val viaDriver = graft.io.BloomIndex.positions("42", bits, 4)
    assert(viaSql == viaDriver)
  }
}
