package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Multimodal plumbing: the binary payload column, the partition-wise
  * (mapPartitions) extraction, and deterministic stubbed features.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media synthesis produces binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sf0001)
    val first = media.head()
    assert(first.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(first.media_type))
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val media = Multimodal.mediaFromDocuments(spark, TestSpark.sf0001)
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.length == 500)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.features.sameElements(y.features)
    })
    // L1-normalized histogram sums to ~1
    val s = a.head.features.map(_.toDouble).sum
    assert(math.abs(s - 1.0) < 1e-5)
    assert(a.head.features.length == 16)
  }

  test("binaryFile datasource round-trips the payloads bit-exactly") {
    val fromFiles = Multimodal.mediaFromBinaryFiles(spark, TestSpark.sf0001)
      .collect().sortBy(_.media_id)
    val expected = Multimodal.mediaFromDocuments(spark, TestSpark.sf0001)
      .filter(_.media_id % 10 == 0)
      .collect().sortBy(_.media_id)
    assert(fromFiles.length == expected.length && fromFiles.nonEmpty)
    assert(fromFiles.zip(expected).forall { case (f, e) =>
      f.media_id == e.media_id && f.media_type == e.media_type &&
        f.width == e.width && f.height == e.height &&
        f.payload.sameElements(e.payload)
    })
  }

  test("m02 aggregates binaryFile-sourced features per media type") {
    val out = Multimodal.m02.fn(spark, TestSpark.sf0001).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sum == 50) // every 10th of 500 docs
  }

  test("chunk dedup stats on hand-built payloads (m11 kernel)") {
    // chunkBytes=4: p1 = AAAA|BBBB|CC, p2 = AAAA|CC — shared chunks
    // AAAA and the short tail CC dedup across payloads
    val media = spark.createDataFrame(Seq(
      ("img", "AAAABBBBCC".getBytes("UTF-8")),
      ("img", "AAAACC".getBytes("UTF-8")))).toDF("media_type", "payload")
    val r = Multimodal.chunkDedupStats(media, chunkBytes = 4).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 2L, "n_media")
    assert(row.getLong(2) == 5L, "n_chunks")          // 3 + 2
    assert(row.getLong(3) == 3L, "distinct: AAAA BBBB CC")
    assert(row.getLong(4) == 16L, "logical: 2*4 + 4 + 2*2")
    assert(row.getLong(5) == 10L, "stored: 4 + 4 + 2")
    assert(row.getDouble(6) == 2.0 / 5.0, "dedup ratio (5-3)/5")
  }
}
