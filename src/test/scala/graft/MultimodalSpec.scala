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
}
