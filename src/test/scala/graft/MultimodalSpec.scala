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

  test("m02 aggregates extracted features per media type") {
    val out = Multimodal.m02.fn(spark, TestSpark.sf0001).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sum == 500)
  }
}
