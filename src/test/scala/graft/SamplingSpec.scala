package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Sampling
import graft.io.Sources

/** Deterministic sampling: same rows every run, monotone nesting
  * (a 50% sample is a subset of an 80% sample), and a split whose
  * fractions land near the target without any RNG state.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Sources.table(spark, TestSpark.sf0001, "documents")

  test("train/test split is deterministic and near the target fraction") {
    val a = Sampling.withTrainTestSplit(docs, "doc_id", 0.8)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sampling.withTrainTestSplit(docs, "doc_id", 0.8)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    val total = a.values.sum
    assert(total == 500)
    val trainFrac = a("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
  }

  test("samples nest: smaller fractions are subsets of larger ones") {
    val half = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val most = Sampling.deterministicSample(docs, "doc_id", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.nonEmpty && half.size < most.size)
    assert(half.subsetOf(most))
  }

  test("bucket bounds: every bucket is in [0, 256)") {
    import org.apache.spark.sql.functions.col
    val range = docs.select(Sampling.hashBucket(col("doc_id")).as("b"))
      .agg(org.apache.spark.sql.functions.min("b"),
        org.apache.spark.sql.functions.max("b"))
      .collect().head
    assert(range.getInt(0) >= 0 && range.getInt(1) < 256, range.toString)
  }

  test("uniform32 matches a hand-computed md5 prefix") {
    import org.apache.spark.sql.functions.expr
    // md5("42") = a1d0c6e83f027327d8461063f4ac58a6 → first 8 nibbles
    val expected = java.lang.Long.parseLong("a1d0c6e8", 16)
    val got = spark.range(42, 43)
      .select(expr(Sampling.uniform32Sql("id")).as("u"))
      .collect().head.getLong(0)
    assert(got == expected, s"got $got expected $expected")
  }

  test("priority sample: k smallest u/w per stratum, heavy-doc biased") {
    import org.apache.spark.sql.functions.{col, expr, row_number}
    import org.apache.spark.sql.expressions.Window
    val base = docs.select("source", "doc_id", "n_chars")
    val sample = Sampling.prioritySample(base, "doc_id", "n_chars", "source", 3)
      .select("source", "doc_id", "priority")
    // equals the canonical window formulation over the same key
    val keyed = base.withColumn("priority",
      expr(Sampling.priorityKeySql("doc_id", "n_chars")))
    val w = Window.partitionBy("source").orderBy(col("priority"), col("doc_id"))
    val windowed = keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("source", "doc_id", "priority")
    assert(sample.exceptAll(windowed).isEmpty && windowed.exceptAll(sample).isEmpty)
    // weighted draw favors heavy docs: sampled mean length beats corpus mean
    val sampledMean = sample.join(base, Seq("source", "doc_id"))
      .agg(org.apache.spark.sql.functions.avg("n_chars")).collect().head.getDouble(0)
    val corpusMean = base
      .agg(org.apache.spark.sql.functions.avg("n_chars")).collect().head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean should exceed corpus mean $corpusMean")
  }
}
