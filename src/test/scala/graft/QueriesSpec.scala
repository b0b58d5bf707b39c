package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + determinism over the whole operator registry at sf0.001: every
  * registered query must run, and must produce identical results on a
  * second execution (the oracle hash-compare depends on it).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled query has matching column names in name registry") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and is deterministic at sf0.001") {
      val a = q.fn(spark, TestSpark.sf0001).collect()
      val b = q.fn(spark, TestSpark.sf0001).collect()
      assert(a.toSeq == b.toSeq, s"${q.name} not deterministic across runs")
    }
  }
}
