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

  test("t30 water-filling invariants: sum(alloc) == budget, alloc <= supply, capped sources get the even share") {
    val rows = graft.ops.TextOps.t30.fn(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val budget = rows.map(_._2).sum / 2
    assert(rows.map(_._3).sum == budget,
      s"sum(alloc)=${rows.map(_._3).sum} != budget=$budget")
    rows.foreach { case (s, cnt, alloc) =>
      assert(alloc <= cnt, s"$s allocated $alloc over supply $cnt")
    }
    // capped sources (alloc < supply) all sit within 1 of each other —
    // the egalitarian property that distinguishes UniMax from t20
    val capped = rows.filter { case (_, cnt, alloc) => alloc < cnt }.map(_._3)
    if (capped.nonEmpty)
      assert(capped.max - capped.min <= 1, capped.mkString(","))
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and is deterministic at sf0.001") {
      val a = q.fn(spark, TestSpark.sf0001).collect()
      val b = q.fn(spark, TestSpark.sf0001).collect()
      assert(a.toSeq == b.toSeq, s"${q.name} not deterministic across runs")
    }
  }
}
