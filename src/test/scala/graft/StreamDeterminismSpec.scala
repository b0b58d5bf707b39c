package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StreamQueries

/** Re-execution determinism of the oracled streaming queries: each
  * `fn` run is a pure function of the SF dir, so running it twice in
  * one session must produce byte-identical results. This pins the
  * round-10 postmortem of qs4's one-off hash miss — the fix (per-run
  * hermetic scratch roots, [[graft.io.Scratch.runRoot]]) guarantees
  * no other process can perturb a run, and this spec guarantees the
  * query itself has no run-order or leftover-state dependence (the
  * second run starts from the first run's on-disk leftovers and must
  * wipe them completely).
  */
class StreamDeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def snapshot(q: graft.ops.OpQuery): Seq[String] =
    q.fn(spark, TestSpark.sf0001)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString("|"))
      .toSeq

  for (q <- Seq(StreamQueries.qs3, StreamQueries.qs4, StreamQueries.qs5)) {
    test(s"${q.name}: two executions in one session are identical") {
      val first = snapshot(q)
      val second = snapshot(q)
      assert(first.nonEmpty, s"${q.name} returned no rows")
      assert(first == second,
        s"${q.name} diverged between runs: " +
          s"${first.diff(second).take(3)} vs ${second.diff(first).take(3)}")
    }
  }

  test("qs4 fold equals the flat whole-table aggregate (batch twin)") {
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.qs4.fn(spark, TestSpark.sf0001)
    val flat = graft.io.Sources.table(spark, TestSpark.sf0001, "events")
      .groupBy(substring(col("event_type"), 1, 1).as("etype_class"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("value").cast("decimal(18,2)")) * lit(100))
          .cast("bigint").as("s_cents"))
      .orderBy("etype_class")
    assert(streamed.collect().toSeq == flat.collect().toSeq)
  }
}
