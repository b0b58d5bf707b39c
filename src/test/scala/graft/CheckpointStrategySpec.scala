package graft

import org.scalatest.funsuite.AnyFunSuite

/** The checkpoint-strategy seam (r14 verdict item 6): iterative
  * kernels cut per-round lineage through [[graft.api.Checkpoints]],
  * whose default (`local`) is `localCheckpoint(true)` — fastest, and
  * the mode every gate and the plan golden run under — while
  * `reliable` routes the SAME call sites through
  * `Dataset.checkpoint(eager)` against a real checkpoint dir, the
  * configuration a 1000-executor job needs (executor loss must not
  * kill a fixpoint whose truncated lineage has no recompute path).
  * This spec drives a real kernel end-to-end through the reliable
  * path and proves (a) bit-identical results to local mode, (b) the
  * checkpoint dir actually received the RDD files — i.e. the mode
  * switch is real, not a relabeled local checkpoint.
  */
class CheckpointStrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pageRankConvergence is bit-identical through the reliable checkpoint path, and the dir receives RDD files") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L))
      .toDF("pa", "pb")
    def run(): Seq[(Int, Long, Long, Long)] =
      graft.api.Graph.pageRankConvergence(e, iterations = 3)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    val local = run()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toString
    spark.conf.set(graft.api.Checkpoints.ModeKey, "reliable")
    spark.conf.set(graft.api.Checkpoints.DirKey, dir)
    try {
      val reliable = run()
      assert(reliable == local,
        s"reliable-mode kernel diverged:\n$reliable\nvs\n$local")
      def count(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(count).sum else 1
      assert(count(new java.io.File(dir)) > 0,
        s"reliable mode wrote nothing under $dir — the seam did not " +
          "route through Dataset.checkpoint")
    } finally {
      spark.conf.set(graft.api.Checkpoints.ModeKey, "local")
      spark.conf.unset(graft.api.Checkpoints.DirKey)
      // SparkContext.setCheckpointDir is STICKY (no unset API), so the
      // context keeps pointing at this temp dir for the rest of the
      // JVM — harmless while mode=local (nothing routes through it;
      // the second test below handles the already-set case), but the
      // shared-session coupling means this spec must not run in
      // parallel with suites that flip the mode. Delete the RDD files
      // now that they have been asserted, so the temp tree does not
      // outlive the test (r15 ADVICE).
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("reliable mode without a dir fails loudly; unknown mode rejected") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    spark.conf.set(graft.api.Checkpoints.ModeKey, "reliable")
    try {
      // only when the context has no checkpoint dir yet can the DirKey
      // requirement fire; after the first test set one, so exercise the
      // unknown-mode arm unconditionally and the DirKey arm only if
      // still unset (fresh-JVM runs of this spec alone hit both).
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val ex = intercept[IllegalArgumentException] {
          graft.api.Checkpoints.cut(df)
        }
        assert(ex.getMessage.contains("checkpoint.dir"), ex.getMessage)
      }
      spark.conf.set(graft.api.Checkpoints.ModeKey, "nonsense")
      val ex2 = intercept[IllegalArgumentException] {
        graft.api.Checkpoints.cut(df)
      }
      assert(ex2.getMessage.contains("local|reliable"), ex2.getMessage)
    } finally {
      spark.conf.set(graft.api.Checkpoints.ModeKey, "local")
    }
  }
}
