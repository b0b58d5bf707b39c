package graft.api

import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for the iterative kernels (PageRank /
  * HyperBall / k-core fixpoints, MMR rounds, e41/e42 grids, p14's
  * staged flags): every per-round generation is cut through here
  * instead of calling `localCheckpoint` directly.
  *
  * Why a seam (r14 verdict item 6): `localCheckpoint(eager = true)` —
  * the default — stores the truncated lineage's blocks on EXECUTORS
  * with no recompute path behind them, which is exactly right on
  * local[32] (and the fastest option on any healthy cluster) but
  * wrong as the only option on a real 1000-executor job: one lost
  * executor loses blocks that have no lineage to rebuild from, and
  * the whole job dies mid-fixpoint. Production iterative jobs use
  * RELIABLE checkpoints (HDFS/S3 dir) for exactly this reason, at
  * the cost of a write+read per round. Same environment-not-code
  * split as [[graft.io.Sources.IoProfile]]: the session conf picks
  * the strategy, every kernel call site stays identical.
  *
  * Session conf:
  *   - `spark.graft.checkpoint.mode`: `local` (default) | `reliable`
  *   - `spark.graft.checkpoint.dir`: required for `reliable`; applied
  *     to `SparkContext.setCheckpointDir` on first use if unset.
  *
  * The default mode produces the byte-identical plan shape the plan
  * golden pins (`LogicalRDD` over an eagerly checkpointed RDD);
  * `reliable` produces the same `LogicalRDD` shape over a
  * `ReliableCheckpointRDD`, so downstream frees via
  * [[org.apache.spark.sql.GraftSqlBridge.unpersistCheckpointed]] work
  * unchanged in both modes (CheckpointStrategySpec runs a kernel
  * through the reliable path end-to-end).
  */
object Checkpoints {

  val ModeKey = "spark.graft.checkpoint.mode"
  val DirKey = "spark.graft.checkpoint.dir"

  /** Truncate `df`'s lineage eagerly under the session's configured
    * strategy. `local` = `localCheckpoint(true)`; `reliable` =
    * `checkpoint(true)` against `spark.graft.checkpoint.dir`.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty) {
          val dir = spark.conf.getOption(DirKey).getOrElse(throw
            new IllegalArgumentException(
              s"$ModeKey=reliable requires $DirKey (an HDFS/S3/posix " +
                "dir every executor can reach)"))
          spark.sparkContext.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case "local" => df.localCheckpoint(eager = true)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local|reliable, got '$other'")
    }
  }

  /** `df.cutLineage` — suffix form so kernel call sites read like the
    * `localCheckpoint` calls they replace.
    */
  implicit final class LineageOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = cut(df)
  }
}
