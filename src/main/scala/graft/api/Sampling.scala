package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  *
  * The split is a pure function of the row's id — `md5(id)` mapped to a
  * bucket in [0, 256) — NOT `rand()`: reruns, retries, engines, and
  * late-arriving partitions all agree on every row's assignment, which
  * is what makes a train/test split reproducible on a 100 TB corpus
  * (and lets an external system re-derive membership from the id
  * alone). No shuffle: assignment is a codegen'd map expression.
  */
object Sampling {

  /** Hash bucket in [0, 256): first two hex chars of md5(id-as-string).
    * Built from `instr`/`substr` only, so any ANSI-ish engine computes
    * the identical bucket.
    */
  def hashBucket(id: Column): Column = {
    val hex = md5(id.cast("string"))
    def nibble(pos: Int): Column =
      instr(lit("0123456789abcdef"), substring(hex, pos, 1)) - 1
    nibble(1) * 16 + nibble(2)
  }

  /** Adds a `split` column: 'train' for buckets below
    * `round(trainFraction * 256)`, 'test' otherwise.
    */
  def withTrainTestSplit(df: DataFrame, idCol: String,
      trainFraction: Double = 0.8): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1, s"bad fraction $trainFraction")
    val threshold = math.round(trainFraction * 256).toInt
    df.withColumn("split",
      when(hashBucket(col(idCol)) < threshold, "train").otherwise("test"))
  }

  /** Deterministic fractional sample: keeps ids whose bucket falls
    * below `round(fraction * 256)` — the same rows every run.
    */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"bad fraction $fraction")
    val threshold = math.round(fraction * 256).toInt
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}
