package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the library surface behind the
  * token-budget / packing / chunking / quality-gate queries (t14, t17,
  * t22, t26) and p01's admission stage. Same contract as [[Features]]:
  * the registered queries call THESE functions, so the DuckDB oracle
  * verifies the public API end to end.
  *
  * Scale contract: every function is one window or one map stage over
  * a frame already reduced to (group, order, measure) grain — the
  * corpus text itself never shuffles here. Group keys (source, lang)
  * are the unit of parallelism; admission and gating decisions are
  * integer arithmetic so they reproduce across engines and reruns.
  */
object Corpus {

  /** Prefix-sum token-budget admission (t26's rule, p01's stage 4):
    * adds `cum_tokens` and keeps rows while the running per-group total
    * stays within `budget`, in deterministic `order`.
    *
    * Two-phase prefix sum, NOT one window per group: a group key with a
    * handful of values (~10 sources) would make a per-group running-sum
    * window sort each source's entire corpus in ONE task — parallelism
    * 10 at 100 TB. Instead rows are range-bucketed on the (numeric)
    * order column (`bucketWidth` ids per bucket): phase 1 cumulates
    * within (group, bucket) — parallelism = groups × buckets; phase 2
    * cumulates the per-bucket TOTALS per group — the only serial step,
    * over a frame `bucketWidth`× smaller than the corpus; phase 3 joins
    * the bucket offsets back on (group, bucket), co-partitioned with
    * phase 1's shuffle. All sums are exact BIGINT adds (associative),
    * so the result is bit-identical to the single-window form — the
    * oracle keeps the canonical one-window SQL and hash-parity proves
    * the decomposition.
    */
  def tokenBudget(df: DataFrame, group: String, order: String,
      nTokens: String, budget: Long, bucketWidth: Long = 4096L): DataFrame = {
    require(bucketWidth >= 1, s"bad bucketWidth $bucketWidth")
    val withB = df.withColumn("_tb_bucket",
        expr(s"CAST($order AS BIGINT) div $bucketWidth"))
      .withColumn("_tb_cum_in",
        sum(col(nTokens)).over(
          Window.partitionBy(col(group), col("_tb_bucket")).orderBy(order)))
    val offsets = withB.groupBy(col(group), col("_tb_bucket"))
      .agg(sum(col(nTokens)).as("_tb_total"))
      .withColumn("_tb_off",
        coalesce(
          sum(col("_tb_total")).over(
            Window.partitionBy(group).orderBy("_tb_bucket")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(group), col("_tb_bucket"), col("_tb_off"))
    withB.join(offsets, Seq(group, "_tb_bucket"))
      .withColumn("cum_tokens", (col("_tb_off") + col("_tb_cum_in")).cast("bigint"))
      .filter(col("cum_tokens") <= budget)
      .drop("_tb_bucket", "_tb_cum_in", "_tb_off")
  }

  /** Greedy prefix-sum packing (t14): assigns each row the `bin` its
    * running token total starts in — the context-window assembly
    * decision. Bins overfill by at most one document (the standard
    * greedy bound); a bin's id is `floor(prefix_sum / budget)`.
    */
  def packBins(df: DataFrame, group: String, order: String,
      nTokens: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer div, not double floor-division: both operands are
    // non-negative BIGINTs, so `div` == floor and stays exact past
    // 2^53 where a double quotient would misround bin boundaries
    df.withColumn("cum", sum(col(nTokens)).over(w))
      .withColumn("bin",
        expr(s"CAST((cum - $nTokens) div $budget AS INT)"))
  }

  /** Sliding-window chunking with overlap (t17, the RAG chunker):
    * `window`-token chunks at `stride` spacing, tail clipped. Input is
    * (id, tokens-array); output one row per chunk with its md5 — a
    * zero-shuffle generator stage (the fan-out is bounded by each
    * document's own length).
    */
  def chunk(df: DataFrame, id: String, tokens: String,
      window: Int, stride: Int): DataFrame =
    df.select(col(id), col(tokens).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("nch", lit(1L) +
        when(col("n") > window, floor((col("n") - window + (stride - 1)) / stride))
          .otherwise(lit(0L)))
      .select(col(id), col("t"), col("n"),
        explode(sequence(lit(0L), col("nch") - 1)).as("chunk_idx"))
      .select(col(id), col("chunk_idx"),
        least(lit(window.toLong), col("n") - col("chunk_idx") * stride)
          .as("n_tokens"),
        md5(concat_ws(" ", slice(col("t"),
          (col("chunk_idx") * stride + 1).cast("int"),
          least(lit(window), col("n") - col("chunk_idx") * stride).cast("int"))))
          .as("chunk_md5"))

  /** Per-group top-fraction quality gate (t22, the CCNet shape): keeps
    * the best `keepNum/keepDen` of each group by `score`, with the
    * cutoff as INTEGER rank arithmetic (`rank * keepDen <= count *
    * keepNum`) — never a float percentile, so the kept set is
    * bit-stable across engines. Adds `rank_in_group`. One window
    * shuffle on the group key; the window only ranks, it never
    * materializes per-group arrays.
    */
  def qualityGate(df: DataFrame, group: String, score: String,
      tiebreak: String, keepNum: Int = 3, keepDen: Int = 10): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum, s"bad fraction $keepNum/$keepDen")
    val byG = Window.partitionBy(group)
    df.withColumn("rank_in_group",
        row_number().over(byG.orderBy(col(score).desc, col(tiebreak))))
      .withColumn("_cnt", count(lit(1)).over(byG))
      .filter(col("rank_in_group") * keepDen <= col("_cnt") * keepNum)
      .drop("_cnt")
  }
}
