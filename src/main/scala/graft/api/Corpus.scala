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
    * stays within `budget`, in deterministic `order`. One running-sum
    * window per group.
    */
  def tokenBudget(df: DataFrame, group: String, order: String,
      nTokens: String, budget: Long): DataFrame =
    df.withColumn("cum_tokens",
        sum(col(nTokens)).over(Window.partitionBy(group).orderBy(order)))
      .filter(col("cum_tokens") <= budget)

  /** Greedy prefix-sum packing (t14): assigns each row the `bin` its
    * running token total starts in — the context-window assembly
    * decision. Bins overfill by at most one document (the standard
    * greedy bound); a bin's id is `floor(prefix_sum / budget)`.
    */
  def packBins(df: DataFrame, group: String, order: String,
      nTokens: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(nTokens)).over(w))
      .withColumn("bin",
        floor((col("cum") - col(nTokens)) / lit(budget.toDouble)).cast("int"))
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
