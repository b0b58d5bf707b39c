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

  /** Round-robin interleaved batch assignment (m09): rows are ordered
    * within their group by `order`, then groups take turns filling
    * global slots — slot = ordinal * nGroups + groupIndex — and
    * consecutive `batchSize` slots form a batch. This is the training
    * batch composer for mixed-modality (or mixed-source) data: every
    * batch carries an even split of each group while all groups still
    * have rows, and the assignment is a pure function of (group,
    * order), so re-running it on the same corpus reproduces the same
    * batches. When group sizes are unequal the exhausted groups leave
    * deterministic holes (slot numbering is unchanged), so tail
    * batches shrink rather than reshuffle.
    *
    * Scale shape: per-group ordinals use the same two-phase prefix
    * pattern as [[tokenBudget]] — row_number within (group, range
    * bucket of `order`), bucket counts prefix-summed per group, offset
    * joined back — so a 3-modality corpus does NOT serialize through 3
    * window tasks. The group-index frame is |groups| rows (tiny by
    * definition of "modality"/"source") and broadcasts.
    *
    * Adds (batch_id, pos) — pos is the slot within the batch.
    */
  def interleaveBatches(df: DataFrame, group: String, order: String,
      batchSize: Int, bucketWidth: Long = 4096L): DataFrame = {
    require(batchSize >= 1, s"bad batchSize $batchSize")
    require(bucketWidth >= 1, s"bad bucketWidth $bucketWidth")
    val wIn = Window.partitionBy(col(group), col("_ib_bucket")).orderBy(order)
    val withB = df.withColumn("_ib_bucket",
        expr(s"CAST($order AS BIGINT) div $bucketWidth"))
      .withColumn("_ib_rn", row_number().over(wIn))
    val offsets = withB.groupBy(col(group), col("_ib_bucket"))
      .agg(count(lit(1)).as("_ib_n"))
      .withColumn("_ib_off",
        coalesce(
          sum(col("_ib_n")).over(
            Window.partitionBy(group).orderBy("_ib_bucket")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(group), col("_ib_bucket"), col("_ib_off"))
    val groups = df.select(col(group)).distinct()
      .withColumn("_ib_gidx",
        row_number().over(Window.orderBy(group)).cast("bigint") - 1)
      .withColumn("_ib_ng", count(lit(1)).over(Window.partitionBy()))
    withB.join(offsets, Seq(group, "_ib_bucket"))
      .join(broadcast(groups), Seq(group))
      .withColumn("_ib_slot",
        (col("_ib_off") + col("_ib_rn") - 1) * col("_ib_ng") + col("_ib_gidx"))
      .withColumn("batch_id", expr(s"CAST(_ib_slot div $batchSize AS BIGINT)"))
      .withColumn("pos", expr(s"CAST(_ib_slot % $batchSize AS BIGINT)"))
      .drop("_ib_bucket", "_ib_rn", "_ib_off", "_ib_gidx", "_ib_ng", "_ib_slot")
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

  /** k-ANONYMITY PROFILE of a quasi-identifier combination — the
    * privacy audit a corpus release runs before shipping metadata:
    * every row whose QI tuple is shared by fewer than k others is
    * re-identifiable to that group size. Output is the group-size
    * histogram (k, n_groups, n_rows): the release gate reads off how
    * many rows sit in groups below its k threshold, and the histogram
    * is diffable across releases like p09's card. All exact integers.
    *
    * Scale shape: one shuffle on the QI tuple (uniformly keyed — a QI
    * worth auditing is high-cardinality by definition), then an
    * aggregate over group SIZES, whose domain is tiny. Never a
    * self-join; rows at risk are identified by group size alone.
    */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).cast("bigint").as("n_groups"),
        sum("k").cast("bigint").as("n_rows"))
      .select(col("k").cast("bigint").as("k"), col("n_groups"),
        col("n_rows"))
  }
}
