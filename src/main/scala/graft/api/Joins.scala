package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.Checkpoints.LineageOps

/** Distributed interval/range joins.
  *
  * Spark plans a plain non-equi time-range join as
  * BroadcastNestedLoopJoin (fine only when one side is tiny) or a
  * cartesian product (never fine). This is the missing whole-operator:
  * a range join that shuffles on a derived equi-key so both sides can
  * be 100 TB.
  */
object Joins {

  /** All (left, right) pairs with
    * `right[rightTsCol] ∈ [left[leftTsCol] + lowerUs, left[leftTsCol] + upperUs)`.
    *
    * Implementation — bucketed time join:
    *  - the right side gets one equi-key: its time bucket
    *    `rightTs div bucketUs`;
    *  - each left row explodes to the (few) buckets its interval
    *    `[lts+lower, lts+upper)` overlaps — `(upper-lower)/bucketUs + 1`
    *    of them, = 2 at the default bucket width;
    *  - the join is a plain shuffle hash/sort-merge join on the bucket,
    *    followed by the exact range predicate.
    *
    * Scale properties: the only data-sized shuffle key is the time
    * bucket, so neither side is ever broadcast and no user/entity key is
    * assumed shared (the case an as-of join with a partition key cannot
    * cover). `bucketUs` trades duplication for parallelism: the default
    * (= the window width) explodes the left side 2x; a busy stream whose
    * single-bucket volume exceeds a partition should pass a SMALLER
    * bucket (k+1 copies, k = window/bucket) to spread each window over
    * more keys — with AQE splitting any residual hot bucket. Timestamps
    * must be non-negative epoch micros (integer `div` floors toward
    * negative infinity only for non-negative operands).
    *
    * Column names of `left` and `right` must be disjoint (standard
    * Spark join hygiene; the internal bucket columns are dropped).
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftTsCol: String, rightTsCol: String,
      lowerUs: Long, upperUs: Long,
      bucketUs: Option[Long] = None): DataFrame = {
    require(upperUs > lowerUs, s"empty interval: [$lowerUs, $upperUs)")
    val w = bucketUs.getOrElse(upperUs - lowerUs)
    require(w > 0, s"bucket width must be positive: $w")
    val lb = expr(s"explode(sequence(($leftTsCol + $lowerUs) div $w, " +
      s"($leftTsCol + $upperUs - 1) div $w))")
    val l = left.withColumn("_graft_lb", lb)
    val r = right.withColumn("_graft_rb", expr(s"$rightTsCol div $w"))
    l.join(r,
        col("_graft_lb") === col("_graft_rb") &&
          col(rightTsCol) >= col(leftTsCol) + lowerUs &&
          col(rightTsCol) < col(leftTsCol) + upperUs)
      .drop("_graft_lb", "_graft_rb")
  }

  /** All (left, right) pairs whose half-open intervals
    * `[left.lStart, left.lEnd)` and `[right.rStart, right.rEnd)` overlap
    * — the interval-interval generalization of [[rangeJoin]] (which
    * handles point-in-interval). No shared entity key is assumed.
    *
    * Implementation: both sides explode to the time buckets their
    * interval covers and equi-join on the bucket; two overlapping
    * intervals share the bucket containing `max(lStart, rStart)`, and
    * the join keeps a pair only in THAT bucket, so no dedup pass is
    * needed afterwards. Rows with empty intervals (end <= start) are
    * dropped — they overlap nothing, and exploding their descending
    * bucket sequence would fabricate buckets.
    *
    * Scale properties: the shuffle key is the time bucket; per-row
    * fan-out is `interval_length/bucketUs + 1`, so `bucketUs` should be
    * on the order of the TYPICAL interval length (fan-out stays small)
    * while AQE splits any residual hot bucket. Timestamps are
    * non-negative epoch micros; column names must be disjoint.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucket width must be positive: $bucketUs")
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("_graft_lb",
        expr(s"explode(sequence($lStart div $bucketUs, ($lEnd - 1) div $bucketUs))"))
    val r = right.filter(col(rEnd) > col(rStart))
      .withColumn("_graft_rb",
        expr(s"explode(sequence($rStart div $bucketUs, ($rEnd - 1) div $bucketUs))"))
    l.join(r,
        col("_graft_lb") === col("_graft_rb") &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          col("_graft_lb") === expr(s"greatest($lStart, $rStart) div $bucketUs"))
      .drop("_graft_lb", "_graft_rb")
  }

  /** Interval-overlap join through the custom
    * [[graft.plans.IntervalJoin]] operator — same semantics as
    * [[intervalJoin]] (all overlapping half-open pairs, no shared
    * key), but WITHOUT the bucket-width knob: the exec range-partitions
    * the time domain by sampling the actual interval starts, replicates
    * each interval to exactly the partitions its span covers, and
    * plane-sweeps each partition with exactly-once emission (a pair is
    * produced only where `max` of the two starts falls). Fan-out adapts
    * to the data instead of a caller-chosen constant; see the operator
    * Scaladoc for the memory/scale contract.
    *
    * Start/end columns must be LONG epoch micros; column names must be
    * disjoint. Rows with NULL or empty intervals join nothing.
    */
  def intervalJoinNative(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      numPartitions: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "interval join requires disjoint column names (rename one side)")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val bounds = Seq(attr(lPlan, lStart), attr(lPlan, lEnd),
      attr(rPlan, rStart), attr(rPlan, rEnd))
    bounds.foreach(a => require(a.dataType == LongType,
      s"interval bounds must be LONG epoch micros, got ${a.name}: ${a.dataType}"))
    org.apache.spark.sql.GraftSqlBridge.dataFrame(left.sparkSession,
      graft.plans.IntervalJoin(bounds(0), bounds(1), bounds(2), bounds(3),
        numPartitions, lPlan, rPlan))
  }

  /** Hybrid skew join: equi-join `facts ⋈ dim` where the most frequent
    * fact-side keys bypass the shuffle. The `topHotKeys` heaviest keys
    * (deterministic tie-break on the key) are routed through a
    * broadcast join against just the dim rows they need, while the
    * remaining (near-uniform) keys take the ordinary shuffle join; the
    * union is the plain join, bit for bit.
    *
    * This is the manual form of what AQE's skew-join split does at
    * runtime — spelled out as an operator because (a) AQE only splits
    * SORT-MERGE sides, not the aggregate-after-join pattern where the
    * skewed key survives into the next stage, and (b) a pipeline that
    * KNOWS its hot keys (viral items, bot users) should not re-discover
    * them per query. The frequency scan is one map-side-combined
    * aggregate over the fact keys; production pipelines replace it with
    * stored table stats and pass the known hot set.
    *
    * `dim` must be unique on `dimKey` (standard dim contract); the hot
    * set (`topHotKeys` rows) and its dim subset must fit in a broadcast.
    */
  def skewSplitJoin(facts: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, topHotKeys: Int): DataFrame = {
    // evaluated once, reused by three joins; tiny by construction
    val hot = facts.groupBy(col(factKey)).agg(count(lit(1)).as("_graft_n"))
      .orderBy(col("_graft_n").desc, col(factKey))
      .limit(topHotKeys)
      .select(col(factKey).as("_graft_hk"))
      .cutLineage
    val factsHot = facts
      .join(broadcast(hot), col(factKey) === col("_graft_hk")).drop("_graft_hk")
    val factsCold = facts
      .join(broadcast(hot), col(factKey) === col("_graft_hk"), "left_anti")
    val dimHot = dim
      .join(broadcast(hot), col(dimKey) === col("_graft_hk")).drop("_graft_hk")
    factsCold.join(dim, col(factKey) === col(dimKey))
      .unionByName(factsHot.join(broadcast(dimHot), col(factKey) === col(dimKey)))
  }

  /** As-of (backward) join through the custom [[graft.plans.AsOfJoin]]
    * operator: every left row paired with the single right row of equal
    * keys and the greatest `rightTimeCol <= leftTimeCol` (left outer —
    * right columns NULL when no prior row). One merge pass per
    * co-partition; see the operator Scaladoc for the scale contract.
    *
    * Time columns must be LONG (epoch micros by this engine's
    * convention). `rightTiebreak` columns make the match deterministic
    * when right rows share a timestamp (last in ascending tiebreak
    * order wins). `toleranceUs` bounds the look-back: a match further
    * than that behind the left time emits NULLs instead (pandas
    * merge_asof's tolerance). Left and right column names must be
    * disjoint.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightTiebreak: Seq[String] = Nil,
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst, SortOrder}
    import org.apache.spark.sql.types.LongType
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "as-of join requires disjoint column names (rename one side)")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val lt = attr(lPlan, leftTimeCol)
    val rt = attr(rPlan, rightTimeCol)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LONG epoch micros, got ${lt.dataType}/${rt.dataType}")
    val tb = rightTiebreak.map(c =>
      SortOrder(attr(rPlan, c), Ascending, NullsFirst, Seq.empty))
    org.apache.spark.sql.GraftSqlBridge.dataFrame(left.sparkSession,
      graft.plans.AsOfJoin(
        leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
        lt, rt, tb, toleranceUs, lPlan, rPlan))
  }
}
