package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature extraction over event streams — the library surface
  * behind the e20–e26 feature queries, every path oracle-verified
  * end to end by the registered twins (the [[Dedup]]/[[Joins]] pattern:
  * queries call THESE functions, so the DuckDB hash compare covers the
  * public API, not a private copy).
  *
  * Scale contract shared by every function here: one shuffle on the
  * entity key (or none, for pure window work on an already-keyed
  * frame), group state bounded by the entity's own history, and any
  * global ranking confined to entity-grain frames that are orders of
  * magnitude smaller than the event stream. Money/value columns are
  * expected as exact integers (cents) — see e26's moment-sum reasoning
  * for why floats only ever appear in final per-row expressions.
  */
object Features {

  /** Per-key RFM triple: last-seen timestamp, row count, exact amount
    * sum. One partial-aggregate shuffle on `key`.
    */
  def rfm(df: DataFrame, key: String, ts: String, amount: String): DataFrame =
    df.groupBy(key)
      .agg(
        max(col(ts)).cast("bigint").as("last_seen_us"),
        count(lit(1)).as("frequency"),
        sum(col(amount)).cast("bigint").as("monetary_cents"))

  /** Adds an `ntile(n)` score column per listed metric, named
    * `<prefix from scoreNames>`. Runs single-partition global windows —
    * call this on ENTITY-grain frames only; `key` is the tie-break so
    * the binning is a total order. The single-task sort is exact and
    * fine up to ~10^8 entities; past that this is the W2 hazard class
    * (one hot task sorting the entity frame) — use
    * [[quintilesHistogram]] (exact, sort-free, ties share a bin; the
    * registry's e20 path since r16) or [[quintilesSampled]] (sketch
    * boundaries).
    */
  def quintiles(df: DataFrame, key: String,
      metrics: Seq[(String, String)], n: Int = 5): DataFrame =
    metrics.foldLeft(df) { case (acc, (metric, out)) =>
      acc.withColumn(out,
        ntile(n).over(Window.orderBy(col(metric), col(key))).cast("int"))
    }

  /** Exact HISTOGRAM-GRAIN n-tile scores — the scale-safe form of
    * [[quintiles]] (r15 verdict item 4): per metric, the cumulative
    * row count strictly below each DISTINCT value cuts the axis into
    * `n` near-equal bands (`(cum_before · n) div total + 1` — the
    * e46 stratum / e38 Gini / r67 decile precedent), and rows join
    * their value's band through a broadcast of the value→bin map. The
    * only window runs over distinct metric VALUES (bounded by the
    * value domain, orders of magnitude under the entity dimension on
    * count-like metrics), never over the entity frame — no
    * single-reducer entity sort at any scale. Semantics vs `ntile`:
    * rows tying on a value share its bin (ntile splits ties by the
    * key tie-break), and when `n` does not divide the row count the
    * two rules place the REMAINDER differently — ntile fattens the
    * first `count mod n` bins, the floor progression spreads them
    * (both are near-equal bandings; they coincide exactly on tie-free
    * frames with `n | count` — FeaturesSpec pins both regimes). Bin
    * ordering by metric value is identical in all cases.
    * Deterministic, exact integer arithmetic — oracle-expressible
    * bit-for-bit.
    */
  def quintilesHistogram(df: DataFrame,
      metrics: Seq[(String, String)], n: Int = 5): DataFrame = {
    require(n >= 2, s"bad n $n")
    // the entity frame feeds the total, one histogram PER metric, and
    // the scored output — materialize it once (the itemCfSimilarity
    // precedent) or the upstream aggregation recomputes 2+|metrics|
    // times
    val base = df.persist()
    val total = base.agg(count(lit(1)).cast("bigint").as("_qh_total"))
    metrics.foldLeft(base) { case (acc, (metric, out)) =>
      val wb = Window.orderBy(metric)
        .rowsBetween(Window.unboundedPreceding, -1)
      val bins = base.groupBy(metric)
        .agg(count(lit(1)).cast("bigint").as("_qh_m"))
        .withColumn("_qh_cb",
          coalesce(sum("_qh_m").over(wb), lit(0L)))
        .crossJoin(broadcast(total))
        .select(col(metric),
          (expr(s"(_qh_cb * $n) div _qh_total") + 1).cast("int").as(out))
      acc.join(broadcast(bins), Seq(metric))
    }
  }

  /** Sampled-boundary variant of [[quintiles]] for entity counts where
    * one global sort task is unacceptable: per metric the n-1 boundary
    * values come from `approxQuantile` (a distributed sketch
    * aggregation — no sort, no single hot task), and each row scores
    * `1 + #boundaries strictly below its value` in one map stage.
    * Differences vs the exact form, both inherent to boundary binning:
    * bin POPULATIONS are approximate (±relativeError mass per
    * boundary; 0.0 computes exact boundaries at higher cost), and rows
    * tying ON a boundary value all land in the lower bin (ntile splits
    * ties by the key tie-break instead). Bin ordering by metric value
    * is exact either way.
    */
  def quintilesSampled(df: DataFrame, metrics: Seq[(String, String)],
      n: Int = 5, relativeError: Double = 0.001): DataFrame = {
    require(n >= 2, s"bad n $n")
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds = df.stat.approxQuantile(metrics.map(_._1).toArray, probs,
      relativeError)
    metrics.zip(bounds).foldLeft(df) { case (acc, ((metric, out), bs)) =>
      val score = bs.foldLeft(lit(1)) { (s, b) =>
        s + when(col(metric) > b, 1).otherwise(0)
      }
      acc.withColumn(out, score.cast("int"))
    }
  }

  /** Per-row lag features: `<value>_lag{k}` for each requested lag plus
    * `gap1_<order>` to the previous row, -1 when history is missing.
    * All lags share ONE window sort (PlanSpec-pinned via e24).
    */
  def lagFeatures(df: DataFrame, key: String, order: Seq[String],
      value: String, lags: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order.map(col): _*)
    val withLags = lags.foldLeft(df) { (acc, k) =>
      acc.withColumn(s"${value}_lag$k",
        coalesce(lag(col(value), k).over(w), lit(-1L)).cast("bigint"))
    }
    val ord = order.head
    withLags.withColumn(s"gap1_$ord",
      coalesce(col(ord) - lag(col(ord), 1).over(w), lit(-1L)).cast("bigint"))
  }

  /** Dense per-key grid over each key's observed `[min, max]` unit
    * range: missing units appear with `cnt` 0 and `was_missing` 1 —
    * time-series densification (e25). `df` must be (key, unit) rows at
    * any grain; the fan-out is bounded by each key's own range.
    */
  def denseGrid(df: DataFrame, key: String, unit: String): DataFrame = {
    val dc = df.groupBy(key, unit).agg(count(lit(1)).as("n_events"))
    val grid = dc.groupBy(key)
      .agg(min(col(unit)).as("d0"), max(col(unit)).as("d1"))
      .select(col(key), explode(expr("sequence(d0, d1)")).as(unit))
    grid.join(dc, Seq(key, unit), "left")
      .select(col(key), col(unit),
        coalesce(col("n_events"), lit(0L)).cast("bigint").as("n_events"),
        when(col("n_events").isNull, 1).otherwise(0).cast("int")
          .as("was_missing"))
  }

  /** Per-group one-sided CUSUM drift detector over an ordered count
    * series — the change-point screen an ingest monitor runs on event
    * rates. All state is EXACT scaled integers: with group stats
    * n (points), s1 = Σx, s2 = Σx², the mean-centered deviation is
    * y_t = n·x_t − s1 (integer — the whole series is scaled by n so
    * the mean never becomes a float), and the recursive fold
    * S_t = max(0, S_{t−1} + y_t) is computed CLOSED-FORM via the
    * prefix-sum identity S_t = P_t − min(0, min_{j≤t} P_j) — two
    * plain window functions over one shuffle on the group key, no
    * recursion, no UDF. The standard k·σ allowance is subtracted
    * from each deviation before the fold (so only persistent
    * super-k·σ excursions accumulate — without it a mildly trending
    * series flags most of its points); it re-enters integer land as
    * ceil(k·sqrt(n·s2 − s1²)), exact in both engines. Floats appear
    * only there and in the final mirrored flag expression
    * S_t > h·(n·σ), where n·σ = sqrt(n·s2 − s1²) (population σ
    * under the same scale); sqrt is IEEE correctly-rounded in both
    * engines (the e26 contract). At
    * trillion-row scale the scaled integers outgrow int64 and lift
    * to DECIMAL(38,0) — same plan, wider type. Group-stat frame is
    * group-grain, so it broadcasts.
    */
  def cusumDrift(df: DataFrame, group: String, time: String,
      value: String, h: Double = 4.0, k: Double = 0.5): DataFrame = {
    val st = df.groupBy(group).agg(
      count(lit(1)).as("n"),
      sum(col(value)).as("s1"),
      sum(col(value) * col(value)).as("s2"))
    val w = Window.partitionBy(group).orderBy(time)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the k·σ allowance (scaled by n like everything else) re-enters
    // integer land through a mirrored ceil: ceil of the same IEEE
    // double is the same integer in both engines, and every op after
    // it is exact again. The variance numerator n·Σv² − (Σv)² is
    // computed in DECIMAL(38,0), not BIGINT — Spark silently wraps a
    // BIGINT product while DuckDB promotes to HUGEINT/errors, so large
    // per-key totals would diverge (the r15 sweep of the r14-ADVICE
    // momStd class); exact decimal matches HUGEINT bit-for-bit here.
    val allowance =
      ceil(lit(k) * sqrt((col("n").cast("decimal(38,0)") * col("s2")
        - col("s1").cast("decimal(38,0)") * col("s1"))
        .cast("double"))).cast("long")
    df.join(broadcast(st), Seq(group))
      .withColumn("y", col("n") * col(value) - col("s1") - allowance)
      .withColumn("p", sum(col("y")).over(w))
      .withColumn("s_scaled",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .withColumn("drift",
        (col("s_scaled").cast("double") >
          lit(h) * sqrt((col("n").cast("decimal(38,0)") * col("s2")
            - col("s1").cast("decimal(38,0)") * col("s1"))
            .cast("double"))).cast("int"))
      .drop("y", "p", "n", "s1", "s2")
  }

  /** Per-key consecutive-unit streaks via gaps-and-islands (e22):
    * `unit - row_number` is constant within a run, so runs become
    * group-by keys — no self-join, no iteration. Input must be
    * (key, unit)-distinct.
    */
  def streaks(df: DataFrame, key: String, unit: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(unit)
    df.withColumn("grp", col(unit) - row_number().over(w))
      .groupBy(key, "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy(key)
      .agg(
        max(col("len")).cast("bigint").as("longest_streak"),
        count(lit(1)).cast("bigint").as("n_streaks"),
        sum(col("len")).cast("bigint").as("total_active_days"))
  }

  /** Adds a per-group z-score `z` for an exact-integer `value` column
    * (e26): group moments are exact integer sums broadcast back onto
    * the stream; floats appear only in the final per-row expression.
    * Zero-variance groups divide by zero and yield NULL `z` — Spark's
    * non-ANSI Divide and DuckDB agree on that, so the contract is
    * oracle-stable (FeaturesSpec pins it).
    */
  def zscore(df: DataFrame, group: String, value: String): DataFrame =
    zscoreWithStats(df, groupStats(df, group, value), group, value)

  /** The exact integer moments (`n`, `s1`, `s2`) per group — the
    * training-time statistics frame [[zscoreWithStats]] consumes.
    */
  def groupStats(df: DataFrame, group: String, value: String): DataFrame =
    df.groupBy(group)
      .agg(count(lit(1)).as("n"),
        sum(col(value)).as("s1"),
        sum(col(value) * col(value)).as("s2"))

  /** Scores rows against a PRE-COMPUTED stats frame — the online
    * (inference-time) half of [[zscore]]: training computes
    * [[groupStats]] once, serving broadcasts it onto any frame — batch
    * or stream (it is a stateless stream-static join, so it runs
    * unchanged under Structured Streaming; StreamingSpec pins parity
    * with the batch path).
    */
  def zscoreWithStats(df: DataFrame, stats: DataFrame, group: String,
      value: String): DataFrame =
    df.join(broadcast(stats), group)
      .withColumn("z",
        expr(s"""(CAST($value AS DOUBLE) - CAST(s1 AS DOUBLE) / n) /
                 sqrt((CAST(s2 AS DOUBLE) * n - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(n AS DOUBLE) * n))"""))
      .drop("n", "s1", "s2")

  /** Trailing `windowUnits`-wide distinct-`key` count per unit (e21's
    * WAU curve): one (unit, key) dedup shuffle, a bounded fan-out of
    * each pair to the ≤ `windowUnits` units it serves, and a broadcast
    * semi join clipping the fan-out to observed units. Never a range
    * join.
    */
  def rollingDistinct(df: DataFrame, key: String, unit: String,
      windowUnits: Int = 7): DataFrame = {
    val du = df.select(col(unit), col(key)).distinct()
    val units = du.select(unit).distinct()
    du.select(
        explode(expr(s"sequence($unit, $unit + ${windowUnits - 1})"))
          .as(unit),
        col(key))
      .join(broadcast(units), Seq(unit), "left_semi")
      .groupBy(unit)
      .agg(countDistinct(col(key)).cast("bigint")
        .as(s"active_${windowUnits}d"))
  }

  /** Discrete-time survival LIFE TABLE of user churn (the actuarial /
    * Kaplan-Meier estimator's per-interval half, kept exact): per
    * elapsed period k since a user's first event,
    *
    *   n_at_risk(k)  = users whose observed lifetime spans ≥ k periods
    *   n_churned(k)  = users whose LAST event falls in period k and is
    *                   ≥ one period before the corpus end (a quiet tail
    *                   shorter than that is CENSORED — "no event yet",
    *                   not "gone");
    *   hazard_ppm(k) = n_churned(k)·10^6 div n_at_risk(k).
    *
    * Kaplan-Meier's survival CURVE is a cumulative product of these
    * per-period fractions — not expressible in exact integers — but the
    * hazards are each ONE integer division, so the table is bit-stable
    * in any engine and the curve is a client-side fold away. Periods
    * with no ending user still appear (hazard 0) out to the last
    * observed lifetime.
    *
    * Scale shape: one groupBy(user) pass for (first, last), a
    * single-row max for the corpus end, a tiny per-period aggregate,
    * and the at-risk suffix sum as a window over the ≤ max-lifetime
    * period rows — never a user-level window or a range join.
    */
  def hazardLifeTable(df: DataFrame, key: String, usCol: String,
      periodUs: Long): DataFrame = {
    val life = df.groupBy(col(key))
      .agg(min(col(usCol)).as("first_us"), max(col(usCol)).as("last_us"))
    val endRow = df.agg(max(col(usCol)).as("end_us"))
    val perUser = life.crossJoin(broadcast(endRow))
      .select(
        expr(s"(last_us - first_us) div $periodUs").as("k"),
        (col("end_us") - col("last_us") < periodUs).as("censored"))
    val perPeriod = perUser.groupBy("k")
      .agg(count(lit(1)).as("n_ended"),
        sum(when(col("censored"), 0L).otherwise(1L)).as("n_churned"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("n_censored"))
    // dense period axis 0..max(k) from a one-row explode (no collect)
    val axis = perPeriod.agg(max("k").as("mk"))
      .select(explode(expr("sequence(0, mk)")).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("k").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    axis.join(perPeriod, Seq("k"), "left")
      .na.fill(0L, Seq("n_ended", "n_churned", "n_censored"))
      .withColumn("n_at_risk", sum("n_ended").over(w))
      .select(col("k").cast("bigint").as("period"),
        col("n_at_risk").cast("bigint").as("n_at_risk"),
        col("n_churned").cast("bigint").as("n_churned"),
        col("n_censored").cast("bigint").as("n_censored"),
        expr("(n_churned * 1000000) div n_at_risk").cast("bigint")
          .as("hazard_ppm"))
  }
}
