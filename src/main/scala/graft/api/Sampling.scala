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

  /** Portable 32-bit uniform from `md5(id)`: the first 8 hex nibbles
    * decoded by `instr`/`substr` arithmetic, an integer in [0, 2^32).
    * Returned as SQL TEXT so the engine (`expr(...)`) and a DuckDB
    * oracle evaluate the IDENTICAL expression — both sides agree bit
    * for bit, which is what makes hash-derived randomness checkable.
    */
  def uniform32Sql(idSql: String): String = {
    // CAST each nibble to BIGINT: Spark's instr returns 32-bit INT and
    // the nested accumulate crosses 2^31 (wrapping silently with ANSI
    // off) where DuckDB's BIGINT instr does not
    val nib = (pos: Int) =>
      s"(CAST(instr('0123456789abcdef', substr(md5(CAST(($idSql) AS STRING)), $pos, 1)) AS BIGINT) - 1)"
    (2 to 8).foldLeft(nib(1))((acc, p) => s"($acc * 16 + ${nib(p)})")
  }

  /** Priority-sampling key (Duffield/Lund/Thorup): `u / w` for uniform
    * `u` in (0, 2^32] and positive integer weight `w`; the k rows with
    * the SMALLEST keys form a weighted-without-replacement sample that
    * favors heavy rows. Both operands are exact integers well inside
    * double's 2^53 mantissa, so the single correctly-rounded IEEE
    * division is bit-identical in any engine.
    */
  def priorityKeySql(idSql: String, weightSql: String): String =
    s"(CAST(${uniform32Sql(idSql)} + 1 AS DOUBLE) / ($weightSql))"

  /** Weighted-without-replacement sample: the `k` smallest priority
    * keys per stratum, taken through the bounded-heap
    * [[graft.api.Windows.topKPerGroup]] operator (map-side partial
    * heaps — no per-stratum full sort, no global shuffle beyond the
    * stratum exchange). Deterministic: key is a pure function of the
    * id, ties broken by id.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(k > 0, s"bad k $k")
    val keyed = df.withColumn("priority",
      org.apache.spark.sql.functions.expr(priorityKeySql(idCol, weightCol)))
    Windows.topKPerGroup(keyed, Seq(strataCol),
      Seq(("priority", false), (idCol, false)), k)
  }
}
