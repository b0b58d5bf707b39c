package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 generator for the third bench-curve rung: scales
  * the sf0.1 fixture 10× by REPLICATION WITH KEY OFFSETS — replica r
  * (0..9) shifts every entity key by r × (max_key + 1), so
  * foreign-key joins stay consistent within each replica and group
  * cardinalities grow 10× while per-group sizes stay fixed (the "more
  * data = more entities" growth model, which is how these tables grow
  * in reality). Offsets are multiples of 10^4-scale table sizes, so
  * every arithmetic sparsifier in the registry (`% 10`, `% 25`,
  * `% 50`, `% 250` classes) keeps its selectivity. Event timestamps
  * get +r µs jitter so replicas don't collide on exact instants.
  *
  * Usage: `runMain graft.GenScale [srcDir] [outDir]` (defaults
  * /root/testdata/sf0.1 → target/sf1). Timing-only data: the
  * correctness oracle never reads it; Bench auto-detects the outDir
  * as the big rung of the cross-SF curve.
  *
  * Content columns are mutated per replica (token prefixing for text,
  * a dimension rotation for embeddings — see `mutateContent`) so the
  * scaled corpus does not consist of 10 exact twins of every entity;
  * `n_chars` is intentionally left at the base value (timing-only
  * data, and the prefix inflation is uniform).
  *
  * Known bias of the growth model: replication grows ENTITY COUNT at
  * fixed per-entity density, so operators whose cost is super-linear
  * in per-entity structure (wedge censuses, per-order basket
  * expansion) scale LINEARLY on this data — the big rung tests "10×
  * more entities", which is the dominant real growth axis, not "10×
  * denser entities". The sf0.01→sf0.1 rung (driver-generated, both
  * axes grow) keeps covering the density axis.
  */
object GenScale {

  private val Replicas = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (table, key columns to offset, ts column to jitter or null)
    val plan: Seq[(String, Seq[String], Option[String])] = Seq(
      ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), None),
      ("orders", Seq("o_orderkey", "o_custkey"), None),
      ("customer", Seq("c_custkey"), None),
      ("part", Seq("p_partkey"), None),
      ("supplier", Seq("s_suppkey"), None),
      ("nation", Seq(), None),
      ("region", Seq(), None),
      ("events", Seq("event_id", "user_id"), Some("ts")),
      ("documents", Seq("doc_id"), None),
      ("embeddings", Seq("vec_id"), None))

    // Content columns must NOT replicate verbatim: 10 byte-identical
    // copies of every document/vector would hand the near-dup and
    // shared-payload operators a corpus where EVERY entity has 9 exact
    // twins — cross-replica pair expansion is then quadratic in the
    // replica count and the first big-rung run flagged exactly that
    // (d06/m08/m10 at 14-54x). Replica r instead gets:
    //  - documents.text: every token prefixed with "r<r>_" — token
    //    counts, lengths and WITHIN-replica dup structure are
    //    preserved exactly; cross-replica token/shingle overlap is 0.
    //  - embeddings.embedding: dimensions cyclically shifted by 7r —
    //    norms and within-replica geometry are preserved exactly
    //    (a permutation is an isometry); random vectors decorrelate
    //    across replicas.
    def mutateContent(table: String, df: DataFrame): DataFrame = table match {
      case "documents" =>
        df.withColumn("text",
          when(col("_r") === 0, col("text")).otherwise(
            array_join(
              transform(split(col("text"), " "),
                t => concat(lit("r"), col("_r"), lit("_"), t)), " ")))
      case "embeddings" =>
        df.withColumn("embedding",
          transform(sequence(lit(0), size(col("embedding")) - 1),
            i => element_at(col("embedding"),
              (i + lit(7) * col("_r")) % size(col("embedding")) + 1)))
      case _ => df
    }

    plan.foreach { case (table, keys, tsCol) =>
      val base = spark.read.parquet(s"$src/$table.parquet")
      val scaled: DataFrame =
        if (keys.isEmpty) base // dimensions don't scale
        else {
          val strides: Map[String, Long] = keys.map { k =>
            k -> (base.agg(max(col(k))).head.getAs[Number](0).longValue() + 1L)
          }.toMap
          val withR = base.withColumn("_r",
            explode(sequence(lit(0), lit(Replicas - 1))))
          val keyed = strides.foldLeft(withR) { case (df, (k, stride)) =>
            df.withColumn(k,
              (col(k).cast("long") + col("_r").cast("long") * lit(stride))
                .cast(base.schema(k).dataType))
          }
          val mutated = mutateContent(table, keyed)
          tsCol.fold(mutated) { c =>
            // fixture ts may be TIMESTAMP or TIMESTAMP_NTZ depending on
            // driver writer version; round-trip through LTZ under the
            // UTC session tz (exact) and restore the on-disk type
            val dt = base.schema(c).dataType
            keyed.withColumn(c, timestamp_micros(
              unix_micros(col(c).cast("timestamp")) + col("_r").cast("long"))
              .cast(dt))
          }.drop("_r")
        }
      // select in original column order so the schema round-trips
      scaled.select(base.columns.map(col).toIndexedSeq: _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[genscale] $table -> $out (${if (keys.isEmpty) "1" else Replicas.toString}x)")
    }
    spark.stop()
  }
}
