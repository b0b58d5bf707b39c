package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level Bloom index: per-file membership sketches of a point-
  * lookup key, consulted before a scan so an equality predicate reads
  * only the files that might contain the key — the complement of
  * [[ZoneMap]]. Zone maps skip on the CLUSTERING column (range
  * predicates over ordered data); they are blind to a high-cardinality
  * key scattered across an ingest-ordered layout, where every file's
  * [min, max] spans the whole key space. A Bloom bit set per file is
  * how table formats (Delta/Iceberg bloom filter indexes, parquet
  * column-level bloom filters) answer "which files can hold key K"
  * without touching data.
  *
  * Index layout: one row per (file, word_idx) whose 64-bit word has any
  * bit set — sparse, so index size tracks the per-file DISTINCT key
  * count, not the bit-array capacity. At `bits` = 2^17 and ~10k
  * distinct keys per file with 4 hashes, the false-positive rate is
  * well under 1% and the index is ~KBs per file — metadata-scale
  * against the scan it prunes. Size `bits` to ~16x the expected
  * per-file distinct keys; probing evaluates the sketch rows
  * distributed (only surviving file paths reach the driver), so
  * `bits` is bounded by per-file index size, not driver memory.
  *
  * Hashing is Kirsch-Mitzenmacher double hashing over md5 of the key's
  * string form (the same construction the dedup signatures use): bit i
  * = (h1 + i*h2) mod bits, with h1/h2 the two 60-bit md5 halves. Build
  * side computes it in codegen'd column expressions; the probe side
  * recomputes the identical positions on the driver from the same md5.
  */
object BloomIndex {

  private val mod60 = 1152921504606846976L // 2^60

  /** The k bit positions of one key value (driver-side probe twin of
    * the build-side column expression — same md5, same arithmetic).
    */
  private[graft] def positions(key: String, bits: Int, hashes: Int): Seq[Long] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(d.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(d.substring(16, 31), 16)
    (0 until hashes).map(i => ((h1 + i.toLong * h2) % mod60) % bits)
  }

  /** Build the per-file Bloom index of `keyCol` for every parquet file
    * under `dataPath`, written to `statsPath` with schema
    * (file, word_idx, word_bits). Two small shuffles over (file, word)
    * — a one-time build cost, like any index.
    */
  def build(spark: SparkSession, dataPath: String, keyCol: String,
      statsPath: String, bits: Int = 1 << 17, hashes: Int = 4): Unit = {
    require(hashes >= 1 && hashes <= 6, "1..6 hashes (KM arithmetic bound)")
    require(Integer.bitCount(bits) == 1, s"bits must be a power of two, got $bits")
    val keyed = spark.read.parquet(dataPath)
      .select(input_file_name().as("file"),
        col(keyCol).cast("string").as("_k"))
      .select(col("file"),
        expr("md5_u60(_k)").as("_h1"),
        expr("md5_u60(_k, 16)").as("_h2"))
    val posed = keyed.select(col("file"),
      explode(array((0 until hashes).map(i =>
        expr(s"((_h1 + $i * _h2) % $mod60) % $bits")): _*)).as("_pos"))
    posed
      .select(col("file"),
        expr("_pos DIV 64").as("word_idx"),
        expr("shiftleft(1L, CAST(_pos % 64 AS INT))").as("_mask"))
      .groupBy("file", "word_idx")
      .agg(expr("bit_or(_mask)").as("word_bits"))
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath)
  }

  /** Read only the files whose Bloom set can contain `key`. Definitely-
    * absent files are skipped; possible false positives survive, so
    * callers keep their real equality predicate — like the zone map,
    * pruning must be invisible in the result. The stats read itself is
    * pruned: only the probe's k word rows are fetched (a pushed-down
    * `word_idx IN (...)` over a KB-scale table). A key the index has
    * never seen prunes every file and returns an empty frame with the
    * data's schema.
    */
  def prunedRead(spark: SparkSession, dataPath: String, statsPath: String,
      key: String, bits: Int = 1 << 17, hashes: Int = 4): DataFrame = {
    val pos = positions(key, bits, hashes)
    val wordOf = pos.map(p => p / 64 -> (1L << (p % 64).toInt))
      .groupBy(_._1).map { case (w, ms) => w -> ms.map(_._2).reduce(_ | _) }
    // Distributed verification: the probe's (word_idx -> required mask)
    // map is a tiny literal evaluated inside the stats scan; a file
    // survives iff every probed word row is present AND contains all
    // its probed bits (rows are unique per (file, word_idx) by
    // construction, so "all k words matched" is a count). The sketch
    // words themselves never leave the executors — the driver receives
    // only the surviving leaf paths, which is the same path list the
    // scan planner must hold to plan the read anyway (exactly how
    // table-format drivers consume a distributed manifest prune).
    val requiredMask = {
      val kv = wordOf.toSeq.flatMap { case (w, m) => Seq(lit(w), lit(m)) }
      element_at(map(kv: _*), col("word_idx"))
    }
    val files = spark.read.parquet(statsPath)
      .filter(col("word_idx").isin(wordOf.keys.toSeq: _*))
      .filter(col("word_bits").bitwiseAND(requiredMask) === requiredMask)
      .groupBy("file").agg(count(lit(1)).as("_matched"))
      .filter(col("_matched") === lit(wordOf.size))
      .select("file").orderBy("file")
      .collect().map(_.getString(0)).toIndexedSeq
    if (files.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(files: _*)
  }
}
