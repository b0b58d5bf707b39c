package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-maintenance operations a pipeline runs between queries. */
object Tables {

  /** Snapshot diff (CDC classification): every key of two snapshots of
    * a keyed table labeled `added` / `removed` / `changed` /
    * `unchanged`. Change detection hashes the non-key columns
    * (md5 over a unit-separator concat — engine-portable, so an oracle
    * can recompute it), which keeps the join payload ONE 32-byte hash
    * per row regardless of table width: at 100 TB the full-outer join
    * shuffles keys and hashes, never the wide rows.
    *
    * NULL caveat (same as any concat-based row hash): concat_ws skips
    * NULLs, so ('a', NULL) and (NULL, 'a') collide — acceptable for
    * change DETECTION (a collision reads as `unchanged`), documented
    * because it is the standard trade of the portable formulation.
    */
  def diff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    require(before.columns.sameElements(after.columns),
      s"schema mismatch: before=${before.columns.mkString(",")} " +
        s"after=${after.columns.mkString(",")}")
    val payload = before.columns.filterNot(_ == key)
    def hashed(df: DataFrame) = df.select(col(key),
      md5(concat_ws("\u0001", payload.map(c => col(c).cast("string")): _*)).as("_h"))
    hashed(before).as("b")
      .join(hashed(after).as("a"), col(s"b.$key") === col(s"a.$key"), "full_outer")
      .select(
        coalesce(col(s"b.$key"), col(s"a.$key")).as(key),
        when(col("b._h").isNull, "added")
          .when(col("a._h").isNull, "removed")
          .when(col("b._h") === col("a._h"), "unchanged")
          .otherwise("changed").as("change"))
  }

  /** SCD-1 upsert: rows of `updates` replace same-key rows of `base`;
    * unmatched update keys are inserted; everything else passes
    * through. `updates` must carry the same columns as `base`.
    *
    * This is the relational core of a Delta/Iceberg MERGE (minus the
    * transaction log, which is the format's job, not the engine's):
    * one full-outer shuffle join on the key, and the update row wins
    * WHOLESALE when matched — including its NULLs, so an update can
    * genuinely null out a base value (a per-column coalesce cannot; it
    * silently keeps the base value). Matched-ness is carried as a flag
    * on the update side, not inferred from column nullness.
    *
    * MERGE also requires each target row to match at most one source
    * row; a duplicate update key would fan out its base row. That
    * precondition is enforced INSIDE the plan: the update-side join key
    * is wrapped so a key seen twice raises at execution (the guard is
    * load-bearing — it computes the join key — so column pruning cannot
    * drop it). The duplicate check is one window count on the update
    * side, which is the small side of a dimension refresh. At scale the
    * join shuffles both sides on the key — and when the update batch is
    * small, AQE turns it into a broadcast join with no base-side
    * shuffle at all.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: base=${base.columns.mkString(",")} " +
        s"updates=${updates.columns.mkString(",")}")
    val cols = base.columns
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
    val u = updates
      .withColumn("_graft_n", count(lit(1)).over(w))
      .withColumn(key,
        when(col("_graft_n") > 1,
          raise_error(concat(lit(s"upsert: duplicate update key $key="),
            col(key).cast("string"))))
          .otherwise(col(key)))
      .drop("_graft_n")
      .withColumn("_graft_matched", lit(true))
    base.as("b").join(u.as("u"),
        col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map { c =>
        if (c == key) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
        else when(col("u._graft_matched").isNotNull, col(s"u.$c"))
          .otherwise(col(s"b.$c")).as(c)
      }: _*)
  }

  /** Full CDC apply — [[upsert]] extended with DELETES, the complete
    * `MERGE WHEN MATCHED [AND op='D'] THEN DELETE / THEN UPDATE / WHEN
    * NOT MATCHED THEN INSERT` shape a change-data-capture feed needs
    * (Debezium-style row images). `changes` carries `base`'s columns
    * plus `opCol` with values 'U' (upsert — insert or update) and 'D'
    * (delete; deleting an absent key is a no-op, matching MERGE).
    *
    * Same scale shape and duplicate-key guard as [[upsert]]: one
    * full-outer key join (AQE broadcasts a small change batch), delete
    * rows filtered in the same pass — no second anti join. Within one
    * batch each key appears at most once; collapse a multi-event feed
    * to latest-per-key first (the streaming upsertSink shows how).
    */
  def applyCdc(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    require(changes.columns.toSet == base.columns.toSet + opCol,
      s"schema mismatch: base=${base.columns.mkString(",")} " +
        s"changes=${changes.columns.mkString(",")} (need base + $opCol)")
    val cols = base.columns
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
    val c = changes
      .withColumn("_graft_n", count(lit(1)).over(w))
      .withColumn(key,
        when(col("_graft_n") > 1,
          raise_error(concat(lit(s"applyCdc: duplicate change key $key="),
            col(key).cast("string"))))
          .otherwise(col(key)))
      .drop("_graft_n")
      .withColumn(opCol,
        when(col(opCol).isin("U", "D"), col(opCol))
          .otherwise(raise_error(
            concat(lit(s"applyCdc: bad $opCol value "), col(opCol)))))
    base.as("b").join(c.as("c"),
        col(s"b.$key") === col(s"c.$key"), "full_outer")
      .filter(!(col(s"c.$opCol") <=> lit("D")))
      .select(cols.map { cn =>
        if (cn == key) coalesce(col(s"c.$cn"), col(s"b.$cn")).as(cn)
        else when(col(s"c.$opCol").isNotNull, col(s"c.$cn"))
          .otherwise(col(s"b.$cn")).as(cn)
      }: _*)
  }

  /** Small-files compaction — the table-maintenance job every
    * streaming/incremental sink eventually needs (a 100 TB table fed by
    * per-minute micro-batches accretes millions of KB-sized files; scan
    * cost becomes file-listing + task-scheduling bound long before it is
    * IO bound).
    *
    * Rewrites `inPath` to `outPath` with output files sized near
    * `targetFileBytes`. The target file count comes from the actual
    * on-disk bytes (driver-side directory listing — metadata, not
    * data). Reducing file count uses `coalesce`, which merges
    * partitions WITHOUT a shuffle — the whole point of compaction is
    * not to pay data movement twice; `repartition` is reserved for the
    * rare grow case (target > current partitions, e.g. one giant file
    * that must split for parallelism).
    *
    * Returns the number of output files requested.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"bad target $targetFileBytes")
    val bytes = dirBytes(inPath)
    val n = targetFileCount(bytes, targetFileBytes)
    val df = spark.read.parquet(inPath)
    val sized =
      if (n <= df.rdd.getNumPartitions) df.coalesce(n) else df.repartition(n)
    sized.write.mode("overwrite").parquet(outPath)
    n
  }

  /** CLUSTERED compaction — `compact` plus re-layout: rewrites the
    * table range-clustered on `clusterCol` and refreshes its zone map
    * ([[graft.io.ZoneMap.stats]]) in the same job, i.e. the
    * OPTIMIZE-style maintenance pass that turns a micro-batch sink's
    * accretion of small time-interleaved files back into a layout whose
    * per-file min/max stats are tight enough to prune.
    *
    * Unlike the plain `compact`, this DOES shuffle
    * (`repartitionByRange`) — deliberately: interleaved ingest order is
    * precisely what makes zone maps useless (every file's range spans
    * everything), so re-clustering is the job, and its cost is paid
    * once to speed every later pruned scan. Range partitioning gives
    * files non-overlapping value ranges (up to boundary-duplicate
    * keys), which is what makes a range predicate touch O(matching)
    * files instead of all of them.
    *
    * Returns the number of output files requested.
    */
  def compactClustered(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, clusterCol: String,
      statsPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0, s"bad target $targetFileBytes")
    val n = targetFileCount(dirBytes(inPath), targetFileBytes)
    spark.read.parquet(inPath)
      .repartitionByRange(n, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(outPath)
    graft.io.ZoneMap.stats(spark, outPath, clusterCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath)
    n
  }

  /** On-disk data bytes under `path` (driver-side listing — metadata,
    * not data; a 100 TB table's listing is what a catalog serves).
    */
  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else if (f.getName.startsWith("part-")) f.length()
      else 0L
    walk(new java.io.File(path))
  }

  private def targetFileCount(bytes: Long, targetFileBytes: Long): Int =
    math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
}
