package graft.fixtures

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes the deterministic pin/geo/user raw fixtures as parquet under a
  * fixed path so (a) the reference-parity queries can run against real
  * entity tables and (b) the DuckDB oracle can re-derive the same
  * results from the same raw bytes — an end-to-end independent check of
  * the entire cleaning + analytics pipeline (SURVEY.md §5.5).
  */
object FixtureTables {

  val dir = graft.io.Scratch.targetRoot + "/fixtures"

  def pinPath: String = s"$dir/pin_raw.parquet"
  def geoPath: String = s"$dir/geo_raw.parquet"
  def userPath: String = s"$dir/user_raw.parquet"

  /** Idempotent: the generator is pure (index arithmetic, no RNG state),
    * so a re-write produces identical content; we skip when present.
    */
  def ensureWritten(spark: SparkSession): Unit = synchronized {
    if (!Files.exists(Paths.get(s"$dir/_DONE"))) {
      PinFixtures.pinRaw(spark).coalesce(1)
        .write.mode("overwrite").parquet(pinPath)
      PinFixtures.geoRaw(spark).coalesce(1)
        .write.mode("overwrite").parquet(geoPath)
      PinFixtures.userRaw(spark).coalesce(1)
        .write.mode("overwrite").parquet(userPath)
      Files.createFile(Paths.get(s"$dir/_DONE"))
    }
  }
}
