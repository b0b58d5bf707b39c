package graft.clean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, TimestampType}

import graft.expr.HumanCount.human_count

/** The cleaning layer. One function per entity, shared verbatim between
  * the batch and streaming pipelines (the reference duplicates this code
  * across its two notebooks; we factor it — SURVEY.md §3.2).
  *
  * Every transform is a narrow, codegen-friendly projection: no UDFs, no
  * shuffles — a cleaning pass over 100 TB stays a single map stage fused
  * into WholeStageCodegen.
  */
object Cleaners {

  /** Placeholders the reference normalizes to null
    * (`(Clone) mount_s3_in_databricks.py:99`).
    */
  val nullPlaceholders: Seq[String] = Seq("", "NA", "N/A", "None", "null")

  private def nullifyPlaceholders(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(trim(col(c)).isin(nullPlaceholders: _*), lit(null)).otherwise(col(c)))
    }

  /** pin cleaning — reference `(Clone) mount_s3_in_databricks.py:97-171`:
    *  1. ''/NA/N/A -> null across string columns;
    *  2. follower_count "532k"/"1M" -> int (native expression, U1);
    *  3. null fills: poster_name/category/title/description -> "Unknown",
    *     is_image_or_video -> "unknown", follower_count -> `fillFollower`
    *     (the batch notebook uses the column median, the streaming one a
    *     constant 1000 — both are reproduced by parameterizing the fill);
    *  4. canonicalize "multi-video(story page format)" -> "video";
    *  5. drop exact duplicate rows (batch path; streaming uses
    *     watermarked dropDuplicates instead — see stream.Pipelines);
    *  6. index -> int `ind`; strip "Local save in " prefix;
    *  7. fixed 11-column projection.
    */
  def cleanPin(raw: DataFrame, fillFollower: Option[Int] = None,
      dedup: Boolean = true): DataFrame = {
    val strCols = Seq("title", "description", "poster_name", "follower_count",
      "tag_list", "is_image_or_video", "image_src", "save_location", "category")
    val nulled = nullifyPlaceholders(raw, strCols)
    val parsed = nulled
      .withColumn("follower_count", human_count(col("follower_count")))
    val filled = parsed
      .withColumn("follower_count",
        fillFollower.map(v => coalesce(col("follower_count"), lit(v)))
          .getOrElse(col("follower_count")))
      .withColumn("poster_name", coalesce(col("poster_name"), lit("Unknown")))
      .withColumn("category", coalesce(col("category"), lit("Unknown")))
      .withColumn("title", coalesce(col("title"), lit("Unknown")))
      .withColumn("description", coalesce(col("description"), lit("Unknown")))
      .withColumn("is_image_or_video",
        when(col("is_image_or_video") === "multi-video(story page format)", lit("video"))
          .otherwise(coalesce(col("is_image_or_video"), lit("unknown"))))
      .withColumn("save_location",
        regexp_replace(col("save_location"), "^Local save in ", ""))
      .withColumn("ind", col("index").cast(IntegerType))
    val deduped = if (dedup) filled.dropDuplicates() else filled
    deduped.select("ind", "unique_id", "title", "description", "follower_count",
      "poster_name", "tag_list", "is_image_or_video", "image_src",
      "save_location", "category")
  }

  /** Median follower_count used as the batch fill value (reference
    * `(Clone) mount_s3_in_databricks.py:127`, approxQuantile with
    * relativeError=0 i.e. exact). Driver-side scalar — legal because the
    * result is one number, but at 100 TB prefer relativeError ~0.001
    * (single pass, bounded memory) over 0.0.
    */
  def medianFollower(parsedPin: DataFrame, relativeError: Double = 0.001): Option[Int] = {
    val q = parsedPin
      .withColumn("fc", human_count(col("follower_count")))
      .stat.approxQuantile("fc", Array(0.5), relativeError)
    q.headOption.filterNot(_.isNaN).map(_.toInt)
  }

  /** geo cleaning — `(Clone) mount_s3_in_databricks.py:180-196`:
    * coordinates = [latitude, longitude], timestamp cast, 4-col
    * projection.
    */
  def cleanGeo(raw: DataFrame, dedup: Boolean = true): DataFrame = {
    val cleaned = raw
      .withColumn("coordinates",
        array(col("latitude").cast(FloatType), col("longitude").cast(FloatType)))
      .withColumn("timestamp", col("timestamp").cast(TimestampType))
      .withColumn("ind", col("ind").cast(IntegerType))
      .na.drop(Seq("ind"))
    val deduped = if (dedup) cleaned.dropDuplicates() else cleaned
    deduped.select("ind", "country", "coordinates", "timestamp")
  }

  /** user cleaning — `(Clone) mount_s3_in_databricks.py:205-220`:
    * user_name = first_name + ' ' + last_name, lenient age cast
    * (string "abc" -> null), timestamp cast, 4-col projection, rows
    * missing the join key or name dropped
    * (`(Clone) kinesis_streaming_process_in_databricks.py:285`).
    */
  def cleanUser(raw: DataFrame, dedup: Boolean = true): DataFrame = {
    val cleaned = raw
      .withColumn("user_name", concat_ws(" ", col("first_name"), col("last_name")))
      .withColumn("age", col("age").try_cast("int"))
      .withColumn("date_joined", col("date_joined").cast(TimestampType))
      .withColumn("ind", col("ind").cast(IntegerType))
      .na.drop(Seq("ind", "user_name"))
    val deduped = if (dedup) cleaned.dropDuplicates() else cleaned
    deduped.select("ind", "user_name", "age", "date_joined")
  }

  /** Age bucketing used by the per-age-group analytics
    * (`(Clone) mount_s3_in_databricks.py:313-318`).
    */
  def ageGroup(age: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(age.between(18, 24), "18-24")
      .when(age.between(25, 35), "25-35")
      .when(age.between(36, 50), "36-50")
      .when(age > 50, "+50")
      .otherwise("unknown")
}
