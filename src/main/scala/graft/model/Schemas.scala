package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the three entity streams of the reference
  * pipeline (pin post / geo event / user profile).
  *
  * Raw (wire) schemas reproduce the reference's explicit StructTypes:
  * pin  — `(Clone) kinesis_streaming_process_in_databricks.py:94-107`
  * geo  — `(Clone) kinesis_streaming_process_in_databricks.py:75-81`
  * user — `(Clone) kinesis_streaming_process_in_databricks.py:118-124`
  *
  * Cleaned schemas reproduce the final projections:
  * pin  — `(Clone) mount_s3_in_databricks.py:167-171`
  * geo  — `(Clone) mount_s3_in_databricks.py:196`
  * user — `(Clone) mount_s3_in_databricks.py:220`
  */
object Schemas {

  /** Raw pin post as it arrives on the wire. `follower_count` is a
    * human-formatted string ("25", "532k", "1M"); `index` is renamed to
    * `ind` during cleaning.
    */
  val pinRaw: StructType = StructType(Seq(
    StructField("index", IntegerType),
    StructField("unique_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("poster_name", StringType),
    StructField("follower_count", StringType),
    StructField("tag_list", StringType),
    StructField("is_image_or_video", StringType),
    StructField("image_src", StringType),
    StructField("downloaded", IntegerType),
    StructField("save_location", StringType),
    StructField("category", StringType)
  ))

  val geoRaw: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("latitude", FloatType),
    StructField("longitude", FloatType),
    StructField("country", StringType)
  ))

  /** `age` arrives as a string on the stream but is semantically an int
    * (the reference compares it with `between(18, 24)`); cleaning casts
    * it leniently (unparseable -> null).
    */
  val userRaw: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("age", StringType),
    StructField("date_joined", TimestampType)
  ))

  val pinClean: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("unique_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("follower_count", IntegerType),
    StructField("poster_name", StringType),
    StructField("tag_list", StringType),
    StructField("is_image_or_video", StringType),
    StructField("image_src", StringType),
    StructField("save_location", StringType),
    StructField("category", StringType)
  ))

  val geoClean: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("country", StringType),
    StructField("coordinates", ArrayType(FloatType)),
    StructField("timestamp", TimestampType)
  ))

  val userClean: StructType = StructType(Seq(
    StructField("ind", IntegerType),
    StructField("user_name", StringType),
    StructField("age", IntegerType),
    StructField("date_joined", TimestampType)
  ))
}

// Typed views of the cleaned tables, for Dataset[T] call sites.
case class PinPost(
    ind: Int,
    unique_id: String,
    title: String,
    description: String,
    follower_count: Option[Int],
    poster_name: String,
    tag_list: String,
    is_image_or_video: String,
    image_src: String,
    save_location: String,
    category: String)

case class GeoEvent(
    ind: Int,
    country: String,
    coordinates: Seq[Float],
    timestamp: java.sql.Timestamp)

case class UserProfile(
    ind: Int,
    user_name: String,
    age: Option[Int],
    date_joined: java.sql.Timestamp)
