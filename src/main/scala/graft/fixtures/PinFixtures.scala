package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.Schemas

/** Deterministic pin/geo/user fixture generator (FIXTURES.md §A): the
  * reference ships no test data, so the engine's golden tests are fed by
  * this reconstruction of its wire schemas, covering every cleaning edge
  * case (placeholder nulls, human-count formats, enum canonicalization,
  * duplicate rows, lenient casts, bucket boundary ages).
  */
object PinFixtures {

  val followerMatrix: Seq[String] =
    Seq("25", "532k", "25.5k", "1M", "0.9M", "", "NA", "abc", null, "2B", "14K", "7m")

  private val categories =
    Seq("art", "diy", "travel", "food", "tech", null, "art", "art", "beauty", "travel")
  private val countries =
    Seq("Albania", "Brazil", "Canada", "Denmark", "Egypt", "Brazil", "Brazil", "Canada")
  private val isImageOrVideo =
    Seq("image", "video", "multi-video(story page format)", null, "image")

  def pinRaw(spark: SparkSession, n: Int = 120): DataFrame = {
    val rows = (0 until n).map { i =>
      val base = Row(
        i % (n / 2 + 7), // duplicate ind values
        f"uuid-$i%04d",
        if (i % 11 == 0) "" else if (i % 13 == 0) "N/A" else s"Title $i",
        if (i % 17 == 0) "NA" else s"Description $i",
        if (i % 7 == 0) null else s"Poster ${i % 9}",
        followerMatrix(i % followerMatrix.length),
        if (i % 5 == 0) "" else s"tag${i % 3},tag${i % 7},tag${i % 11}",
        isImageOrVideo(i % isImageOrVideo.length),
        s"https://img.example/$i.jpg",
        i % 2,
        s"Local save in /data/${categories(i % categories.length)}",
        categories(i % categories.length))
      base
    }
    // exact duplicate whole rows for the dedup test
    val withDups = rows ++ rows.take(10)
    spark.createDataFrame(
      spark.sparkContext.parallelize(withDups, 4), Schemas.pinRaw)
  }

  def geoRaw(spark: SparkSession, n: Int = 120): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(
        i % (n / 2 + 7),
        Timestamp.valueOf(f"${2017 + i % 7}%d-0${1 + i % 9}%d-1${i % 9}%d 12:3${i % 6}%d:00"),
        (10.0f + i * 0.25f),
        (-20.0f + i * 0.5f),
        countries(i % countries.length))
    }
    val withDups = rows ++ rows.take(5)
    spark.createDataFrame(
      spark.sparkContext.parallelize(withDups, 4), Schemas.geoRaw)
  }

  /** Boundary ages for the 18-24 / 25-35 / 36-50 / +50 buckets, plus a
    * non-numeric age exercising the lenient cast.
    */
  val ageMatrix: Seq[String] =
    Seq("17", "18", "24", "25", "35", "36", "50", "51", "not-a-number", "30")

  def userRaw(spark: SparkSession, n: Int = 120): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(
        i % (n / 2 + 7),
        s"First${i % 23}",
        s"Last${i % 19}",
        ageMatrix(i % ageMatrix.length),
        Timestamp.valueOf(f"${2014 + i % 8}%d-0${1 + i % 9}%d-0${1 + i % 9}%d 08:00:00"))
    }
    val withDups = rows ++ rows.take(5)
    spark.createDataFrame(
      spark.sparkContext.parallelize(withDups, 4), Schemas.userRaw)
  }

  /** The streaming wire shape: one JSON object per row in a `data`
    * string column (FIXTURES.md §A5), derived from the batch fixtures so
    * batch/stream parity tests compare like for like.
    */
  def envelope(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(to_json(struct(df.columns.map(col): _*)).as("data"))
  }
}
