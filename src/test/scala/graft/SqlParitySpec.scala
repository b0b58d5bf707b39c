package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources

/** §3.3 parity: every query is reachable through both the DataFrame API
  * and `spark.sql` over registered temp views, with identical results;
  * custom expressions resolve from SQL text (word_shingles/human_count).
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q01 via spark.sql over temp views equals the DataFrame build") {
    Sources.loadAll(spark, TestSpark.sf0001) // registers temp views
    val sql = spark.sql(
      """WITH counts AS (
        |  SELECT r_name, c_mktsegment, count(*) AS cnt
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT r_name, c_mktsegment, cnt,
        |         row_number() OVER (PARTITION BY r_name
        |                            ORDER BY cnt DESC, c_mktsegment ASC) AS rn
        |  FROM counts
        |)
        |SELECT r_name, c_mktsegment, cnt FROM ranked WHERE rn = 1
        |ORDER BY r_name""".stripMargin)
    val df = graft.ops.StarQueries.q01.fn(spark, TestSpark.sf0001)
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("word_shingles resolves from SQL text and matches the Column API") {
    graft.expr.Functions.register(spark)
    val viaSql = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s, word_shingles('a b', 3) AS empty")
      .head()
    assert(viaSql.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(viaSql.getSeq[String](1).isEmpty)
    // n parameter as literal
    val two = spark.sql("SELECT word_shingles('a b c', 2) AS s").head().getSeq[String](0)
    assert(two == Seq("a b", "b c"))
  }

  test("rolling_fingerprint and repetition_profile resolve from SQL text") {
    graft.expr.Functions.register(spark)
    val fp = spark.sql(
      "SELECT rolling_fingerprint('abcdefghij').n_windows AS n").head().getLong(0)
    assert(fp == 3L) // 10 chars -> 3 windows of 8
    val rp = spark.sql(
      """SELECT rp.n_bigrams, rp.top_bigram_cnt, rp.dup_bigram,
        |       rp.n_trigrams, rp.dup_trigram
        |FROM (SELECT repetition_profile('a b a b a') AS rp)""".stripMargin).head()
    // bigrams: "a b","b a","a b","b a" -> 4 total, top 2, all duplicated
    assert(rp.getLong(0) == 4L && rp.getLong(1) == 2L && rp.getLong(2) == 4L)
    // trigrams: "a b a","b a b","a b a" -> 3 total, "a b a" duplicated (2)
    assert(rp.getLong(3) == 3L && rp.getLong(4) == 2L)
  }

  test("word_shingles equals the interpreted HOF formulation on real docs") {
    val docs = Sources.table(spark, TestSpark.sf0001, "documents").limit(100)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("fast", graft.expr.WordShingles.word_shingles(col("text"), 3))
      .withColumn("slow", expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
          |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))""".stripMargin))
    val bad = docs.filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }
}
