package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Tables

/** Tables.upsert must carry MERGE semantics, not "coalesce per column":
  * a matched update row wins wholesale (its NULLs null out base
  * values), and a duplicate update key — which would fan out its base
  * row — fails loudly instead of silently multiplying rows.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, Option("alice"), Option(10L)),
    (2L, Option("bob"), Option(20L)),
    (3L, Option("carol"), Option(30L))).toDF("id", "name", "score")

  test("upsert updates matched keys, inserts new keys, keeps the rest") {
    val updates = Seq(
      (2L, Option("bobby"), Option(25L)),
      (4L, Option("dave"), Option(40L))).toDF("id", "name", "score")
    val got = Tables.upsert(base, updates, "id")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "alice", 10L), (2L, "bobby", 25L),
      (3L, "carol", 30L), (4L, "dave", 40L)))
  }

  test("a NULL in an update column nulls the base value (update wins wholesale)") {
    val updates = Seq((2L, Option.empty[String], Option(99L)))
      .toDF("id", "name", "score")
    val got = Tables.upsert(base, updates, "id")
      .filter($"id" === 2L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(got.toSeq == Seq((2L, None, 99L)))
  }

  test("duplicate update keys raise instead of fanning out the base row") {
    val updates = Seq(
      (2L, Option("x"), Option(1L)),
      (2L, Option("y"), Option(2L))).toDF("id", "name", "score")
    val e = intercept[Exception] {
      Tables.upsert(base, updates, "id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate update key")), e.toString)
  }
}
