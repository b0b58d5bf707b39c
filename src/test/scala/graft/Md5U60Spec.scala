package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16-optimization rewrite of the house 60-bit md5 draw:
  * `md5_u60(s, off)` must equal
  * `CAST(conv(substr(md5(s), off + 1, 15), 16, 10) AS BIGINT)` for
  * off ∈ {0, 16} on every input class the engine feeds it — the
  * expression replaced that exact formulation on the dimsum coin,
  * the MinHash/Bloom hash halves, the HLL/KMV/AGMS key hashes and
  * qs22's streaming HLL (OPTIMIZATION_r16.md), so a drift here would
  * silently change every sampled draw and sketch in the registry.
  */
class Md5U60Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def convForm(col: String, off: Int): String =
    s"CAST(conv(substr(md5($col), ${off + 1}, 15), 16, 10) AS BIGINT)"

  test("md5_u60 equals the conv(substr(md5)) form on representative inputs") {
    val inputs = Seq(
      "", "a", "0", "hello world", "42|17|99",
      "élève", "中文测试", // non-ASCII
      "x" * 500, // long
      "line\nbreak", "tab\tsep", "sp  aces ")
    val df = inputs.toDF("s")
    val got = df.selectExpr(
      "s",
      "md5_u60(s) AS u0",
      "md5_u60(s, 16) AS u16",
      convForm("s", 0) + " AS c0",
      convForm("s", 16) + " AS c16").collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        s"half 0 mismatch for '${r.getString(0)}'")
      assert(r.getLong(2) == r.getLong(4),
        s"half 16 mismatch for '${r.getString(0)}'")
    }
  }

  test("md5_u60 equals the conv form on 10k random strings (both halves)") {
    val rnd = new scala.util.Random(42)
    val inputs = (1 to 10000).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString)
    val bad = inputs.toDF("s").selectExpr(
      s"sum(CASE WHEN md5_u60(s) != ${convForm("s", 0)} THEN 1 ELSE 0 END) AS b0",
      s"sum(CASE WHEN md5_u60(s, 16) != ${convForm("s", 16)} THEN 1 ELSE 0 END) AS b16")
      .head()
    assert(bad.getLong(0) == 0 && bad.getLong(1) == 0)
  }

  test("null propagates, range is [0, 2^60)") {
    val r = Seq[(String, Option[String])](("k", None), ("k2", Some("v")))
      .toDF("k", "s")
      .selectExpr("md5_u60(s) AS u").collect()
    assert(r.exists(_.isNullAt(0)) && r.exists(!_.isNullAt(0)))
    val mx = (1 to 1000).map(i => s"v$i").toDF("s")
      .selectExpr("max(md5_u60(s)) AS m", "min(md5_u60(s)) AS n").head()
    assert(mx.getLong(0) < (1L << 60) && mx.getLong(1) >= 0L)
  }
}
