package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.HumanCount

/** U1 semantics: the custom Catalyst expression must agree with a
  * direct Scala model of the reference's Python UDF
  * (`(Clone) mount_s3_in_databricks.py:102-121`), on both the
  * interpreted and codegen paths, and with the pure-builtin variant.
  */
class HumanCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference model: int(float(s) * mult) with failure -> null. */
  private def model(s: String): Option[Int] = {
    if (s == null) return None
    val t = s.trim
    if (t.isEmpty) return None
    val (mult, num) = t.last match {
      case 'k' | 'K' => (1e3, t.dropRight(1))
      case 'm' | 'M' => (1e6, t.dropRight(1))
      case 'b' | 'B' => (1e9, t.dropRight(1))
      case _         => (1.0, t)
    }
    try {
      val v =
        if (mult == 1.0) java.lang.Long.parseLong(num).toDouble
        else num.toDouble * mult
      if (v.isNaN || v > Int.MaxValue || v < Int.MinValue) None else Some(v.toInt)
    } catch { case _: NumberFormatException => None }
  }

  private val fixedCases = Seq(
    "25", "532k", "25.5k", "1M", "0.9M", "", "NA", "N/A", "abc", null,
    "2B", "0.5B", "14K", "7m", " 42 ", "1e3", ".5k", "-3k", "-17", "25.5",
    "99999999999", "2147483647", "2147483648", "k", "M", "1.2.3k")

  test("fixed parse matrix matches the reference model (eval path)") {
    fixedCases.foreach { s =>
      val got = Option(HumanCount.parse(s)).map(_.intValue())
      assert(got == model(s), s"input '$s'")
    }
  }

  test("expression matches parse() through a DataFrame (codegen path)") {
    import spark.implicits._
    val df = fixedCases.toDF("s")
      .withColumn("parsed", HumanCount.human_count(col("s")))
    val got = df.collect().map(r =>
      (r.getString(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    got.foreach { case (s, v) => assert(v == model(s), s"input '$s'") }
  }

  test("builtin-functions twin agrees on the conventional formats") {
    import spark.implicits._
    // The builtin twin is documented as stricter on exotic floats; check
    // agreement on the formats the wire actually carries.
    val conventional = Seq("25", "532k", "25.5k", "1M", "0.9M", "", "NA",
      "abc", null, "14K", "7m", "-17", "2147483647")
    val df = conventional.toDF("s")
      .withColumn("a", HumanCount.human_count(col("s")))
      .withColumn("b", HumanCount.humanCountBuiltin(col("s")))
    df.collect().foreach { r =>
      val a = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val b = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(a == b, s"input '${r.getString(0)}'")
    }
  }

  test("property: expression == model on generated inputs") {
    val genNum = Gen.chooseNum(-1e7, 1e7).map(v => f"$v%.1f")
    val genSuffix = Gen.oneOf("", "k", "K", "m", "M", "b", "B")
    val genJunk = Gen.oneOf("", "NA", "xyz", "1.2.3", " ", "-")
    val gen = Gen.frequency(
      8 -> Gen.zip(genNum, genSuffix).map { case (n, s) => n + s },
      2 -> genJunk)
    val samples = Gen.listOfN(1000, gen)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator produced no sample"))
    samples.foreach { s =>
      val got = Option(HumanCount.parse(s)).map(_.intValue())
      assert(got == model(s), s"input '$s'")
    }
  }
}
