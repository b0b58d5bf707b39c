package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Windows

/** The custom GroupTopK operator must be output-equivalent to the
  * row_number window formulation it replaces — on real tables, on
  * ties (with a tie-break column), on k larger than the group, and on
  * NULLs in the sort column.
  */
class WindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
      group: Seq[String], order: Seq[org.apache.spark.sql.Column],
      k: Int) = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  test("topKPerGroup equals the window formulation on the customer table") {
    val c = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val got = Windows.topKPerGroup(c, Seq("c_mktsegment"),
      Seq(("c_acctbal", true), ("c_custkey", false)), 3)
      .collect().map(_.toString).sorted.toSeq
    val want = windowTopK(c, Seq("c_mktsegment"),
      Seq(col("c_acctbal").desc, col("c_custkey").asc), 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    assert(got.size == 15) // 5 segments x 3
  }

  test("ties, small groups, and NULL sort values match the window plan") {
    val df = Seq(
      ("a", Option(10.0), 1L), ("a", Option(10.0), 2L), ("a", Option(10.0), 3L),
      ("a", Option(5.0), 4L),
      ("b", Option(1.0), 5L), // group smaller than k
      ("c", None, 6L), ("c", Option(2.0), 7L), ("c", None, 8L), ("c", Option(3.0), 9L)
    ).toDF("g", "s", "id")
    for (desc <- Seq(true, false); k <- Seq(1, 2, 3, 10)) {
      val ord = if (desc) Seq(col("s").desc, col("id").asc)
        else Seq(col("s").asc, col("id").asc)
      val got = Windows.topKPerGroup(df, Seq("g"),
        Seq(("s", desc), ("id", false)), k)
        .collect().map(_.toString).sorted.toSeq
      val want = windowTopK(df, Seq("g"), ord, k)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"desc=$desc k=$k")
    }
  }

  test("the plan is the two-phase heap exec with one exchange and no sort") {
    val c = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val p = Windows.topKPerGroup(c, Seq("c_mktsegment"),
      Seq(("c_acctbal", true), ("c_custkey", false)), 3)
      .queryExecution.executedPlan.toString
    // exec nodes print with the "Exec" suffix stripped
    assert("GroupTopK ".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("Sort "), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("histogramQuantiles: exact boundaries, single bucket, per-group independence") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group g1: buckets 0(x4), 1(x4), 2(x2) -> n=10
    //   q=0.5 -> target 5 -> bucket 1, est = 1*10 + (5-4)/4*10 = 12.5
    //   q=1.0 -> target 10 -> bucket 2, est = 2*10 + (10-8)/2*10 = 30.0
    // group g2: one bucket 7(x3) -> q=0.5 -> target 2 -> 7*10 + 2/3*10
    val hist = Seq(
      ("g1", 0L, 4L), ("g1", 1L, 4L), ("g1", 2L, 2L),
      ("g2", 7L, 3L)
    ).toDF("g", "bucket", "cnt")
    val got = graft.api.Windows.histogramQuantiles(
        hist, Seq("g"), "bucket", "cnt", Seq(0.5, 1.0), bucketWidth = 10L)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(("g1", 0.5)) == ((10L, 12.5)), got.toString)
    assert(got(("g1", 1.0)) == ((10L, 30.0)), got.toString)
    assert(got(("g2", 0.5)) == ((3L, 70.0 + 2.0 / 3.0 * 10.0)), got.toString)
    assert(got(("g2", 1.0)) == ((3L, 80.0)), got.toString)
    assert(got.size == 4, got.toString)
  }

  test("r67 decile cut: rank arithmetic yields all 10 buckets, sizes within 1, base-rate lift weighted to 1") {
    val rows = graft.ops.RelationalOps.r67.fn(spark, TestSpark.sf0001)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10), rows.mkString(","))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
    // Σ n_customers_d · lift_d = NC · Σ nb_d / NB = NC — the lift
    // column must be a weighted mean of exactly 1
    val nc = sizes.sum.toDouble
    val wsum = rows.map(r => r.getLong(1) * r.getDouble(5)).sum
    assert(math.abs(wsum - nc) < 1e-6, s"$wsum vs $nc")
  }
}
