package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.expr.HumanCount.human_count

/** The reference's seven analytics queries (SURVEY.md §3.4), re-expressed
  * over the driver's star schema: `customer ⋈ nation ⋈ region` plays the
  * reference's `pin ⋈ geo ⋈ user` 3-way join, `c_mktsegment` plays
  * `category`, `c_acctbal` bands play `age_group`, `o_orderdate` years
  * play `post_year`/joined-year, and `o_totalprice` plays
  * `follower_count`.
  *
  * Scale notes (the part the reference delegates to Databricks):
  * region/nation are O(10²) rows at any SF -> always broadcast; the
  * customer⋈orders join shuffles on the key both sides are already
  * grouped by afterwards, so the exchange is reused; top-1-per-group is
  * a window over the *aggregated* (small) frame, never the raw events;
  * the global top-1 is orderBy().limit(1) = TakeOrderedAndProject, not a
  * single-partition window (reference defect at
  * `(Clone) mount_s3_in_databricks.py:295-299`).
  */
object StarQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Top-1-per-group with deterministic tie-breaking — the engine's W1
    * (`(Clone) mount_s3_in_databricks.py:239-242`).
    */
  def topOnePerGroup(df: DataFrame, part: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(part.map(col): _*).orderBy(order: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")

  /** Q1 shape: most common market segment per region. */
  val q01 = OpQuery.oracled("q01_top_segment_per_region",
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
      |ORDER BY r_name""".stripMargin,
    doc = "reference Q1 (top category per country), MOUNT:227-248") { (spark, dir) =>
    val customer = Sources.table(spark, dir, "customer")
    val nation = Sources.table(spark, dir, "nation")
    val region = Sources.table(spark, dir, "region")
    val counts = customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "c_mktsegment").agg(count(lit(1)).as("cnt"))
    topOnePerGroup(counts, Seq("r_name"), Seq(col("cnt").desc, col("c_mktsegment").asc))
      .select("r_name", "c_mktsegment", "cnt")
      .orderBy("r_name")
  }

  /** Q2 shape: order counts per (year, priority) in a year range. */
  val q02 = OpQuery.oracled("q02_orders_per_year_priority",
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority, count(*) AS cnt
      |FROM orders
      |WHERE year(o_orderdate) BETWEEN 1996 AND 2000
      |GROUP BY 1, 2
      |ORDER BY order_year, o_orderpriority""".stripMargin,
    doc = "reference Q2 (category per post_year 2018-2022), MOUNT:250-268") { (spark, dir) =>
    Sources.table(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .filter(col("order_year").between(1996, 2000))
      .groupBy("order_year", "o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy("order_year", "o_orderpriority")
  }

  /** Q3 shape: top customer by total spend per nation. */
  val q03 = OpQuery.oracled("q03_top_customer_per_nation",
    """WITH spend AS (
      |  SELECT n_name, c_name,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT n_name, c_name, total_spend,
      |         row_number() OVER (PARTITION BY n_name
      |                            ORDER BY total_spend DESC, c_name ASC) AS rn
      |  FROM spend
      |)
      |SELECT n_name, c_name, total_spend FROM ranked WHERE rn = 1
      |ORDER BY n_name""".stripMargin,
    doc = "reference Q3 (top user by followers per country), MOUNT:270-289") { (spark, dir) =>
    val orders = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    val nation = Sources.table(spark, dir, "nation")
    val spend = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name", "c_name")
      .agg(dec(sum(dec(col("o_totalprice")))).cast("double").as("total_spend"))
    topOnePerGroup(spend, Seq("n_name"), Seq(col("total_spend").desc, col("c_name").asc))
      .select("n_name", "c_name", "total_spend")
      .orderBy("n_name")
  }

  /** Q3b shape: the nation of the single top spender — orderBy + limit 1
    * (TakeOrderedAndProject), not a global window.
    */
  val q03b = OpQuery.oracled("q03b_top_spender_nation",
    """SELECT n_name, c_name,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2
      |ORDER BY total_spend DESC, c_name ASC
      |LIMIT 1""".stripMargin,
    doc = "reference Q3b (country of global top user), MOUNT:292-300 — W2 replaced by TakeOrdered") { (spark, dir) =>
    val orders = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    val nation = Sources.table(spark, dir, "nation")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name", "c_name")
      .agg(dec(sum(dec(col("o_totalprice")))).cast("double").as("total_spend"))
      .orderBy(col("total_spend").desc, col("c_name").asc)
      .limit(1)
  }

  /** The acctbal banding that plays the reference's age_group CASE
    * (`(Clone) mount_s3_in_databricks.py:313-318`).
    */
  def balanceBand(c: Column): Column =
    when(c < 0, "negative")
      .when(c < 3000, "low")
      .when(c < 7000, "mid")
      .otherwise("high")

  private val balanceBandSql =
    """CASE WHEN c_acctbal < 0 THEN 'negative'
      |     WHEN c_acctbal < 3000 THEN 'low'
      |     WHEN c_acctbal < 7000 THEN 'mid'
      |     ELSE 'high' END""".stripMargin

  /** Q4 shape: most common segment per balance band. */
  val q04 = OpQuery.oracled("q04_top_segment_per_balance_band",
    s"""WITH banded AS (
      |  SELECT $balanceBandSql AS balance_band, c_mktsegment FROM customer
      |), counts AS (
      |  SELECT balance_band, c_mktsegment, count(*) AS cnt
      |  FROM banded GROUP BY 1, 2
      |), ranked AS (
      |  SELECT balance_band, c_mktsegment, cnt,
      |         row_number() OVER (PARTITION BY balance_band
      |                            ORDER BY cnt DESC, c_mktsegment ASC) AS rn
      |  FROM counts
      |)
      |SELECT balance_band, c_mktsegment, cnt FROM ranked WHERE rn = 1
      |ORDER BY balance_band""".stripMargin,
    doc = "reference Q4 (top category per age_group), MOUNT:302-331") { (spark, dir) =>
    val counts = Sources.table(spark, dir, "customer")
      .withColumn("balance_band", balanceBand(col("c_acctbal")))
      .groupBy("balance_band", "c_mktsegment").agg(count(lit(1)).as("cnt"))
    topOnePerGroup(counts, Seq("balance_band"), Seq(col("cnt").desc, col("c_mktsegment").asc))
      .select("balance_band", "c_mktsegment", "cnt")
      .orderBy("balance_band")
  }

  /** Q5 shape: exact median order price per market segment. */
  val q05 = OpQuery.oracled("q05_median_price_per_segment",
    """SELECT c_mktsegment,
      |       quantile_cont(o_totalprice, 0.5) AS median_price,
      |       count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1
      |ORDER BY c_mktsegment""".stripMargin,
    doc = "reference Q5 (median follower_count per age_group), MOUNT:333-363 — exact percentile, not approx") { (spark, dir) =>
    val orders = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** Q6 shape: distinct active customers per year in a range. */
  val q06 = OpQuery.oracled("q06_active_customers_per_year",
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      |       count(DISTINCT o_custkey) AS n_customers,
      |       count(*) AS n_orders
      |FROM orders
      |WHERE year(o_orderdate) BETWEEN 1996 AND 2000
      |GROUP BY 1
      |ORDER BY order_year""".stripMargin,
    doc = "reference Q6 (users joined per year 2015-2020), MOUNT:365-381") { (spark, dir) =>
    Sources.table(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .filter(col("order_year").between(1996, 2000))
      .groupBy("order_year")
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("order_year")
  }

  /** Q7 shape (a): median spend per order-year. */
  val q07a = OpQuery.oracled("q07a_median_price_per_year",
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      |       quantile_cont(o_totalprice, 0.5) AS median_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY order_year""".stripMargin,
    doc = "reference Q7 (median follower_count per join-year), MOUNT:400-410") { (spark, dir) =>
    Sources.table(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .groupBy("order_year")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("median_price"))
      .orderBy("order_year")
  }

  /** Q7 shape (b): median spend per (order-year, balance band). */
  val q07b = OpQuery.oracled("q07b_median_price_per_year_band",
    s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      |       $balanceBandSql AS balance_band,
      |       quantile_cont(o_totalprice, 0.5) AS median_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2
      |ORDER BY order_year, balance_band""".stripMargin,
    doc = "reference Q7 (median by join-year and age_group), MOUNT:423-445") { (spark, dir) =>
    val orders = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .withColumn("order_year", year(col("o_orderdate")))
      .withColumn("balance_band", balanceBand(col("c_acctbal")))
      .groupBy("order_year", "balance_band")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("median_price"))
      .orderBy("order_year", "balance_band")
  }

  /** U1 demo, oracle-checked: synthesize a human-formatted count string
    * from o_totalprice ("0.12M", "87.4k", "532"), parse it back with the
    * native HumanCountExpr, and aggregate. The DuckDB side re-implements
    * the parse in plain SQL, so this pins the custom expression's
    * semantics to an independent implementation.
    */
  val q08 = OpQuery.oracled("q08_human_count_roundtrip",
    """WITH cents_t AS (
      |  SELECT o_orderpriority,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders
      |), s AS (
      |  SELECT o_orderpriority,
      |         CASE WHEN cents >= 100000000
      |              THEN CAST((cents + 500000) // 1000000 // 100 AS VARCHAR) || '.' ||
      |                   lpad(CAST((cents + 500000) // 1000000 % 100 AS VARCHAR), 2, '0') || 'M'
      |              WHEN cents >= 100000
      |              THEN CAST((cents + 5000) // 10000 // 10 AS VARCHAR) || '.' ||
      |                   CAST((cents + 5000) // 10000 % 10 AS VARCHAR) || 'k'
      |              ELSE CAST(cents // 100 AS VARCHAR) END AS human
      |  FROM cents_t
      |), parsed AS (
      |  SELECT o_orderpriority,
      |         CASE WHEN human LIKE '%M' THEN CAST(trunc(CAST(substr(human, 1, length(human) - 1) AS DOUBLE) * 1000000) AS BIGINT)
      |              WHEN human LIKE '%k' THEN CAST(trunc(CAST(substr(human, 1, length(human) - 1) AS DOUBLE) * 1000) AS BIGINT)
      |              ELSE CAST(human AS BIGINT) END AS followers
      |  FROM s
      |)
      |SELECT o_orderpriority, CAST(sum(followers) AS BIGINT) AS total_followers, count(*) AS cnt
      |FROM parsed
      |GROUP BY 1
      |ORDER BY o_orderpriority""".stripMargin,
    doc = "U1 follower-count parse (MOUNT:102-121) pinned against an independent SQL implementation; " +
      "the human string is synthesized with exact integer-cents arithmetic so both engines format identically") { (spark, dir) =>
    // exact integer cents, then integer div/mod — double rounding would
    // diverge between engines on near-tie values
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    val human = when(col("cents") >= 100000000L,
        concat(expr("CAST((cents + 500000) div 1000000 div 100 AS STRING)"), lit("."),
          lpad(expr("CAST((cents + 500000) div 1000000 % 100 AS STRING)"), 2, "0"), lit("M")))
      .when(col("cents") >= 100000L,
        concat(expr("CAST((cents + 5000) div 10000 div 10 AS STRING)"), lit("."),
          expr("CAST((cents + 5000) div 10000 % 10 AS STRING)"), lit("k")))
      .otherwise(expr("CAST(cents div 100 AS STRING)"))
    Sources.table(spark, dir, "orders")
      .withColumn("cents", cents)
      .withColumn("human", human)
      .withColumn("followers", human_count(col("human")).cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum(col("followers")).as("total_followers"), count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[OpQuery] = Seq(q01, q02, q03, q03b, q04, q05, q06, q07a, q07b, q08)
}
