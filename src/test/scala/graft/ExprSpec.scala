package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{ExactMedian, Functions}
import graft.io.{Sinks, Sources}

/** Extension-axis coverage: typed Aggregator, SQL function registration,
  * sinks (partitioned + bucketed), and the S6 offset/limit row sampler.
  */
class ExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ExactMedian aggregator matches built-in percentile per group") {
    val li = Sources.table(spark, TestSpark.sf0001, "lineitem")
    val got = li.groupBy("l_returnflag")
      .agg(
        ExactMedian.udaf(col("l_quantity")).as("m_agg"),
        percentile(col("l_quantity"), lit(0.5)).as("m_builtin"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
        s"flag ${r.getString(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("human_count registered as a SQL function (SQL/DataFrame parity)") {
    Functions.register(spark)
    val got = spark.sql(
      "SELECT human_count('532k') AS a, human_count('0.9M') AS b, human_count('abc') AS c")
      .head()
    assert(got.getInt(0) == 532000)
    assert(got.getInt(1) == 900000)
    assert(got.isNullAt(2))
    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(dp.getDouble(0) == 11.0)
  }

  test("partitioned parquet sink round-trips with partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val orders = Sources.table(spark, TestSpark.sf0001, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Sinks.parquet(orders, dir, partitionBy = Seq("order_year"))
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // partition pruning visible in the scan
    val plan = back.filter(col("order_year") === 1997)
      .queryExecution.executedPlan.toString
    assert(back.filter(col("order_year") === 1997).count() ==
      orders.filter(col("order_year") === 1997).count())
    assert(plan.contains("PartitionFilters"), plan.take(1500))
  }

  test("bucketed table join avoids the shuffle on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    val orders = Sources.table(spark, TestSpark.sf0001, "orders")
    Sinks.bucketed(orders, "orders_bucketed", Seq("o_custkey"), 4, Seq("o_custkey"))
    val t = spark.table("orders_bucketed")
    val agg = t.groupBy("o_custkey").count()
    val plan = agg.queryExecution.executedPlan.toString
    // aggregation on the bucket key needs no Exchange
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("sim_hash expression equals the relational majority-vote formulation") {
    // real corpus + adversarial edges: empty text, single token,
    // repeated tokens (distinctness), trailing space (empty token)
    val docs = Sources.table(spark, TestSpark.sf0001, "documents")
      .select("doc_id", "text")
      .unionByName(Seq(
        (100001L, ""), (100002L, "one"), (100003L, "a a a b"),
        (100004L, "tail space "), (100005L, "the the the"))
        .toDF("doc_id", "text"))
    val fast = graft.api.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val spec = graft.api.Dedup.simhashRelational(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast.size == spec.size)
    val diffs = fast.collect { case (k, v) if spec(k) != v => (k, v, spec(k)) }
    assert(diffs.isEmpty, s"simhash divergence: ${diffs.take(3)}")
  }

  test("rolling_fingerprint equals the relational explode-per-position formulation") {
    val docs = Sources.table(spark, TestSpark.sf0001, "documents")
      .select("doc_id", "text")
      .unionByName(Seq(
        (200001L, ""), (200002L, "short"), (200003L, "exactly8"),
        (200004L, "just over 8 chars"),
        // non-ASCII: multi-byte and supplementary (surrogate-pair) code
        // points — windows must count CODE POINTS, not UTF-16 units
        (200005L, "héllo wörld çafé niño"),
        (200006L, "music 𝄞 clef and 😀 emoji pad"),
        (200007L, "😀😁😂😃😄😅😆😇😈😉"))
        .toDF("doc_id", "text"))
    val fast = docs
      .select(col("doc_id"),
        graft.expr.RollingFingerprint.rolling_fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_min"), col("fp.fp_max"), col("fp.n_windows"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
    val spec = docs
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(length(text) - 7, 1))")).as("i"))
      .groupBy("doc_id")
      .agg(min(expr("md5(substr(text, i, 8))")).as("fp_min"),
        max(expr("md5(substr(text, i, 8))")).as("fp_max"),
        count(lit(1)).as("n_windows"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(fast.size == spec.size)
    val diffs = fast.collect { case (k, v) if spec(k) != v => (k, v, spec(k)) }
    assert(diffs.isEmpty, s"fingerprint divergence: ${diffs.take(3)}")
  }

  test("quantized_l2 equals the interpreted zip_with fold on real embeddings") {
    val e = Sources.table(spark, TestSpark.sf0001, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val pairs = e.select(col("vec_id").as("ida"), col("v").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("v").as("vb"))
        .filter(col("idb") % 7 === 0))
    val diffs = pairs
      .withColumn("fast", graft.expr.VectorExprs.quantized_l2(col("va"), col("vb")))
      .withColumn("spec",
        expr("""CAST(aggregate(zip_with(va, vb,
               |(x, y) -> CAST((x - y) * (x - y) * 1e12 AS BIGINT)),
               |0L, (a, y) -> a + y) AS BIGINT)""".stripMargin))
      .filter(col("fast") =!= col("spec"))
      .count()
    assert(diffs == 0L)
  }

  test("repetition_profile equals the relational explode-per-gram formulation") {
    val docs = Sources.table(spark, TestSpark.sf0001, "documents")
      .select("doc_id", "text")
      .unionByName(Seq(
        (300001L, "a b c"), (300002L, "a a a a a"),
        (300003L, "x y x y x y z"),
        // consecutive / leading / trailing spaces: split keeps empty
        // tokens and the expression must agree with split()'s view
        (300004L, "a  b  a  b"), (300005L, " a b "),
        (300006L, "one two"), (300007L, "solo"), (300008L, ""))
        .toDF("doc_id", "text"))
    def fieldMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val fast = fieldMap(docs
      .select(col("doc_id"),
        graft.expr.RepetitionProfile.repetition_profile(col("text")).as("rp"))
      .select(col("doc_id"), col("rp.n_bigrams"), col("rp.top_bigram_cnt"),
        col("rp.dup_bigram"), col("rp.n_trigrams"), col("rp.dup_trigram")))
    // relational spec: explode every gram, count per (doc, gram), reduce
    val tokens = docs.withColumn("ts", split(col("text"), " "))
    def stats(n: Int) = {
      val mk = (0 until n).map(k => s"element_at(ts, i + $k)")
        .mkString("concat_ws(' ', ", ", ", ")")
      tokens.filter(size(col("ts")) >= n)
        .select(col("doc_id"),
          explode(expr(s"transform(sequence(1, size(ts) - ${n - 1}), i -> $mk)")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(
          sum("cnt").as("total"), max("cnt").as("top"),
          sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup"))
    }
    val spec = stats(2).as("b").join(stats(3).as("t"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("b.total"), col("b.top"), col("b.dup"),
        coalesce(col("t.total"), lit(0L)), coalesce(col("t.dup"), lit(0L)))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // docs with <2 tokens have no relational row; the expression reports
    // zeros for them
    spec.foreach { case (k, v) =>
      assert(fast(k) == v, s"doc $k: fast=${fast(k)} spec=$v")
    }
    fast.collect { case (k, v) if !spec.contains(k) =>
      assert(v == ((0L, 0L, 0L, 0L, 0L)), s"doc $k unexpected profile $v")
    }
  }

  test("property: rolling fingerprint counts windows in code points on random unicode") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // code points across 1/2/3/4-byte UTF-8, including supplementary
    val genCp = Gen.frequency(
      5 -> Gen.choose(0x20, 0x7e),        // ASCII
      2 -> Gen.choose(0xa1, 0x2ff),      // 2-byte
      2 -> Gen.choose(0x4e00, 0x9fff),   // 3-byte (CJK)
      1 -> Gen.choose(0x1f300, 0x1f64f)) // 4-byte (emoji, surrogate pairs)
    val genStr = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, genCp).map(_.flatMap(Character.toChars(_).toSeq).mkString))
    val samples = Gen.listOfN(300, genStr)
      .apply(Gen.Parameters.default, Seed(7L)).get
    // naive reference: walk by code points with offsetByCodePoints
    def ref(s: String): (String, String, Long) = {
      val n = s.codePointCount(0, s.length)
      val wins = math.max(n - 7, 1)
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
      val hs = (0 until wins).map { i =>
        val from = s.offsetByCodePoints(0, i)
        val to = s.offsetByCodePoints(0, math.min(i + 8, n))
        md.reset(); hex(md.digest(s.substring(from, to).getBytes("UTF-8")))
      }
      (hs.min, hs.max, wins.toLong)
    }
    samples.foreach { s =>
      val row = graft.expr.RollingFingerprint.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val got = (row.getUTF8String(0).toString, row.getUTF8String(1).toString, row.getLong(2))
      assert(got == ref(s), s"diverged on ${s.take(40).codePoints().toArray.mkString(",")}")
    }
  }

  test("min_hash_sig expression equals the relational explode+groupBy formulation") {
    val docs = Sources.table(spark, TestSpark.sf0001, "documents")
      .select("doc_id", "text")
      .unionByName(Seq(
        (300001L, "a b"), // <3 tokens: no shingles, dropped on both paths
        (300002L, "a b c"), (300003L, "x x x x"))
        .toDF("doc_id", "text"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    val fast = toMap(graft.api.Dedup.minhashSignatures(docs))
    val spec = toMap(graft.api.Dedup.minhashSignaturesRelational(docs))
    assert(fast.size == spec.size && !fast.contains(300001L))
    val diffs = fast.collect { case (k, v) if spec(k) != v => k }
    assert(diffs.isEmpty, s"minhash divergence at docs $diffs")
  }

  test("S6 offset/limit row sampler is deterministic") {
    val c = Sources.table(spark, TestSpark.sf0001, "customer")
    def sample(n: Int) =
      c.orderBy("c_custkey").offset(n).limit(1).select("c_custkey").head().getLong(0)
    assert(sample(10) == sample(10))
    assert(sample(10) != sample(11))
  }

  test("hilbert layers are a bijective unit-step curve on the 256x256 grid") {
    // the r36 clustering key's defining property: every consecutive
    // pair of curve positions is Manhattan-adjacent (what makes
    // per-file bounding boxes tight in BOTH dimensions), and the map
    // is a bijection (no two cells share a position)
    val grid = spark.range(0, 256L * 256)
      .select((col("id") % 256).as("xlo"), (col("id") / 256).cast("bigint").as("ylo"))
      .withColumn("hx", col("xlo")).withColumn("hy", col("ylo"))
      .withColumn("hd", lit(0L))
    val curved = graft.ops.JoinOps.hilbertSteps.foldLeft(grid) { (df, s) =>
      val Seq(hd, hx, hy) = graft.ops.JoinOps.hilbertLayer(s)
      df.select(col("xlo"), col("ylo"), expr(hd), expr(hx), expr(hy))
    }.select("xlo", "ylo", "hd")
    assert(curved.select("hd").distinct().count() == 65536L)
    val w = org.apache.spark.sql.expressions.Window.orderBy("hd")
    val nonUnit = curved
      .withColumn("px", lag("xlo", 1).over(w))
      .withColumn("py", lag("ylo", 1).over(w))
      .filter(col("px").isNotNull &&
        abs(col("xlo") - col("px")) + abs(col("ylo") - col("py")) =!= 1)
      .count()
    assert(nonUnit == 0L, s"$nonUnit non-adjacent consecutive curve steps")
  }

  test("long_dot is bit-equal to the interpreted aggregate(zip_with) fold") {
    import spark.implicits._
    graft.expr.Functions.register(spark)
    // negatives, zeros, int8-code-sized and large values; equal lengths
    // (the only shape the quantized-code columns produce — long_dot's
    // documented contract)
    val vecs = (0 until 40).map { i =>
      val a = Array.tabulate(64)(j => ((i * 131 + j * 17) % 255 - 127).toLong)
      val b = Array.tabulate(64)(j => ((i * 37 + j * 101) % 255 - 127).toLong)
      (i.toLong, a, b)
    } :+ ((99L, Array(Long.MaxValue / 2, -3L), Array(4L, 5L))) // wraparound leg
    val df = vecs.toDF("id", "a", "b")
      .selectExpr("id", "long_dot(a, b) AS fast",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS hof")
      .collect()
    assert(df.length == vecs.length)
    df.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id ${r.getLong(0)}: long_dot ${r.getLong(1)} != hof ${r.getLong(2)}"))
    // null array -> null result, like every binary expression
    val n = spark.sql("SELECT long_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L))").head()
    assert(n.isNullAt(0))
  }

  test("long_l1 is bit-equal to the interpreted abs-diff fold") {
    import spark.implicits._
    graft.expr.Functions.register(spark)
    // negatives, zeros, m03-histogram-sized and large values; equal
    // lengths (long_l1's documented contract, same as long_dot's)
    val vecs = (0 until 40).map { i =>
      val a = Array.tabulate(16)(j => ((i * 131 + j * 17) % 100003).toLong - 50000L)
      val b = Array.tabulate(16)(j => ((i * 37 + j * 101) % 100003).toLong - 50000L)
      (i.toLong, a, b)
    } :+ ((99L, Array(Long.MinValue / 2, 7L), Array(Long.MaxValue / 2, -9L))) // wraparound leg
    val df = vecs.toDF("id", "a", "b")
      .selectExpr("id", "long_l1(a, b) AS fast",
        "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v) AS hof")
      .collect()
    assert(df.length == vecs.length)
    df.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id ${r.getLong(0)}: long_l1 ${r.getLong(1)} != hof ${r.getLong(2)}"))
    // null array -> null result, like every binary expression
    val n1 = spark.sql("SELECT long_l1(CAST(NULL AS ARRAY<BIGINT>), array(1L))").head()
    assert(n1.isNullAt(0))
  }

  test("quantizedDotArr is bit-equal to the quantized_dot column expression") {
    import spark.implicits._
    graft.expr.Functions.register(spark)
    // deterministic pseudo-random doubles incl. negatives and tiny values
    val vecs = (0 until 50).map { i =>
      val a = Array.tabulate(16)(j => math.sin(i * 16 + j) * (1 + j % 3))
      val b = Array.tabulate(16)(j => math.cos(i * 16 + j) / (1 + j % 5))
      (i.toLong, a, b)
    }
    val fromExpr = vecs.toDF("id", "a", "b")
      .selectExpr("id", "quantized_dot(a, b) AS d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, a, b) =>
      val scalar = graft.expr.VectorExprs.quantizedDotArr(a, b)
      assert(java.lang.Double.doubleToLongBits(scalar) ==
        java.lang.Double.doubleToLongBits(fromExpr(id)),
        s"vec $id: scalar $scalar != column ${fromExpr(id)}")
    }
  }
}
