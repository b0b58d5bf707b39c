package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Checkpoints.LineageOps

import graft.io.Sources

/** Similarity search over the `embeddings` table (`array<float>`, 64-d):
  * brute-force cosine top-k as the correctness baseline and a
  * random-hyperplane LSH-bucketed variant as the 100 TB path.
  *
  * Float determinism: per-element products are computed in IEEE double
  * (float -> double widening is exact), truncated toward zero at 1e-12
  * (integer picounits), and summed exactly as longs — order-insensitive,
  * so the cosine comes out bit-equal in both engines and the top-k
  * ranking is identical. Truncation (not a decimal cast) because
  * DuckDB's double->DECIMAL cast truncates while Spark's rounds.
  */
object SimilarityOps {

  /** Spark side: truncation-quantized dot product of two double arrays.
    * Each product is truncated toward zero at 1e-12 (integer picounits)
    * and summed exactly as a long — DuckDB's double->DECIMAL cast
    * truncates while Spark's rounds, so the quantizer must be an
    * explicit truncation in both dialects.
    */
  private[ops] def dotDec(a: String, b: String): String =
    s"quantized_dot($a, $b)" // codegen'd; bit-identical to the SQL
                             // aggregate/zip_with fold (see VectorExprs)

  /** DuckDB side of the same truncation-quantized dot product. */
  private[ops] def duckDot(a: String, b: String): String =
    s"""(CAST(list_sum(list_transform(generate_series(1, len($a)),
       |     i -> CAST(trunc(($a[i] * $b[i]) * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)""".stripMargin

  private[ops] def embedded(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.Functions.register(spark) // quantized_dot for expr() text
    Sources.table(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr(s"sqrt(${dotDec("v", "v")})"))
  }

  private[ops] val duckEmbedded =
    s"""SELECT vec_id, label, v, sqrt(${duckDot("v", "v")}) AS nrm
       |FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet'))""".stripMargin

  /** Brute-force cosine top-5 for a probe subset — the exactness
    * baseline every ANN variant is judged against.
    */
  val s01 = OpQuery.oracled("s01_knn_cosine_brute", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), probes AS (
       |  SELECT * FROM e WHERE vec_id % 50 = 0
       |), pairs AS (
       |  SELECT p.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ${duckDot("p.v", "c.v")} / (p.nrm * c.nrm) AS cos_sim
       |  FROM probes p, e c
       |  WHERE c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT q_id, neighbor_id, cos_sim,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |                            ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM pairs
       |)
       |SELECT q_id, rank, neighbor_id, cos_sim
       |FROM ranked WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin
  },
    doc = "brute-force cosine top-k (ANN correctness baseline)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("pv"), col("nrm").as("pnrm"))
    val pairs = probes.join(broadcast(e), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr(s"${dotDec("pv", "v")} / (pnrm * nrm)"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  // Deterministic pseudo-random hyperplane sign for (plane p, dim d):
  // +1 when the first md5 nibble of "p:d" is >= 8. The signs are plan
  // constants, so they are computed HERE once and inlined as literal
  // arrays in both dialects — no per-row hashing (the first version
  // recomputed 512 md5s per vector). Shared with api.Similarity so the
  // library surface and the registered queries agree on the planes.
  private[graft] def planeSigns(p: Int, dims: Int): Seq[Double] = {
    val mdd = java.security.MessageDigest.getInstance("MD5")
    (1 to dims).map { d =>
      val hex = mdd.digest(s"$p:$d".getBytes("UTF-8"))
      val nibble = (hex(0) & 0xf0) >> 4
      if (nibble >= 8) 1.0 else -1.0
    }
  }

  private val nPlanes = 8
  private val dims = 64

  private def signsSqlArray(p: Int): String =
    planeSigns(p, dims).map(v => if (v > 0) "1.0" else "-1.0").mkString(", ")

  /** The 8-bit LSH bucket of vector column v, quantized like the dot
    * product so the sign decision is bit-identical across engines.
    */
  private def bucketSqlSpark: String =
    (0 until nPlanes).map { p =>
      // D-suffixed literals: bare 1.0 parses as DECIMAL(2,1) in Spark SQL
      val signsD = planeSigns(p, dims).map(v => if (v > 0) "1.0D" else "-1.0D").mkString(", ")
      s"""(CASE WHEN quantized_dot(v, array($signsD)) >= 0 THEN '1' ELSE '0' END)"""
    }.mkString("concat(", ", ", ")")

  private def duckSignBit(p: Int): String =
    s"""(CASE WHEN list_sum(list_transform(generate_series(1, len(v)), d -> CAST(trunc(([${signsSqlArray(p)}]::DOUBLE[])[d] * v[d] * 1e12) AS BIGINT))) >= 0 THEN '1' ELSE '0' END)"""

  private def bucketSqlDuck: String =
    (0 until nPlanes).map(duckSignBit).mkString(" || ")

  /** LSH-bucketed approximate nearest neighbors: random-hyperplane
    * signatures partition the corpus into 2^8 buckets; search only the
    * probe's bucket. At 100 TB the bucket id is the shuffle/partition
    * key and each query touches 1/256th of the corpus.
    */
  val s02 = OpQuery.oracled("s02_ann_lsh_bucketed", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), b AS (
       |  SELECT vec_id, v, nrm, $bucketSqlDuck AS bucket FROM e
       |), probes AS (
       |  SELECT * FROM b WHERE vec_id % 50 = 0
       |), pairs AS (
       |  SELECT p.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ${duckDot("p.v", "c.v")} / (p.nrm * c.nrm) AS cos_sim
       |  FROM probes p JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT q_id, neighbor_id, cos_sim,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |                            ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM pairs
       |)
       |SELECT q_id, rank, neighbor_id, cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  },
    doc = "random-hyperplane LSH ANN (bucketed cosine top-k — the scale path)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = embedded(spark, dir)
      .withColumn("bucket", expr(bucketSqlSpark))
      .select("vec_id", "v", "nrm", "bucket")
    val probes = b.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("bucket").as("pbucket"))
    val pairs = probes
      .join(b, col("bucket") === col("pbucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr(s"${dotDec("pv", "v")} / (pnrm * nrm)"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos_sim"))
      .orderBy("q_id", "rank")
  }

  /** Per-label embedding profile: count + mean vector norm (exact
    * decimal accumulation of the norms).
    */
  val s03 = OpQuery.oracled("s03_label_norm_stats",
    s"""WITH e AS (
       |  $duckEmbedded
       |)
       |SELECT label, count(*) AS n_vecs,
       |       (CAST(sum(CAST(trunc(nrm * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) / count(*) AS avg_norm
       |FROM e
       |GROUP BY label
       |ORDER BY label""".stripMargin,
    doc = "embedding norm statistics per label") { (spark, dir) =>
    embedded(spark, dir)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        ((sum(expr("CAST(nrm * 1e12 AS BIGINT)")).cast("double") / lit(1e12)) / count(lit(1)))
          .as("avg_norm"))
      .orderBy("label")
  }

  /** IVF-style ANN: a deterministic centroid subset (vec_id % 250 = 0)
    * partitions the corpus into cells by nearest-centroid assignment;
    * each probe searches only its 2 nearest cells (nprobe=2). At 100 TB
    * the cell id is the partition key: build once, then every query
    * touches k/nprobe of the corpus. Complements the hyperplane-LSH
    * variant (s02) with the inverted-file shape.
    */
  val s04 = OpQuery.oracled("s04_ann_ivf_cells", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), assign AS (
       |  SELECT e.vec_id, cent.c_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC)
       |         AS INT) AS crn
       |  FROM e, cent
       |), cells AS (
       |  SELECT vec_id, c_id FROM assign WHERE crn = 1
       |), probe_cells AS (
       |  SELECT vec_id, c_id FROM assign WHERE crn <= 2 AND vec_id % 50 = 0
       |), cand AS (
       |  SELECT DISTINCT p.vec_id AS q_id, c.vec_id AS neighbor_id
       |  FROM probe_cells p JOIN cells c ON c.c_id = p.c_id AND c.vec_id <> p.vec_id
       |), scored AS (
       |  SELECT cand.q_id, cand.neighbor_id,
       |         ${duckDot("pq.v", "cv2.v")} / (pq.nrm * cv2.nrm) AS cos_sim
       |  FROM cand
       |  JOIN e pq ON pq.vec_id = cand.q_id
       |  JOIN e cv2 ON cv2.vec_id = cand.neighbor_id
       |), ranked AS (
       |  SELECT q_id, neighbor_id, cos_sim,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT q_id, rank, neighbor_id, cos_sim
       |FROM ranked WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  },
    doc = "IVF-style ANN: nearest-centroid cells, nprobe=2 search (inverted-file scale path)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id").asc)
    // materialize the assignment once: cells and probe_cells otherwise
    // each re-run the centroid cross join (audit showed 2x BNLJ)
    val assign = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") <= 2)
      .select("vec_id", "c_id", "crn")
      .persist()
    val cells = assign.filter(col("crn") === 1).select("vec_id", "c_id")
    val probeCells = assign.filter(col("crn") <= 2 && col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("c_id"))
    val cand = probeCells
      .join(cells.select(col("vec_id").as("neighbor_id"), col("c_id")), Seq("c_id"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select("q_id", "neighbor_id").distinct()
    val scored = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("pv"), col("nrm").as("pnrm")), Seq("q_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .withColumn("cos_sim", expr(s"${dotDec("pv", "v")} / (pnrm * nrm)"))
    val wRank = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor_id", "cos_sim")
      .orderBy("q_id", "rank")
  }

  // s05 banding parameters: 4 bands x 8 sign bits (32 planes). bandBits
  // is the knob that must scale ~log2(N / targetBucket) with corpus
  // size; see api.Similarity.cosineNearDupPairs for the pair-count
  // bound. At sf0.01 (N=500) 2^8 buckets/band hold ~2 vectors each.
  private val ndBands = 4
  private val ndBandBits = 8

  /** Embedding-cosine near-duplicate pairs via banded hyperplane LSH:
    * candidates share ALL bits of ANY band, then the exact quantized
    * cosine verifies. This replaces the round-1 single fixed 8-bit
    * bucket, whose within-bucket all-pairs was O(N^2/256); the banded
    * form bounds expected candidates at nBands * N^2 / 2^(bandBits+1)
    * with bandBits sized to the corpus — linear in N when 2^bandBits
    * tracks N. Random test vectors rarely clear 0.8, so the result is
    * small-to-empty by design; the oracle must agree exactly either way.
    */
  val s05 = OpQuery.oracled("s05_embedding_near_dup_pairs", {
    val bandSelects = (0 until ndBands).map { b =>
      val bits = (b * ndBandBits until (b + 1) * ndBandBits)
        .map(duckSignBit).mkString(" || ")
      s"SELECT vec_id, '$b:' || $bits AS bk FROM e"
    }.mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH e AS (
       |  $duckEmbedded
       |), bands AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b ON b.bk = a.bk AND a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b,
       |       ${duckDot("ea.v", "eb.v")} / (ea.nrm * eb.nrm) AS cos_sim
       |FROM cand
       |JOIN e ea ON ea.vec_id = vec_a
       |JOIN e eb ON eb.vec_id = vec_b
       |WHERE ${duckDot("ea.v", "eb.v")} / (ea.nrm * eb.nrm) >= 0.8
       |ORDER BY vec_a, vec_b""".stripMargin
  },
    doc = "embedding-cosine near-dup pairs (banded hyperplane LSH + exact verify)") { (spark, dir) =>
    val e = embedded(spark, dir).select("vec_id", "v", "nrm").persist()
    val bandKeys = (0 until ndBands).map { b =>
      val bits = (b * ndBandBits until (b + 1) * ndBandBits).map { p =>
        val signsD = planeSigns(p, dims).map(v => if (v > 0) "1.0D" else "-1.0D").mkString(", ")
        s"(CASE WHEN quantized_dot(v, array($signsD)) >= 0 THEN '1' ELSE '0' END)"
      }.mkString(", ")
      expr(s"concat('$b:', $bits)")
    }
    val bands = e.select(col("vec_id"), explode(array(bandKeys: _*)).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cos_sim", expr(s"${dotDec("va", "vb")} / (na * nb)"))
      .filter(col("cos_sim") >= 0.8)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Recall@3 of both ANN variants (s02 hyperplane-LSH, s04 IVF)
    * against the brute-force baseline (s01) — the acceptance metric of
    * a similarity-search component. Deterministic: the planes and the
    * centroid subset are fixed, so recall is exactly reproducible and
    * fully SQL-expressible (the oracle re-derives all three searches).
    * One row per (method, probe): hits = |approx top-3 ∩ exact top-3|,
    * recall_at_3 = hits/3. Distributed shape: the intersection is a
    * join on (q_id, neighbor_id) — no per-probe collect; at 100 TB the
    * probe grid stays a frame and recall aggregates shuffle on q_id.
    */
  val s06 = OpQuery.oracled("s06_ann_recall_at_3", {
    def strip(sql: String): String = sql.trim
    s"""WITH exact AS (
       |  SELECT q_id, neighbor_id FROM (
       |${strip(s01.oracle.get)}
       |  ) WHERE rank <= 3
       |), lsh AS (
       |  SELECT q_id, neighbor_id FROM (
       |${strip(s02.oracle.get)}
       |  )
       |), ivf AS (
       |  SELECT q_id, neighbor_id FROM (
       |${strip(s04.oracle.get)}
       |  )
       |), m AS (
       |  SELECT 'lsh' AS method, q_id, neighbor_id FROM lsh
       |  UNION ALL
       |  SELECT 'ivf' AS method, q_id, neighbor_id FROM ivf
       |), matched AS (
       |  SELECT m.method, m.q_id, count(*) AS hits
       |  FROM m JOIN exact e ON e.q_id = m.q_id AND e.neighbor_id = m.neighbor_id
       |  GROUP BY 1, 2
       |), grid AS (
       |  SELECT method, vec_id AS q_id
       |  FROM read_parquet('{SFDIR}/embeddings.parquet')
       |  CROSS JOIN (SELECT unnest(['lsh', 'ivf']) AS method)
       |  WHERE vec_id % 50 = 0
       |)
       |SELECT g.method, g.q_id,
       |       CAST(coalesce(h.hits, 0) AS INT) AS hits,
       |       CAST(coalesce(h.hits, 0) AS DOUBLE) / 3 AS recall_at_3
       |FROM grid g LEFT JOIN matched h ON h.method = g.method AND h.q_id = g.q_id
       |ORDER BY 1, 2""".stripMargin
  },
    doc = "recall@3 of the ANN paths (s02 LSH, s04 IVF) vs the exact baseline (s01)") { (spark, dir) =>
    val exact = s01.fn(spark, dir).filter(col("rank") <= 3)
      .select("q_id", "neighbor_id")
    val approx = s02.fn(spark, dir).select("q_id", "neighbor_id")
      .withColumn("method", lit("lsh"))
      .unionByName(s04.fn(spark, dir).select("q_id", "neighbor_id")
        .withColumn("method", lit("ivf")))
    val matched = approx.join(exact, Seq("q_id", "neighbor_id"))
      .groupBy("method", "q_id").agg(count(lit(1)).as("hits0"))
    val methods = spark.range(1)
      .select(explode(array(lit("lsh"), lit("ivf"))).as("method"))
    val probeGrid = Sources.table(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"))
      .crossJoin(methods)
    probeGrid.join(matched, Seq("method", "q_id"), "left")
      .select(
        col("method"), col("q_id"),
        coalesce(col("hits0"), lit(0L)).cast("int").as("hits"),
        (coalesce(col("hits0"), lit(0L)).cast("double") / lit(3.0)).as("recall_at_3"))
      .orderBy("method", "q_id")
  }

  /** One distributed k-means (Lloyd) iteration over the embeddings:
    * assign every vector to its nearest centroid (s04's deterministic
    * centroid subset), recompute each cell's mean, report member count
    * and how far the centroid moved. This is the building block of
    * embedding-space clustering for corpus curation (topic balancing,
    * semantic dedup at the cluster level); iterating it is a driver
    * loop, each round exactly this shape.
    *
    * Scale shape: assignment is a broadcast of the (small) centroid set
    * against the corpus — no shuffle of the big side; the mean is a
    * posexplode to (cell, dim) rows aggregated with map-side partial
    * sums — 64 uniform keys per cell, no driver collect, no
    * collect_list of vectors. Per-dim sums are truncation-quantized to
    * integer picounits and summed exactly as longs, so the new centroid
    * is bit-identical across engines and summation orders (the same
    * trick the cosine queries use; double addition is not associative,
    * exact long addition is).
    */
  val s07 = OpQuery.oracled("s07_kmeans_iteration", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), assign AS (
       |  SELECT e.vec_id, cent.c_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC)
       |         AS INT) AS crn
       |  FROM e, cent
       |), cells AS (
       |  SELECT vec_id, c_id FROM assign WHERE crn = 1
       |), mem AS (
       |  SELECT c.c_id, e.v FROM cells c JOIN e ON e.vec_id = c.vec_id
       |), dims AS (
       |  SELECT c_id, i AS dim, CAST(trunc(v[i] * 1e12) AS BIGINT) AS q
       |  FROM mem, unnest(generate_series(1, len(v))) AS u(i)
       |), newc AS (
       |  SELECT c_id, dim,
       |         CAST(sum(q) AS DOUBLE) / 1e12 / count(*) AS nd,
       |         count(*) AS n
       |  FROM dims GROUP BY 1, 2
       |), oldc AS (
       |  SELECT c_id, i AS dim, cv[i] AS od
       |  FROM cent, unnest(generate_series(1, len(cv))) AS u(i)
       |), j AS (
       |  SELECT newc.c_id, newc.n,
       |         CAST(trunc((nd - od) * (nd - od) * 1e12) AS BIGINT) AS d2q
       |  FROM newc JOIN oldc USING (c_id, dim)
       |)
       |SELECT c_id, CAST(max(n) AS BIGINT) AS n_members,
       |       sqrt(CAST(sum(d2q) AS DOUBLE) / 1e12) AS centroid_shift
       |FROM j GROUP BY 1
       |ORDER BY c_id""".stripMargin
  },
    doc = "one distributed k-means iteration: broadcast assignment + exact quantized per-dim means") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent2 = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id").asc)
    // the vector rides through the assignment window, so membership
    // needs NO second corpus join — one pass assigns and carries v
    val cells = e.crossJoin(broadcast(cent2))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select("vec_id", "c_id", "v")
    val dims = cells
      .select(col("c_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("c_id"), col("dim"),
        expr("CAST(x * 1e12 AS BIGINT)").as("q"))
    val newc = dims.groupBy("c_id", "dim")
      .agg(sum("q").as("s"), count(lit(1)).as("n"))
      .withColumn("nd", col("s").cast("double") / 1e12 / col("n"))
    val oldc = cent2.select(col("c_id"), posexplode(col("cv")).as(Seq("dim", "od")))
    newc.join(oldc, Seq("c_id", "dim"))
      .select(col("c_id"), col("n"),
        expr("CAST((nd - od) * (nd - od) * 1e12 AS BIGINT)").as("d2q"))
      .groupBy("c_id")
      .agg(max("n").cast("bigint").as("n_members"),
        sqrt(sum("d2q").cast("double") / 1e12).as("centroid_shift"))
      .orderBy("c_id")
  }

  /** Int8 scalar quantization profile: symmetric absmax quantization of
    * every embedding (q_i = round(x_i * 127 / max|x|)) with the three
    * numbers a quantized-index rollout decision needs — saturation
    * count, quantized checksum, and worst per-dimension reconstruction
    * error. This is the compression step that makes a 100 TB float
    * index fit in a quarter of the space; the profile tells you what
    * recall it will cost BEFORE you rebuild the index.
    *
    * Determinism: float→double widening is exact; the scale division
    * and round-half-up (floor(x + 0.5)) are identical IEEE operations
    * in both engines; the reconstruction error is truncation-quantized
    * to integer picounits like every cosine in this file. Everything is
    * within-row (one codegen'd map stage, no shuffle at all — the
    * aggregate is per-vector, not cross-vector).
    */
  val s08 = OpQuery.oracled("s08_embedding_quantization",
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), m AS (
      |  SELECT vec_id, v,
      |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
      |              THEN 1.0 ELSE list_max(list_transform(v, x -> abs(x))) END AS maxabs
      |  FROM e
      |), q AS (
      |  SELECT vec_id, v, maxabs,
      |         list_transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT)) AS qv
      |  FROM m
      |)
      |SELECT vec_id, maxabs,
      |       CAST(len(list_filter(qv, y -> abs(y) >= 127)) AS INT) AS n_sat,
      |       CAST(list_sum(qv) AS BIGINT) AS sum_q,
      |       CAST(list_max(list_transform(generate_series(1, len(v)),
      |            i -> CAST(floor(abs(v[i] - qv[i] * maxabs / 127.0) * 1e12) AS BIGINT))) AS BIGINT) AS max_err_pico
      |FROM q
      |ORDER BY vec_id""".stripMargin,
    doc = "int8 absmax quantization profile: saturation, checksum, max reconstruction error") { (spark, dir) =>
    Sources.table(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("maxabs",
        expr("""CASE WHEN array_max(transform(v, x -> abs(x))) = 0D
               |THEN 1.0D ELSE array_max(transform(v, x -> abs(x))) END""".stripMargin))
      .withColumn("qv",
        expr("transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT))"))
      .select(col("vec_id"), col("maxabs"),
        expr("CAST(size(filter(qv, y -> abs(y) >= 127)) AS INT)").as("n_sat"),
        expr("CAST(aggregate(qv, 0L, (a, y) -> a + y) AS BIGINT)").as("sum_q"),
        expr("""CAST(array_max(zip_with(v, qv,
               |(x, y) -> CAST(floor(abs(x - y * maxabs / 127.0) * 1e12) AS BIGINT))) AS BIGINT)""".stripMargin)
          .as("max_err_pico"))
      .orderBy("vec_id")
  }

  /** Product quantization (PQ) encode: split every vector into two
    * subvectors, assign each half to its nearest codebook centroid
    * (squared-L2, picounit-quantized), emit the code pair and the two
    * residual errors. PQ is how a 100 TB float index becomes a
    * byte-per-subvector index (IVF-PQ = s04's cells + these codes);
    * log2(k) bits per subvector replaces 32 bits per dimension, and
    * distance queries become table lookups over the codebook.
    *
    * Codebooks here are the s04/s07 deterministic centroid subset
    * (vec_id % 250) restricted to each half — training them is s07
    * iterated per half. Scale shape: the codebook is broadcast (k
    * centroids x half-dim — kilobytes); assignment is one map-side
    * broadcast join over the corpus, ranked per (vector, half) by a
    * window whose partitions are k rows — no shuffle of the corpus
    * beyond the final per-vector regroup, same profile as s04's build.
    */
  val s09 = OpQuery.oracled("s09_product_quantization",
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), halves AS (
      |  SELECT vec_id, 0 AS h, list_slice(v, 1, len(v) // 2) AS sv FROM e
      |  UNION ALL
      |  SELECT vec_id, 1 AS h, list_slice(v, len(v) // 2 + 1, len(v)) AS sv FROM e
      |), cents AS (
      |  SELECT vec_id AS c_id, h, sv AS cv FROM halves WHERE vec_id % 250 = 0
      |), pairs AS (
      |  SELECT halves.vec_id, halves.h, cents.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(halves.sv)),
      |              i -> CAST(trunc((halves.sv[i] - cents.cv[i]) * (halves.sv[i] - cents.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves JOIN cents ON cents.h = halves.h
      |), assign AS (
      |  SELECT vec_id, h, c_id, qd,
      |         row_number() OVER (PARTITION BY vec_id, h ORDER BY qd ASC, c_id ASC) AS rn
      |  FROM pairs
      |)
      |SELECT vec_id,
      |       CAST(max(CASE WHEN h = 0 THEN c_id END) AS BIGINT) AS code0,
      |       CAST(max(CASE WHEN h = 1 THEN c_id END) AS BIGINT) AS code1,
      |       CAST(max(CASE WHEN h = 0 THEN qd END) AS BIGINT) AS err0_pico,
      |       CAST(max(CASE WHEN h = 1 THEN qd END) AS BIGINT) AS err1_pico
      |FROM assign WHERE rn = 1
      |GROUP BY 1
      |ORDER BY vec_id""".stripMargin,
    doc = "product-quantization encode: per-subvector nearest codebook centroid + residual") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Sources.table(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val halves = e.select(col("vec_id"), lit(0).as("h"),
        expr("slice(v, 1, size(v) DIV 2)").as("sv"))
      .unionAll(e.select(col("vec_id"), lit(1).as("h"),
        expr("slice(v, size(v) DIV 2 + 1, size(v) - size(v) DIV 2)").as("sv")))
    val cents = halves.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("h"), col("sv").as("cv"))
    // codegen'd quantized squared-L2 (picounit longs — truncation
    // toward zero matches DuckDB's trunc on the non-negative squares);
    // the interpreted zip_with fold lives in ExprSpec as its spec
    val pairs = halves.join(broadcast(cents), Seq("h"))
      .withColumn("qd",
        graft.expr.VectorExprs.quantized_l2(col("sv"), col("cv")))
    val w = Window.partitionBy("vec_id", "h").orderBy(col("qd").asc, col("c_id").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("vec_id")
      .agg(
        max(when(col("h") === 0, col("c_id"))).cast("bigint").as("code0"),
        max(when(col("h") === 1, col("c_id"))).cast("bigint").as("code1"),
        max(when(col("h") === 0, col("qd"))).cast("bigint").as("err0_pico"),
        max(when(col("h") === 1, col("qd"))).cast("bigint").as("err1_pico"))
      .orderBy("vec_id")
  }

  /** Brute-force maximum-inner-product top-3 — retrieval over
    * embeddings whose MAGNITUDE carries signal (recommender item
    * vectors, un-normalized rerankers), where cosine's normalization is
    * wrong. Same probe grid and quantized-dot determinism as s01; like
    * s01 it is the labeled exactness baseline, and the scale path is
    * the standard norm-augmentation reduction (append sqrt(M²-|x|²) as
    * an extra dimension, making MIPS a cosine problem s02/s04 already
    * solve at bucket scale).
    */
  val s10 = OpQuery.oracled("s10_mips_brute", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), probes AS (
       |  SELECT * FROM e WHERE vec_id % 50 = 0
       |), pairs AS (
       |  SELECT p.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ${duckDot("p.v", "c.v")} AS score
       |  FROM probes p, e c
       |  WHERE c.vec_id <> p.vec_id
       |), ranked AS (
       |  SELECT q_id, neighbor_id, score,
       |         CAST(row_number() OVER (PARTITION BY q_id
       |                            ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
       |  FROM pairs
       |)
       |SELECT q_id, rank, neighbor_id, score
       |FROM ranked WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  },
    doc = "brute-force max-inner-product top-k (un-normalized retrieval baseline; norm-augmentation is the bucketed path)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v")
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("pv"))
    val pairs = probes.join(broadcast(e), col("vec_id") =!= col("q_id"))
      .withColumn("score", expr(dotDec("pv", "v")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("score"))
      .orderBy("q_id", "rank")
  }

  /** PQ asymmetric-distance (ADC) top-3: the search that makes s09's
    * codes worth storing. Each probe precomputes one quantized-L2
    * entry per (half, centroid) — the ADC lookup table, probes x
    * centroids x 2 rows, broadcast — and every corpus vector is then
    * scored by TWO TABLE LOOKUPS on its byte codes instead of a 64-dim
    * distance: the scan reads (vec_id, code0, code1), never the
    * embedding. That I/O asymmetry is the entire PQ story at 100 TB —
    * the fleet scans codes (2 ints/vector here, 8-16 bytes in a real
    * deployment) while full vectors stay cold. Distances are picounit
    * longs end to end, so ranking is bit-deterministic and the oracle
    * (same pipeline in SQL) hash-matches.
    */
  val s11 = OpQuery.oracled("s11_pq_adc_topk",
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), halves AS (
      |  SELECT vec_id, 0 AS h, list_slice(v, 1, len(v) // 2) AS sv FROM e
      |  UNION ALL
      |  SELECT vec_id, 1 AS h, list_slice(v, len(v) // 2 + 1, len(v)) AS sv FROM e
      |), cents AS (
      |  SELECT vec_id AS c_id, h, sv AS cv FROM halves WHERE vec_id % 250 = 0
      |), pairs AS (
      |  SELECT halves.vec_id, halves.h, cents.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(halves.sv)),
      |              i -> CAST(trunc((halves.sv[i] - cents.cv[i]) * (halves.sv[i] - cents.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves JOIN cents ON cents.h = halves.h
      |), assign AS (
      |  SELECT vec_id, h, c_id, qd,
      |         row_number() OVER (PARTITION BY vec_id, h ORDER BY qd ASC, c_id ASC) AS rn
      |  FROM pairs
      |), codes AS (
      |  SELECT vec_id,
      |         max(CASE WHEN h = 0 THEN c_id END) AS code0,
      |         max(CASE WHEN h = 1 THEN c_id END) AS code1
      |  FROM assign WHERE rn = 1 GROUP BY 1
      |), lut AS (
      |  SELECT p.vec_id AS q_id, p.h, c.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(p.sv)),
      |              i -> CAST(trunc((p.sv[i] - c.cv[i]) * (p.sv[i] - c.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves p JOIN cents c ON c.h = p.h
      |  WHERE p.vec_id % 50 = 0
      |), scored AS (
      |  SELECT l0.q_id, codes.vec_id AS neighbor_id, l0.qd + l1.qd AS adist_pico
      |  FROM codes
      |  JOIN lut l0 ON l0.h = 0 AND l0.c_id = codes.code0
      |  JOIN lut l1 ON l1.h = 1 AND l1.c_id = codes.code1 AND l1.q_id = l0.q_id
      |  WHERE codes.vec_id <> l0.q_id
      |), ranked AS (
      |  SELECT q_id, neighbor_id, adist_pico,
      |         CAST(row_number() OVER (PARTITION BY q_id
      |                            ORDER BY adist_pico ASC, neighbor_id ASC) AS INT) AS rank
      |  FROM scored
      |)
      |SELECT q_id, rank, neighbor_id, CAST(adist_pico AS BIGINT) AS adist_pico
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin,
    doc = "PQ asymmetric-distance top-k: probe-side centroid lookup table, corpus scored on codes alone") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val rw = Window.partitionBy("q_id")
      .orderBy(col("adist_pico").asc, col("neighbor_id").asc)
    adcScored(spark, dir)
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("neighbor_id"),
        col("adist_pico").cast("bigint").as("adist_pico"))
      .orderBy("q_id", "rank")
  }

  /** The s11 ADC scoring stage, shared with the two-stage retriever
    * (s16): every (probe, corpus vector) pair scored on PQ codes alone
    * — (q_id, neighbor_id, adist_pico).
    */
  private def adcScored(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Sources.table(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val halves = e.select(col("vec_id"), lit(0).as("h"),
        expr("slice(v, 1, size(v) DIV 2)").as("sv"))
      .unionAll(e.select(col("vec_id"), lit(1).as("h"),
        expr("slice(v, size(v) DIV 2 + 1, size(v) - size(v) DIV 2)").as("sv")))
    val cents = halves.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("h"), col("sv").as("cv"))
    val aw = Window.partitionBy("vec_id", "h").orderBy(col("qd").asc, col("c_id").asc)
    val codes = halves.join(broadcast(cents), Seq("h"))
      .withColumn("qd", graft.expr.VectorExprs.quantized_l2(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(aw)).filter(col("rn") === 1)
      .groupBy("vec_id")
      .agg(max(when(col("h") === 0, col("c_id"))).as("code0"),
        max(when(col("h") === 1, col("c_id"))).as("code1"))
    val lut = halves.filter(col("vec_id") % 50 === 0)
      .join(broadcast(cents), Seq("h"))
      .withColumn("qd", graft.expr.VectorExprs.quantized_l2(col("sv"), col("cv")))
      .select(col("vec_id").as("q_id"), col("h"), col("c_id"), col("qd"))
    val l0 = lut.filter(col("h") === 0)
      .select(col("q_id"), col("c_id").as("code0"), col("qd").as("qd0"))
    val l1 = lut.filter(col("h") === 1)
      .select(col("q_id").as("q_id1"), col("c_id").as("code1"), col("qd").as("qd1"))
    codes
      .join(broadcast(l0), "code0")
      .join(broadcast(l1),
        col("q_id1") === col("q_id") && l1("code1") === codes("code1"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (col("qd0") + col("qd1")).as("adist_pico"))
  }

  /** ADC scoring of PLANTED mutant probes against the corpus codes —
    * the shared stage under the s12/s17 recall dials. Two deliberate
    * differences from [[adcScored]] (s11's stage): the probes are
    * s14's deterministic mutants (v + 0.01, cosine ≥ 0.996 to their
    * base — ground truth known a priori), and the codebook is denser
    * (`vec_id % 25 = 0` → 20 centroids per half at 500 vectors, vs
    * s11's deliberately tiny 2): a dial needs an operating point where
    * the metric can MOVE. With the toy 2-centroid book, recall is
    * pinned at 0.0 on any corpus (round-8 verdict: "documented but
    * inert"); with the trained-density book it lands strictly inside
    * (0, 1) — quantization tie-losses pull it below 1, real signal
    * keeps it above 0 — so a regression in the ADC path shows up as a
    * moved number, not as one constant replacing another.
    */
  private def plantedAdcScored(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Sources.table(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val halves = e.select(col("vec_id"), lit(0).as("h"),
        expr("slice(v, 1, size(v) DIV 2)").as("sv"))
      .unionAll(e.select(col("vec_id"), lit(1).as("h"),
        expr("slice(v, size(v) DIV 2 + 1, size(v) - size(v) DIV 2)").as("sv")))
    val cents = halves.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("c_id"), col("h"), col("sv").as("cv"))
    val aw = Window.partitionBy("vec_id", "h").orderBy(col("qd").asc, col("c_id").asc)
    val codes = halves.join(broadcast(cents), Seq("h"))
      .withColumn("qd", graft.expr.VectorExprs.quantized_l2(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(aw)).filter(col("rn") === 1)
      .groupBy("vec_id")
      .agg(max(when(col("h") === 0, col("c_id"))).as("code0"),
        max(when(col("h") === 1, col("c_id"))).as("code1"))
    val mutHalves = halves.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("q_id"), col("h"),
        expr("transform(sv, x -> x + 0.01D)").as("sv"))
    val lut = mutHalves.join(broadcast(cents), Seq("h"))
      .withColumn("qd", graft.expr.VectorExprs.quantized_l2(col("sv"), col("cv")))
      .select(col("q_id"), col("h"), col("c_id"), col("qd"))
    val l0 = lut.filter(col("h") === 0)
      .select(col("q_id"), col("c_id").as("code0"), col("qd").as("qd0"))
    val l1 = lut.filter(col("h") === 1)
      .select(col("q_id").as("q_id1"), col("c_id").as("code1"), col("qd").as("qd1"))
    codes
      .join(broadcast(l0), "code0")
      .join(broadcast(l1),
        col("q_id1") === col("q_id") && l1("code1") === codes("code1"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (col("qd0") + col("qd1")).as("adist_pico"))
  }

  /** The shared CTE block of the s12/s17 oracles: DuckDB twin of
    * [[plantedAdcScored]], ending in `scored(q_id, neighbor_id,
    * adist_pico)`.
    */
  private val duckPlantedScored =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), halves AS (
      |  SELECT vec_id, 0 AS h, list_slice(v, 1, len(v) // 2) AS sv FROM e
      |  UNION ALL
      |  SELECT vec_id, 1 AS h, list_slice(v, len(v) // 2 + 1, len(v)) AS sv FROM e
      |), cents AS (
      |  SELECT vec_id AS c_id, h, sv AS cv FROM halves WHERE vec_id % 25 = 0
      |), pairs AS (
      |  SELECT halves.vec_id, halves.h, cents.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(halves.sv)),
      |              i -> CAST(trunc((halves.sv[i] - cents.cv[i]) * (halves.sv[i] - cents.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves JOIN cents ON cents.h = halves.h
      |), assign AS (
      |  SELECT vec_id, h, c_id, qd,
      |         row_number() OVER (PARTITION BY vec_id, h ORDER BY qd ASC, c_id ASC) AS rn
      |  FROM pairs
      |), codes AS (
      |  SELECT vec_id,
      |         max(CASE WHEN h = 0 THEN c_id END) AS code0,
      |         max(CASE WHEN h = 1 THEN c_id END) AS code1
      |  FROM assign WHERE rn = 1 GROUP BY 1
      |), muth AS (
      |  SELECT vec_id + 1000000 AS q_id, h,
      |         list_transform(sv, x -> x + 0.01) AS sv
      |  FROM halves WHERE vec_id % 25 = 0
      |), lut AS (
      |  SELECT m.q_id, m.h, c.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(m.sv)),
      |              i -> CAST(trunc((m.sv[i] - c.cv[i]) * (m.sv[i] - c.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM muth m JOIN cents c ON c.h = m.h
      |), scored AS (
      |  SELECT l0.q_id, codes.vec_id AS neighbor_id, l0.qd + l1.qd AS adist_pico
      |  FROM codes
      |  JOIN lut l0 ON l0.h = 0 AND l0.c_id = codes.code0
      |  JOIN lut l1 ON l1.h = 1 AND l1.c_id = codes.code1 AND l1.q_id = l0.q_id
      |)""".stripMargin

  // Shared tail of the s12/s17 oracles and Spark sides: per-probe hit
  // (planted base found in top-3), with the aggregate dial (n_found,
  // n_planted, recall) carried on every row so a single hash compare
  // pins both the per-probe outcomes and the headline number.
  private val duckRecallTail =
    """SELECT q_id, CAST(hit AS INT) AS hit,
      |       CAST(sum(hit) OVER () AS INT) AS n_found,
      |       CAST(count(*) OVER () AS INT) AS n_planted,
      |       CAST(sum(hit) OVER () AS DOUBLE) / count(*) OVER () AS recall
      |FROM hits ORDER BY q_id""".stripMargin

  private def recallOutput(hits: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    hits.select(col("q_id"), col("hit").cast("int").as("hit"),
        sum(col("hit")).over(all).cast("int").as("n_found"),
        count(lit(1)).over(all).cast("int").as("n_planted"))
      .withColumn("recall",
        col("n_found").cast("double") / col("n_planted"))
      .orderBy("q_id")
  }

  /** Recall@3 of raw PQ-ADC search on planted near-identical queries —
    * the acceptance dial for the compressed path, at an operating point
    * where it carries signal (see [[plantedAdcScored]]: mutant probes
    * with a priori ground truth, trained-density codebook). A probe
    * scores a hit when its planted base survives quantization into the
    * ADC top-3 under deterministic (adist, id) tie-breaking; losses are
    * real quantization losses (the mutant landing in a different code
    * cell than its base, or the base losing an equal-adist tie), so the
    * number sits strictly inside (0, 1) and MOVES when the ADC path
    * regresses. s11 remains the value-oracled ADC machinery demo on the
    * deliberately tiny codebook — its raw-ADC ordering on this
    * near-random corpus carries no neighborhood signal, which is
    * exactly why the dial lives HERE, at the density a deployment
    * would train (s07).
    */
  val s12 = OpQuery.oracled("s12_pq_adc_recall_at_3",
    s"""$duckPlantedScored,
       |top3 AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY adist_pico ASC, neighbor_id ASC) AS rn
       |    FROM scored) WHERE rn <= 3
       |), hits AS (
       |  SELECT q_id,
       |         max(CASE WHEN neighbor_id = q_id - 1000000 THEN 1 ELSE 0 END) AS hit
       |  FROM top3 GROUP BY 1
       |)
       |$duckRecallTail""".stripMargin,
    doc = "recall@3 of raw PQ-ADC on planted mutant probes at trained codebook density — the compressed-path acceptance dial") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id")
      .orderBy(col("adist_pico").asc, col("neighbor_id").asc)
    val hits = plantedAdcScored(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy("q_id")
      .agg(max(when(col("neighbor_id") === col("q_id") - 1000000L, 1)
        .otherwise(0)).as("hit"))
    recallOutput(hits)
  }

  // Flip bit p (1-indexed) of the 8-char '0'/'1' bucket string `b` —
  // pure concat/substr/CASE text valid verbatim in both dialects.
  private def flipBit(b: String, p: Int): String =
    s"concat(substr($b, 1, ${p - 1}), " +
      s"CASE WHEN substr($b, $p, 1) = '1' THEN '0' ELSE '1' END, " +
      s"substr($b, ${p + 1}, ${nPlanes - p}))"

  /** Multi-probe LSH RADIUS search: every neighbor with cosine >= tau,
    * not a fixed top-k — the other half of the similarity-search API
    * (dedup-style "everything this close" queries; top-k answers "the
    * closest few"). Single-bucket LSH (s02's trade) misses near
    * neighbors that fall one sign-bit away, so each probe searches its
    * own bucket PLUS the 8 Hamming-1 buckets — query-directed
    * multi-probe: recall rises with probe count while the corpus-side
    * layout (bucket = partition key) is untouched, and each query
    * still reads a bounded 9/256ths of the corpus instead of
    * all-pairs. The 9 candidate bucket ids are distinct by
    * construction, so no (probe, candidate) pair is scored twice.
    */
  val s13 = OpQuery.oracled("s13_multiprobe_radius", {
    val cands = (1 to nPlanes).map(p => flipBit("p.bucket", p))
      .mkString(", ")
    s"""WITH e AS (
       |  $duckEmbedded
       |), b AS (
       |  SELECT vec_id, v, nrm, $bucketSqlDuck AS bucket FROM e
       |), probes AS (
       |  SELECT * FROM b WHERE vec_id % 50 = 0
       |), cand AS (
       |  SELECT p.vec_id AS q_id, p.v AS pv, p.nrm AS pnrm,
       |         unnest([p.bucket, $cands]) AS cand_bucket
       |  FROM probes p
       |)
       |SELECT q.q_id, c.vec_id AS neighbor_id,
       |       ${duckDot("q.pv", "c.v")} / (q.pnrm * c.nrm) AS cos_sim
       |FROM cand q JOIN b c ON c.bucket = q.cand_bucket AND c.vec_id <> q.q_id
       |WHERE ${duckDot("q.pv", "c.v")} / (q.pnrm * c.nrm) >= 0.25
       |ORDER BY q_id, neighbor_id""".stripMargin
  },
    doc = "multi-probe LSH radius search (cosine >= 0.25 within Hamming-1 buckets): bounded probes, layout untouched") { (spark, dir) =>
    val b = embedded(spark, dir)
      .withColumn("bucket", expr(bucketSqlSpark))
      .select("vec_id", "v", "nrm", "bucket")
    val probes = b.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("pv"),
        col("nrm").as("pnrm"), col("bucket").as("pbucket"))
    val candBuckets = array(
      col("pbucket") +: (1 to nPlanes).map(p => expr(flipBit("pbucket", p))): _*)
    val cand = probes.withColumn("cand_bucket", explode(candBuckets))
    cand
      .join(b, col("bucket") === col("cand_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr(s"${dotDec("pv", "v")} / (pnrm * nrm)"))
      .filter(col("cos_sim") >= 0.25)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos_sim"))
      .orderBy("q_id", "neighbor_id")
  }

  /** Top-1 recall of both ANN paths on PLANTED queries: each probe is
    * a deterministic mutant (v + 0.01, cosine >= 0.996 to its base),
    * so the right answer is known a priori — unlike s06/s12, whose
    * recall on the near-random corpus measures rank agreement among
    * ~0.3-cosine neighbors. A mutant misses only when blocking
    * separates it from its base (IVF: base outside the two probed
    * cells; LSH: one sign bit flips), so this isolates the blocking
    * loss — the number an ANN tuning loop actually watches.
    */
  val s14 = OpQuery.oracled("s14_planted_ann_recall", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), mutn AS (
       |  SELECT vec_id + 1000000 AS q_id, v, sqrt(${duckDot("v", "v")}) AS nrm
       |  FROM (SELECT vec_id, list_transform(v, x -> x + 0.01) AS v
       |        FROM e WHERE vec_id % 25 = 0)
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), cells AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT e.vec_id, cent.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC) AS rn
       |    FROM e, cent) WHERE rn = 1
       |), qcells AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT m.q_id, cent.c_id,
       |           row_number() OVER (PARTITION BY m.q_id
       |             ORDER BY ${duckDot("m.v", "cent.cv")} / (m.nrm * cent.cnrm) DESC, cent.c_id ASC) AS rn
       |    FROM mutn m, cent) WHERE rn <= 2
       |), ivf_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.q_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${duckDot("m.v", "c.v")} / (m.nrm * c.nrm) DESC, c.vec_id ASC) AS rn
       |    FROM qcells q
       |    JOIN cells cl ON cl.c_id = q.c_id
       |    JOIN e c ON c.vec_id = cl.vec_id
       |    JOIN mutn m ON m.q_id = q.q_id) WHERE rn = 1
       |), lshb AS (
       |  SELECT vec_id, v, nrm, $bucketSqlDuck AS bucket FROM e
       |), lshq AS (
       |  SELECT q_id, v, nrm, $bucketSqlDuck AS bucket FROM mutn
       |), lsh_top AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.q_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY q.q_id
       |             ORDER BY ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) DESC, c.vec_id ASC) AS rn
       |    FROM lshq q JOIN lshb c ON c.bucket = q.bucket) WHERE rn = 1
       |), np AS (SELECT count(*) AS n_planted FROM mutn)
       |SELECT method, n_planted, n_found,
       |       CAST(n_found AS DOUBLE) / n_planted AS recall
       |FROM (
       |  SELECT 'ivf_nprobe2' AS method, np.n_planted,
       |         (SELECT count(*) FROM ivf_top WHERE neighbor_id = q_id - 1000000) AS n_found
       |  FROM np
       |  UNION ALL
       |  SELECT 'lsh_bucket' AS method, np.n_planted,
       |         (SELECT count(*) FROM lsh_top WHERE neighbor_id = q_id - 1000000) AS n_found
       |  FROM np)
       |ORDER BY method""".stripMargin
  },
    doc = "ANN blocking loss on planted near-identical queries: top-1 recall of IVF(nprobe=2) and LSH-bucket search") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm").persist()
    val mutn = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("q_id"),
        expr("transform(v, x -> x + 0.01D)").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotDec("v", "v")})"))
      .persist()
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wBase = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("c_id").asc)
    val cells = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("rn", row_number().over(wBase)).filter(col("rn") === 1)
      .select("vec_id", "c_id")
    val wQ = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id").asc)
    val qcells = mutn.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("rn", row_number().over(wQ)).filter(col("rn") <= 2)
      .select("q_id", "c_id")
    def top1(cand: DataFrame): DataFrame = {
      // cand: (q_id, neighbor_id, cos_sim)
      val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("q_id", "neighbor_id")
    }
    val ivfTop = top1(qcells
      .join(cells.select(col("vec_id").as("neighbor_id"), col("c_id")), Seq("c_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("cvv"), col("nrm").as("cnr")), Seq("neighbor_id"))
      .join(mutn.select(col("q_id"), col("v").as("qv"), col("nrm").as("qnr")), Seq("q_id"))
      .withColumn("cos_sim", expr(s"${dotDec("qv", "cvv")} / (qnr * cnr)")))
    val lshb = e.withColumn("bucket", expr(bucketSqlSpark))
      .select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("v").as("cvv"), col("nrm").as("cnr"))
    val lshq = mutn.withColumn("bucket", expr(bucketSqlSpark))
      .select(col("q_id"), col("bucket"), col("v").as("qv"), col("nrm").as("qnr"))
    val lshTop = top1(lshq.join(lshb, Seq("bucket"))
      .withColumn("cos_sim", expr(s"${dotDec("qv", "cvv")} / (qnr * cnr)")))
    val nPlanted = mutn.count()
    def summarize(method: String, top: DataFrame): DataFrame =
      top.filter(col("neighbor_id") === col("q_id") - 1000000L)
        .agg(count(lit(1)).as("n_found"))
        .select(lit(method).as("method"), lit(nPlanted).as("n_planted"),
          col("n_found"),
          (col("n_found").cast("double") / nPlanted).as("recall"))
    summarize("ivf_nprobe2", ivfTop)
      .unionByName(summarize("lsh_bucket", lshTop))
      .orderBy("method")
  }

  /** IVF index health: the per-cell population histogram of the s04
    * assignment plus each cell's share of the corpus — the imbalance
    * diagnostic an ANN tuning loop watches (a hot cell turns nprobe
    * searches quadratic; the fix is more centroids or re-training,
    * and this is the number that says so). One broadcast-scored
    * assignment and one tiny aggregation; output scales with the
    * codebook, not the corpus.
    */
  val s15 = OpQuery.oracled("s15_ivf_cell_balance", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), cells AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT e.vec_id, cent.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC) AS rn
       |    FROM e, cent) WHERE rn = 1
       |)
       |SELECT c_id, count(*) AS n_vecs,
       |       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM cells) AS share
       |FROM cells GROUP BY 1 ORDER BY c_id""".stripMargin
  },
    doc = "IVF cell-population balance (per-cell share of the corpus; the ANN index-health diagnostic)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val w = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("c_id").asc)
    val cells = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "c_id")
    // total via a window over the codebook-sized frame — a count()
    // action here would re-run the whole assignment a second time
    cells.groupBy("c_id").agg(count(lit(1)).as("n_vecs"))
      .withColumn("share", col("n_vecs").cast("double")
        / sum(col("n_vecs")).over(Window.partitionBy()))
      .select("c_id", "n_vecs", "share")
      .orderBy("c_id")
  }

  /** Two-stage retrieval — the production PQ serving shape: the corpus
    * is scanned on CODES ALONE (s11's ADC scoring — the memory-
    * bandwidth win), a 10-deep shortlist survives per probe, and only
    * those ≤ 10·|Q| rows ever touch the full vectors for an exact
    * cosine re-rank. This restores exact top-3 ordering WITHIN the
    * shortlist while the full-vector read stays proportional to the
    * probe count, not the corpus (contrast s01, which broadcasts every
    * vector to every probe). The shortlist frame is broadcast into both
    * vector joins; a deployment with a large probe set would let the
    * re-rank hash-join shuffle on vec_id instead — same plan, one knob.
    */
  /** Shared oracle prefix for the two-stage retrievers (s16, s24): the
    * full ADC pipeline re-derivation (split-half PQ codes, probe LUT,
    * code-only scoring) down to the 10-deep `shortlist` per probe,
    * plus `en` = normed exact vectors for the re-rank stage.
    */
  private val duckAdcShortlist: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), halves AS (
      |  SELECT vec_id, 0 AS h, list_slice(v, 1, len(v) // 2) AS sv FROM e
      |  UNION ALL
      |  SELECT vec_id, 1 AS h, list_slice(v, len(v) // 2 + 1, len(v)) AS sv FROM e
      |), cents AS (
      |  SELECT vec_id AS c_id, h, sv AS cv FROM halves WHERE vec_id % 250 = 0
      |), pairs AS (
      |  SELECT halves.vec_id, halves.h, cents.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(halves.sv)),
      |              i -> CAST(trunc((halves.sv[i] - cents.cv[i]) * (halves.sv[i] - cents.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves JOIN cents ON cents.h = halves.h
      |), assign AS (
      |  SELECT vec_id, h, c_id, qd,
      |         row_number() OVER (PARTITION BY vec_id, h ORDER BY qd ASC, c_id ASC) AS rn
      |  FROM pairs
      |), codes AS (
      |  SELECT vec_id,
      |         max(CASE WHEN h = 0 THEN c_id END) AS code0,
      |         max(CASE WHEN h = 1 THEN c_id END) AS code1
      |  FROM assign WHERE rn = 1 GROUP BY 1
      |), lut AS (
      |  SELECT p.vec_id AS q_id, p.h, c.c_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(p.sv)),
      |              i -> CAST(trunc((p.sv[i] - c.cv[i]) * (p.sv[i] - c.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves p JOIN cents c ON c.h = p.h
      |  WHERE p.vec_id % 50 = 0
      |), scored AS (
      |  SELECT l0.q_id, codes.vec_id AS neighbor_id, l0.qd + l1.qd AS adist_pico
      |  FROM codes
      |  JOIN lut l0 ON l0.h = 0 AND l0.c_id = codes.code0
      |  JOIN lut l1 ON l1.h = 1 AND l1.c_id = codes.code1 AND l1.q_id = l0.q_id
      |  WHERE codes.vec_id <> l0.q_id
      |), shortlist AS (
      |  SELECT q_id, neighbor_id FROM (
      |    SELECT q_id, neighbor_id,
      |           row_number() OVER (PARTITION BY q_id
      |                              ORDER BY adist_pico ASC, neighbor_id ASC) AS rn
      |    FROM scored)
      |  WHERE rn <= 10
      |), en AS (
      |  SELECT vec_id, v, sqrt(${duckDot("v", "v")}) AS nrm FROM e
      |)""".stripMargin

  val s16 = OpQuery.oracled("s16_adc_rerank_topk",
    s"""$duckAdcShortlist, rer AS (
      |  SELECT s.q_id, s.neighbor_id,
      |         ${duckDot("q.v", "n.v")} / (q.nrm * n.nrm) AS cos_sim
      |  FROM shortlist s
      |  JOIN en q ON q.vec_id = s.q_id
      |  JOIN en n ON n.vec_id = s.neighbor_id
      |), ranked AS (
      |  SELECT q_id, neighbor_id, cos_sim,
      |         CAST(row_number() OVER (PARTITION BY q_id
      |                            ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
      |  FROM rer
      |)
      |SELECT q_id, rank, neighbor_id, cos_sim
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin,
    doc = "two-stage retrieval: ADC 10-deep shortlist on codes alone, exact cosine re-rank touches only shortlist vectors") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val sw = Window.partitionBy("q_id")
      .orderBy(col("adist_pico").asc, col("neighbor_id").asc)
    val shortlist = adcScored(spark, dir)
      .withColumn("rn", row_number().over(sw))
      .filter(col("rn") <= 10)
      .select("q_id", "neighbor_id")
    val en = embedded(spark, dir).select(col("vec_id"), col("v"), col("nrm"))
    val q = en.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("qnrm"))
    val n = en.select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
      col("nrm").as("nnrm"))
    val withQ = q.join(broadcast(shortlist), "q_id")
    val rer = n.join(broadcast(withQ), "neighbor_id")
      .withColumn("cos_sim", expr(s"${dotDec("qv", "nv")} / (qnrm * nnrm)"))
    val rw = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    rer.withColumn("rank", row_number().over(rw).cast("int"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor_id", "cos_sim")
      .orderBy("q_id", "rank")
  }

  /** Recall@3 of the TWO-STAGE retriever (ADC shortlist + exact
    * re-rank) on the same planted probes and codebook as s12 — the
    * acceptance dial for the system a user actually deploys. Read
    * together, s12 and s17 separate the two loss mechanisms: raw ADC
    * (s12) loses planted bases to equal-adist TIE-BREAKS inside a code
    * cell; the 10-deep shortlist retains those tied candidates and the
    * exact cosine re-rank recovers them (the base sits at ~0.996
    * cosine vs ~0.3 for its cellmates), so s17 ≥ s12 with the gap =
    * tie losses, and s17's own misses isolate true shortlist losses
    * (mutant quantized into a different cell than its base). Both
    * numbers are deterministic, strictly inside (0, 1], and move when
    * their stage regresses — codebook size and shortlist depth are the
    * two knobs a deployment turns (s07 trains the codebook).
    */
  val s17 = OpQuery.oracled("s17_rerank_recall_at_3",
    s"""$duckPlantedScored,
       |shortlist AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY adist_pico ASC, neighbor_id ASC) AS rn
       |    FROM scored) WHERE rn <= 10
       |), en AS (
       |  SELECT vec_id, v, sqrt(${duckDot("v", "v")}) AS nrm FROM e
       |), mutq AS (
       |  SELECT vec_id + 1000000 AS q_id,
       |         list_transform(v, x -> x + 0.01) AS qv
       |  FROM e WHERE vec_id % 25 = 0
       |), mutqn AS (
       |  SELECT q_id, qv, sqrt(${duckDot("qv", "qv")}) AS qnrm FROM mutq
       |), rer AS (
       |  SELECT s.q_id, s.neighbor_id,
       |         ${duckDot("m.qv", "n.v")} / (m.qnrm * n.nrm) AS cos_sim
       |  FROM shortlist s
       |  JOIN mutqn m ON m.q_id = s.q_id
       |  JOIN en n ON n.vec_id = s.neighbor_id
       |), top3 AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
       |    FROM rer) WHERE rn <= 3
       |), hits AS (
       |  SELECT q_id,
       |         max(CASE WHEN neighbor_id = q_id - 1000000 THEN 1 ELSE 0 END) AS hit
       |  FROM top3 GROUP BY 1
       |)
       |$duckRecallTail""".stripMargin,
    doc = "recall@3 of the two-stage ADC+rerank retriever on planted mutant probes (gap to s12 = tie losses the re-rank recovers)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val sw = Window.partitionBy("q_id")
      .orderBy(col("adist_pico").asc, col("neighbor_id").asc)
    val shortlist = plantedAdcScored(spark, dir)
      .withColumn("rn", row_number().over(sw)).filter(col("rn") <= 10)
      .select("q_id", "neighbor_id")
    val en = embedded(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
        col("nrm").as("nnrm"))
    val mutn = embedded(spark, dir).filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("q_id"),
        expr("transform(v, x -> x + 0.01D)").as("qv"))
      .withColumn("qnrm", expr(s"sqrt(${dotDec("qv", "qv")})"))
      .select("q_id", "qv", "qnrm")
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val hits = shortlist
      .join(broadcast(mutn), "q_id")
      .join(en, "neighbor_id")
      .withColumn("cos_sim", expr(s"${dotDec("qv", "nv")} / (qnrm * nnrm)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy("q_id")
      .agg(max(when(col("neighbor_id") === col("q_id") - 1000000L, 1)
        .otherwise(0)).as("hit"))
    recallOutput(hits)
  }

  /** The recall/cost frontier of the ANN family in ONE sweep: top-1
    * recall on s14's planted near-identical queries AND the
    * candidate-set size (rows scored — THE cost driver at 100 TB,
    * where wall-latency is candidates × corpus-partition reads) for
    * LSH at 4/6/8 signature bits and IVF at nprobe 1/2/4. This is the
    * table an index-tuning loop reads to pick an operating point:
    * recall rises with nprobe and falls with bits, candidates move the
    * other way. All six configurations share ONE signature frame and
    * ONE cell-assignment frame (persisted) — a sweep never re-hashes
    * the corpus; LSH width is a bucket-prefix truncation and IVF depth
    * is a rank filter on the same scored cell ranking. Counts are
    * exact integers; recall is the only division, done once per row.
    */
  val s18 = OpQuery.oracled("s18_ann_frontier_sweep", {
    def lshCtes(bits: Int): String =
      s"""lshc_$bits AS (
         |  SELECT q.q_id, c.neighbor_id,
         |         ${duckDot("q.v", "c.cv")} / (q.nrm * c.cnrm) AS cos_sim
         |  FROM lshq q JOIN lshb c
         |    ON substr(c.bucket, 1, $bits) = substr(q.bucket, 1, $bits)
         |), lsht_$bits AS (
         |  SELECT q_id, neighbor_id FROM (
         |    SELECT q_id, neighbor_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
         |    FROM lshc_$bits) WHERE rn = 1
         |), lshs_$bits AS (
         |  SELECT 'lsh' AS method, $bits AS param,
         |         (SELECT count(*) FROM lshc_$bits) AS n_candidates,
         |         (SELECT count(*) FROM lsht_$bits
         |          WHERE neighbor_id = q_id - 1000000) AS n_found
         |)""".stripMargin
    def ivfCtes(np: Int): String =
      s"""ivfc_$np AS (
         |  SELECT m.q_id, cl.vec_id AS neighbor_id,
         |         ${duckDot("m.v", "c.v")} / (m.nrm * c.nrm) AS cos_sim
         |  FROM qcells q
         |  JOIN cells cl ON cl.c_id = q.c_id
         |  JOIN e c ON c.vec_id = cl.vec_id
         |  JOIN mutn m ON m.q_id = q.q_id
         |  WHERE q.rn <= $np
         |), ivft_$np AS (
         |  SELECT q_id, neighbor_id FROM (
         |    SELECT q_id, neighbor_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
         |    FROM ivfc_$np) WHERE rn = 1
         |), ivfs_$np AS (
         |  SELECT 'ivf' AS method, $np AS param,
         |         (SELECT count(*) FROM ivfc_$np) AS n_candidates,
         |         (SELECT count(*) FROM ivft_$np
         |          WHERE neighbor_id = q_id - 1000000) AS n_found
         |)""".stripMargin
    s"""WITH e AS (
       |  $duckEmbedded
       |), mutn AS (
       |  SELECT vec_id + 1000000 AS q_id, v, sqrt(${duckDot("v", "v")}) AS nrm
       |  FROM (SELECT vec_id, list_transform(v, x -> x + 0.01) AS v
       |        FROM e WHERE vec_id % 25 = 0)
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), cells AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT e.vec_id, cent.c_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC) AS rn
       |    FROM e, cent) WHERE rn = 1
       |), qcells AS (
       |  SELECT q_id, c_id, rn FROM (
       |    SELECT m.q_id, cent.c_id,
       |           row_number() OVER (PARTITION BY m.q_id
       |             ORDER BY ${duckDot("m.v", "cent.cv")} / (m.nrm * cent.cnrm) DESC, cent.c_id ASC) AS rn
       |    FROM mutn m, cent) WHERE rn <= 4
       |), lshb AS (
       |  SELECT vec_id AS neighbor_id, v AS cv, nrm AS cnrm,
       |         $bucketSqlDuck AS bucket FROM e
       |), lshq AS (
       |  SELECT q_id, v, nrm, $bucketSqlDuck AS bucket FROM mutn
       |), ${lshCtes(4)}, ${lshCtes(6)}, ${lshCtes(8)},
       |${ivfCtes(1)}, ${ivfCtes(2)}, ${ivfCtes(4)},
       |np AS (SELECT count(*) AS n_planted FROM mutn)
       |SELECT method, CAST(param AS INT) AS param, np.n_planted,
       |       n_found, CAST(n_found AS DOUBLE) / np.n_planted AS recall,
       |       n_candidates
       |FROM (
       |  SELECT * FROM lshs_4 UNION ALL SELECT * FROM lshs_6
       |  UNION ALL SELECT * FROM lshs_8 UNION ALL SELECT * FROM ivfs_1
       |  UNION ALL SELECT * FROM ivfs_2 UNION ALL SELECT * FROM ivfs_4
       |) CROSS JOIN np
       |ORDER BY method, param""".stripMargin
  },
    doc = "recall/cost frontier sweep: planted-query recall + candidate-set size for LSH(4/6/8 bits) and IVF(nprobe 1/2/4), sharing one signature and one assignment frame") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm").persist()
    val mutn = e.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("q_id"),
        expr("transform(v, x -> x + 0.01D)").as("v"))
      .withColumn("nrm", expr(s"sqrt(${dotDec("v", "v")})"))
      .persist()
    val nPlanted = mutn.count()
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    def top1Hits(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("neighbor_id") === col("q_id") - 1000000L)
        .agg(count(lit(1)).as("n_found"))
    }
    def stats(method: String, param: Int, cand: DataFrame): DataFrame =
      top1Hits(cand)
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .select(lit(method).as("method"), lit(param).as("param"),
          lit(nPlanted).as("n_planted"), col("n_found"),
          (col("n_found").cast("double") / nPlanted).as("recall"),
          col("n_candidates"))
    // one signature frame for every LSH width
    val lshb = e.withColumn("bucket", expr(bucketSqlSpark))
      .select(col("vec_id").as("neighbor_id"), col("bucket"),
        col("v").as("cv"), col("nrm").as("cnrm")).persist()
    val lshq = mutn.withColumn("bucket", expr(bucketSqlSpark))
      .select(col("q_id"), col("bucket"), col("v").as("qv"),
        col("nrm").as("qnr")).persist()
    def lshCand(bits: Int): DataFrame =
      lshq.withColumn("bk", substring(col("bucket"), 1, bits))
        .join(lshb.withColumn("bk", substring(col("bucket"), 1, bits)),
          Seq("bk"))
        .withColumn("cos_sim", expr(s"${dotDec("qv", "cv")} / (qnr * cnrm)"))
        .select("q_id", "neighbor_id", "cos_sim")
    // one scored cell ranking for every nprobe depth
    val wBase = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("c_id").asc)
    val cells = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("rn", row_number().over(wBase)).filter(col("rn") === 1)
      .select("vec_id", "c_id").persist()
    val wQ = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id").asc)
    val qcells = mutn.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("rn", row_number().over(wQ)).filter(col("rn") <= 4)
      .select("q_id", "c_id", "rn").persist()
    def ivfCand(np: Int): DataFrame =
      qcells.filter(col("rn") <= np)
        .join(cells.select(col("vec_id").as("neighbor_id"), col("c_id")),
          Seq("c_id"))
        .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("cvv"),
          col("nrm").as("cnr")), Seq("neighbor_id"))
        .join(mutn.select(col("q_id"), col("v").as("qv"),
          col("nrm").as("qnr")), Seq("q_id"))
        .withColumn("cos_sim", expr(s"${dotDec("qv", "cvv")} / (qnr * cnr)"))
        .select("q_id", "neighbor_id", "cos_sim")
    Seq(4, 6, 8).map(b => stats("lsh", b, lshCand(b)))
      .reduce(_ unionByName _)
      .unionByName(Seq(1, 2, 4).map(np => stats("ivf", np, ivfCand(np)))
        .reduce(_ unionByName _))
      .orderBy("method", "param")
  }

  /** Filtered vector search — the question every vector store faces
    * when a metadata predicate rides along with the query (RAG over
    * one tenant's documents, search within a language): PREFILTER
    * (restrict candidates to the predicate, then search — exact, and
    * at 100 TB the predicate pushes to the parquet scan so the
    * candidate set shrinks BEFORE any distance math) versus POSTFILTER
    * (search unfiltered top-K', then apply the predicate — cheap to
    * bolt on, but neighbors the filter discards are simply LOST).
    * Here the postfilter path applies `label <= 2` (~30% selectivity)
    * to the exact unfiltered top-5 (s01's splice — using the exact
    * retriever isolates the filtering question from ANN error), the
    * prefilter path is the exact filtered top-3 truth; per probe the
    * output reports how many postfiltered results survive and their
    * recall against the truth. On this corpus postfilter recall decays
    * exactly as the textbook predicts: a 0.3-selective filter leaves
    * the unfiltered top-5 with ~1.5 expected eligible rows against a
    * truth set of 3.
    */
  val s19 = OpQuery.oracled("s19_filtered_ann", {
    def strip(sql: String): String = sql.trim
    s"""WITH e AS (
       |  $duckEmbedded
       |), probes AS (
       |  SELECT * FROM e WHERE vec_id % 50 = 0
       |), fpairs AS (
       |  SELECT p.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ${duckDot("p.v", "c.v")} / (p.nrm * c.nrm) AS cos_sim
       |  FROM probes p, e c
       |  WHERE c.vec_id <> p.vec_id AND c.label <= 2
       |), truth AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q_id, neighbor_id,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
       |    FROM fpairs
       |  ) WHERE rk <= 3
       |), post AS (
       |  SELECT s.q_id, s.neighbor_id
       |  FROM (
       |${strip(s01.oracle.get)}
       |  ) s
       |  JOIN e ON e.vec_id = s.neighbor_id
       |  WHERE e.label <= 2
       |), hits AS (
       |  SELECT t.q_id, count(*) AS n_hit
       |  FROM truth t JOIN post p
       |    ON p.q_id = t.q_id AND p.neighbor_id = t.neighbor_id
       |  GROUP BY 1
       |), npost AS (
       |  SELECT q_id, count(*) AS n_post FROM post GROUP BY 1
       |)
       |SELECT p.vec_id AS q_id,
       |       CAST(coalesce(np.n_post, 0) AS INT) AS n_post,
       |       CAST(coalesce(h.n_hit, 0) AS INT) AS hits,
       |       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 3 AS recall_at_3
       |FROM probes p
       |LEFT JOIN npost np ON np.q_id = p.vec_id
       |LEFT JOIN hits h ON h.q_id = p.vec_id
       |ORDER BY q_id""".stripMargin
  },
    doc = "filtered vector search: prefilter (exact within the predicate) vs postfilter (predicate applied to the unfiltered top-5) — per-probe survivor count and recall") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "label", "v", "nrm")
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("pv"),
        col("nrm").as("pnrm"))
    val cand = e.filter(col("label") <= 2)
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val truth = probes.join(broadcast(cand), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", expr(s"${dotDec("pv", "v")} / (pnrm * nrm)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val post = s01.fn(spark, dir)
      .join(e.select(col("vec_id").as("neighbor_id"), col("label")),
        "neighbor_id")
      .filter(col("label") <= 2)
      .select("q_id", "neighbor_id")
    val hits = truth.join(post, Seq("q_id", "neighbor_id"))
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    val npost = post.groupBy("q_id").agg(count(lit(1)).as("n_post0"))
    probes.select("q_id")
      .join(npost, Seq("q_id"), "left")
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_post0"), lit(0L)).cast("int").as("n_post"),
        coalesce(col("n_hit"), lit(0L)).cast("int").as("hits"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / lit(3.0))
          .as("recall_at_3"))
      .orderBy("q_id")
  }

  /** IVF index maintenance: SPLIT the hottest cell. s15 diagnoses cell
    * imbalance; this is the repair — the most-populated cell (the one
    * dragging every nprobe search that touches it) is split by one
    * deterministic 2-means round: seed A = the member with the lowest
    * vec_id, seed B = the member least similar to A (the standard
    * farthest-point heuristic, made deterministic by the quantized
    * cosine + id tie-break), members re-assigned to the nearer seed,
    * and each sub-cell's count + picounit-exact mean of dim 1 reported
    * (the s07 exact-mean formulation — sub-centroid math is oracle-
    * checked without emitting 64 columns).
    *
    * Scale shape: ONE corpus-wide broadcast assignment pass (shared
    * with s04/s07/s15 — in a deployment it's the index itself), then
    * everything downstream touches only the hot cell's members; the
    * three 1-row frames (hot cell, seed A, seed B) are broadcasts. At
    * 100 TB this is exactly the local repair you want: no global
    * re-clustering, no second corpus scan.
    */
  val s20 = OpQuery.oracled("s20_ivf_cell_split", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), assign AS (
       |  SELECT e.vec_id, cent.c_id, e.v, e.nrm,
       |         CAST(row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC)
       |         AS INT) AS crn
       |  FROM e, cent
       |), cells AS (
       |  SELECT vec_id, c_id, v, nrm FROM assign WHERE crn = 1
       |), hot AS (
       |  SELECT c_id AS hot_id, count(*) AS n_parent
       |  FROM cells GROUP BY 1
       |  ORDER BY count(*) DESC, c_id ASC LIMIT 1
       |), members AS (
       |  SELECT c.vec_id, c.v, c.nrm, h.hot_id, h.n_parent
       |  FROM cells c JOIN hot h ON c.c_id = h.hot_id
       |), sa AS (
       |  SELECT vec_id AS sa_id, v AS sa_v, nrm AS sa_nrm
       |  FROM members ORDER BY vec_id ASC LIMIT 1
       |), sb AS (
       |  SELECT m.vec_id AS sb_id, m.v AS sb_v, m.nrm AS sb_nrm
       |  FROM members m, sa
       |  WHERE m.vec_id <> sa.sa_id
       |  ORDER BY ${duckDot("m.v", "sa.sa_v")} / (m.nrm * sa.sa_nrm) ASC,
       |           m.vec_id ASC
       |  LIMIT 1
       |), asg AS (
       |  SELECT m.hot_id, m.n_parent, m.vec_id, m.v,
       |         CASE WHEN ${duckDot("m.v", "sb.sb_v")} / (m.nrm * sb.sb_nrm)
       |                 > ${duckDot("m.v", "sa.sa_v")} / (m.nrm * sa.sa_nrm)
       |              THEN 1 ELSE 0 END AS sub,
       |         sa.sa_id, sb.sb_id
       |  FROM members m, sa, sb
       |)
       |SELECT hot_id AS c_id, CAST(n_parent AS BIGINT) AS n_parent,
       |       CAST(sub AS INT) AS sub,
       |       CASE WHEN sub = 1 THEN sb_id ELSE sa_id END AS seed_id,
       |       CAST(count(*) AS BIGINT) AS n_members,
       |       CAST(sum(CAST(trunc(v[1] * 1e12) AS BIGINT)) AS DOUBLE)
       |         / 1e12 / count(*) AS mean_d1
       |FROM asg
       |GROUP BY 1, 2, 3, 4
       |ORDER BY sub""".stripMargin
  },
    doc = "IVF cell split: hottest cell repaired by a deterministic 2-means round (farthest-point seeds, broadcast-only after the shared assignment pass)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent2 = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id").asc)
    // persist the shared frames: hot / seed-A / seed-B / final are four
    // consumers of the same assignment subtree (the s04 lesson — the
    // corpus-wide pass must run once, not once per 1-row derivation)
    val cells = e.crossJoin(broadcast(cent2))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select("vec_id", "c_id", "v", "nrm")
      .persist()
    val hot = cells.groupBy("c_id").agg(count(lit(1)).as("n_parent"))
      .orderBy(col("n_parent").desc, col("c_id").asc).limit(1)
      .select(col("c_id").as("hot_id"), col("n_parent"))
    val members = cells.join(broadcast(hot), col("c_id") === col("hot_id"))
      .select("vec_id", "v", "nrm", "hot_id", "n_parent")
      .persist()
    val sa = members.orderBy(col("vec_id").asc).limit(1)
      .select(col("vec_id").as("sa_id"), col("v").as("sa_v"),
        col("nrm").as("sa_nrm"))
    val sb = members.crossJoin(broadcast(sa))
      .filter(col("vec_id") =!= col("sa_id"))
      .withColumn("ca", expr(s"${dotDec("v", "sa_v")} / (nrm * sa_nrm)"))
      .orderBy(col("ca").asc, col("vec_id").asc).limit(1)
      .select(col("vec_id").as("sb_id"), col("v").as("sb_v"),
        col("nrm").as("sb_nrm"))
    members.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("ca", expr(s"${dotDec("v", "sa_v")} / (nrm * sa_nrm)"))
      .withColumn("cb", expr(s"${dotDec("v", "sb_v")} / (nrm * sb_nrm)"))
      .withColumn("sub", when(col("cb") > col("ca"), 1).otherwise(0))
      .withColumn("seed_id",
        when(col("sub") === 1, col("sb_id")).otherwise(col("sa_id")))
      .groupBy(col("hot_id").as("c_id"), col("n_parent"), col("sub"),
        col("seed_id"))
      .agg(count(lit(1)).as("n_members"),
        (sum(expr("CAST(element_at(v, 1) * 1e12 AS BIGINT)")).cast("double")
          / 1e12 / count(lit(1))).as("mean_d1"))
      .orderBy("sub")
  }

  /** Scalar-quantized (int8) search recall — the SQ counterpart of the
    * PQ path (s11/s12): score every probe against int8 codes (s08's
    * absmax quantization) and measure top-3 recall vs the exact float
    * baseline (s01). The integer code dot product is EXACT arithmetic
    * (|dot| ≤ 64·127² < 2^21 — both engines agree bit for bit); the
    * only float work is the candidate-side dequant scale
    * `maxabs_c / nrm_c`, two correctly-rounded IEEE ops. Probe-side
    * scale factors are per-probe constants, so ranking by
    * `int_dot · maxabs_c / nrm_c` reproduces the approximate-cosine
    * order without ever touching the probe's float vector — at 100 TB
    * the corpus is stored and scanned as int8 codes (4× smaller than
    * float32, SIMD-friendly), and this query prices what that layout
    * costs in neighbor fidelity.
    */
  val s21 = OpQuery.oracled("s21_int8_search_recall", {
    def strip(sql: String): String = sql.trim
    s"""WITH exact3 AS (
       |  SELECT q_id, neighbor_id FROM (
       |${strip(s01.oracle.get)}
       |  ) WHERE rank <= 3
       |), e AS (
       |  $duckEmbedded
       |), m AS (
       |  SELECT vec_id, nrm,
       |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
       |              THEN 1.0 ELSE list_max(list_transform(v, x -> abs(x))) END AS maxabs,
       |         v
       |  FROM e
       |), q AS (
       |  SELECT vec_id, nrm, maxabs,
       |         list_transform(v, x -> CAST(floor(x * 127.0 / maxabs + 0.5) AS BIGINT)) AS qv
       |  FROM m
       |), probes AS (
       |  SELECT vec_id AS q_id, qv AS pq FROM q WHERE vec_id % 50 = 0
       |), pairs AS (
       |  SELECT p.q_id, c.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(generate_series(1, len(p.pq)),
       |              i -> p.pq[i] * c.qv[i])) AS DOUBLE) * c.maxabs / c.nrm AS score
       |  FROM probes p JOIN q c ON c.vec_id <> p.q_id
       |), ranked AS (
       |  SELECT q_id, neighbor_id,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY score DESC, neighbor_id ASC) AS rn
       |  FROM pairs
       |), approx AS (
       |  SELECT q_id, neighbor_id FROM ranked WHERE rn <= 3
       |), matched AS (
       |  SELECT a.q_id, count(*) AS hits
       |  FROM approx a JOIN exact3 x ON x.q_id = a.q_id AND x.neighbor_id = a.neighbor_id
       |  GROUP BY 1
       |)
       |SELECT p.q_id,
       |       CAST(coalesce(h.hits, 0) AS INT) AS hits,
       |       CAST(coalesce(h.hits, 0) AS DOUBLE) / 3 AS recall_at_3
       |FROM (SELECT DISTINCT q_id FROM probes) p
       |LEFT JOIN matched h ON h.q_id = p.q_id
       |ORDER BY p.q_id""".stripMargin
  },
    doc = "int8 scalar-quantized search: exact integer code dots + candidate-side dequant scale; top-3 recall vs the float baseline") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
      .withColumn("maxabs",
        expr("""CASE WHEN array_max(transform(v, x -> abs(x))) = 0D
               |THEN 1.0D ELSE array_max(transform(v, x -> abs(x))) END""".stripMargin))
      .withColumn("qv",
        expr("transform(v, x -> CAST(floor(x * 127.0D / maxabs + 0.5D) AS BIGINT))"))
      .select("vec_id", "qv", "maxabs", "nrm")
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("pq"))
    val pairs = probes.join(broadcast(e), col("vec_id") =!= col("q_id"))
      .withColumn("iscore",
        // codegen'd exact long dot: the HOF fold
        // aggregate(zip_with(pq, qv, (a, b) -> a*b), 0L, (acc, x) -> acc+x)
        // runs interpreted per pair — on the probes×corpus stream this is
        // the innermost loop of the whole query (ExprSpec pins the
        // bit-equivalence of the two forms)
        graft.expr.VectorExprs.long_dot(col("pq"), col("qv")))
      .withColumn("score", expr("CAST(iscore AS DOUBLE) * maxabs / nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id").asc)
    val approx = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val exact3 = s01.fn(spark, dir).filter(col("rank") <= 3)
      .select("q_id", "neighbor_id")
    val matched = approx.join(exact3, Seq("q_id", "neighbor_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits0"))
    probes.select("q_id").distinct()
      .join(matched, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits0"), lit(0L)).cast("int").as("hits"),
        (coalesce(col("hits0"), lit(0L)).cast("double") / lit(3.0)).as("recall_at_3"))
      .orderBy("q_id")
  }

  /** Embedding-distribution DRIFT monitor — the check a training-data
    * pipeline runs before trusting a new ingest wave: assign every
    * vector to its nearest codebook cell (the d14 two-level broadcast
    * codebook, [[graft.api.Dedup.cellAssignments]] — one codegen'd
    * projection, no row explosion), split the corpus into the
    * reference half vs the current half (vec_id parity — the stand-in
    * for "last month's snapshot vs this month's ingest"), and report
    * per-cell occupancy with each cell's total-variation contribution
    * `|n_ref/N_ref − n_cur/N_cur|`. A cell whose share moved is where
    * the embedding distribution drifted (new topic, new language,
    * collapsed encoder); the sum of `drift` over cells is 2×TV
    * distance. Exact integer counts; the only floats are two mirrored
    * divisions and one subtraction. Scale: assignment is a projection,
    * the census one groupBy over ≤k cells, totals a broadcast 1-row
    * cross join (the g17 `m` pattern).
    */
  /** The drift-report oracle, shared verbatim with its streaming twin
    * qs16 (same output contract: the batch s22 computes both halves in
    * one pass; qs16 folds the current half incrementally through the
    * agg-view sink — equality of the two against ONE oracle pins that
    * the incremental fold loses nothing).
    */
  private[ops] val centroidDriftSql: String = {
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), n AS (
      |  SELECT vec_id, v, sqrt(${DedupOps.duckQDot("v", "v")}) AS nrm FROM e
      |), cent AS (
      |  SELECT vec_id AS c_id, v AS cv, sqrt(${DedupOps.duckQDot("v", "v")}) AS cnrm,
      |         row_number() OVER (ORDER BY vec_id) - 1 AS rnk
      |  FROM e WHERE vec_id % 250 = 0
      |), gs AS (
      |  SELECT greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS g FROM cent
      |), reps AS (
      |  SELECT c_id, cv, cnrm FROM cent WHERE rnk % (SELECT g FROM gs) = 0
      |), vg AS (
      |  SELECT n.vec_id, r.c_id AS grp,
      |         row_number() OVER (
      |           PARTITION BY n.vec_id
      |           ORDER BY ${DedupOps.duckQDot("n.v", "r.cv")} / (n.nrm * r.cnrm) DESC, r.c_id ASC) AS rr
      |  FROM n, reps r
      |), vgrp AS (
      |  SELECT vec_id, grp FROM vg WHERE rr = 1
      |), fg AS (
      |  -- reps forced into their own group (mirrors CellIndex; see
      |  -- the d14 oracle's fg note)
      |  SELECT c.c_id, c.cv, c.cnrm,
      |         CASE WHEN c.rnk % (SELECT g FROM gs) = 0 THEN c.c_id
      |              ELSE r.c_id END AS grp,
      |         row_number() OVER (
      |           PARTITION BY c.c_id
      |           ORDER BY ${DedupOps.duckQDot("c.cv", "r.cv")} / (c.cnrm * r.cnrm) DESC, r.c_id ASC) AS rr
      |  FROM cent c, reps r
      |), fines AS (
      |  SELECT c_id, cv, cnrm, grp FROM fg WHERE rr = 1
      |), assign AS (
      |  SELECT n.vec_id, f.c_id,
      |         row_number() OVER (
      |           PARTITION BY n.vec_id
      |           ORDER BY ${DedupOps.duckQDot("n.v", "f.cv")} / (n.nrm * f.cnrm) DESC, f.c_id ASC) AS rn
      |  FROM n JOIN vgrp ON vgrp.vec_id = n.vec_id
      |         JOIN fines f ON f.grp = vgrp.grp
      |), cells AS (
      |  SELECT vec_id, c_id FROM assign WHERE rn = 1
      |), sides AS (
      |  SELECT c_id AS cell,
      |         sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
      |         sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
      |  FROM cells GROUP BY 1
      |), tot AS (
      |  SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM sides
      |)
      |SELECT cell, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |       abs(CAST(n_ref AS DOUBLE) / tr - CAST(n_cur AS DOUBLE) / tc) AS drift
      |FROM sides CROSS JOIN tot
      |ORDER BY cell""".stripMargin
  }

  val s22 = OpQuery.oracled("s22_centroid_drift", centroidDriftSql,
    doc = "embedding drift monitor: per-cell occupancy of the reference " +
      "vs current corpus halves under the d14 broadcast codebook, with " +
      "each cell's total-variation contribution (exact counts, " +
      "mirrored divisions)") { (spark, dir) =>
    val e = embedded(spark, dir).select("vec_id", "v")
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val cells = graft.api.Dedup.cellAssignments(e, cent)
    val sides = cells.groupBy(col("cell"))
      .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_cur"))
    val tot = sides.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    sides.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_ref"), col("n_cur"),
        abs(col("n_ref").cast("double") / col("tr")
          - col("n_cur").cast("double") / col("tc")).as("drift"))
      .orderBy("cell")
  }

  /** Cell-blocked exact k-NN GRAPH ([[graft.api.Dedup
    * .knnGraphWithinCells]]): every vector's top-3 neighbors within
    * its codebook cell — the construction step under graph ANN
    * indexes (NN-descent seeding, the HNSW base layer) and the
    * ranking SemDeDup applies inside each cluster. Unlike s04 (probe
    * subset, nprobe=2 search) this ranks EVERY vector, and unlike s05
    * (threshold pairs) it keeps a complete top-k even where nothing
    * clears a similarity bar. The oracle re-derives the d14 two-level
    * nearest-centroid assignment (reps forced into their own group)
    * and the within-cell rank with the same quantized cosine, so
    * hash-parity pins assignment, blocking, and ranking at once.
    * Scale: assignment is one codegen'd projection (the codebook
    * rides the expression), the self-join is per-cell (the IVF
    * population knob, never all-pairs), and the per-vector rank is a
    * bounded GroupTopK heap.
    */
  val s23 = OpQuery.oracled("s23_knn_graph", {
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), n AS (
      |  SELECT vec_id, v, sqrt(${DedupOps.duckQDot("v", "v")}) AS nrm FROM e
      |), cent AS (
      |  SELECT vec_id AS c_id, v AS cv, sqrt(${DedupOps.duckQDot("v", "v")}) AS cnrm,
      |         row_number() OVER (ORDER BY vec_id) - 1 AS rnk
      |  FROM e WHERE vec_id % 250 = 0
      |), gs AS (
      |  SELECT greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS g FROM cent
      |), reps AS (
      |  SELECT c_id, cv, cnrm FROM cent WHERE rnk % (SELECT g FROM gs) = 0
      |), vg AS (
      |  SELECT n.vec_id, r.c_id AS grp,
      |         row_number() OVER (
      |           PARTITION BY n.vec_id
      |           ORDER BY ${DedupOps.duckQDot("n.v", "r.cv")} / (n.nrm * r.cnrm) DESC, r.c_id ASC) AS rr
      |  FROM n, reps r
      |), vgrp AS (
      |  SELECT vec_id, grp FROM vg WHERE rr = 1
      |), fg AS (
      |  -- reps forced into their own group (mirrors CellIndex; see
      |  -- the d14 oracle's fg note)
      |  SELECT c.c_id, c.cv, c.cnrm,
      |         CASE WHEN c.rnk % (SELECT g FROM gs) = 0 THEN c.c_id
      |              ELSE r.c_id END AS grp,
      |         row_number() OVER (
      |           PARTITION BY c.c_id
      |           ORDER BY ${DedupOps.duckQDot("c.cv", "r.cv")} / (c.cnrm * r.cnrm) DESC, r.c_id ASC) AS rr
      |  FROM cent c, reps r
      |), fines AS (
      |  SELECT c_id, cv, cnrm, grp FROM fg WHERE rr = 1
      |), assign AS (
      |  SELECT n.vec_id, f.c_id,
      |         row_number() OVER (
      |           PARTITION BY n.vec_id
      |           ORDER BY ${DedupOps.duckQDot("n.v", "f.cv")} / (n.nrm * f.cnrm) DESC, f.c_id ASC) AS rn
      |  FROM n JOIN vgrp ON vgrp.vec_id = n.vec_id
      |         JOIN fines f ON f.grp = vgrp.grp
      |), cells AS (
      |  SELECT vec_id, c_id FROM assign WHERE rn = 1
      |), scored AS (
      |  SELECT a.vec_id, b.vec_id AS neighbor_id,
      |         ${DedupOps.duckQDot("na.v", "nb.v")} / (na.nrm * nb.nrm) AS cos_sim
      |  FROM cells a
      |  JOIN cells b ON b.c_id = a.c_id AND b.vec_id <> a.vec_id
      |  JOIN n na ON na.vec_id = a.vec_id
      |  JOIN n nb ON nb.vec_id = b.vec_id
      |), ranked AS (
      |  SELECT vec_id, neighbor_id, cos_sim,
      |         CAST(row_number() OVER (PARTITION BY vec_id
      |                                 ORDER BY cos_sim DESC, neighbor_id ASC)
      |              AS INT) AS rank
      |  FROM scored
      |)
      |SELECT vec_id, rank, neighbor_id, cos_sim
      |FROM ranked WHERE rank <= 3
      |ORDER BY vec_id, rank""".stripMargin
  },
    doc = "cell-blocked exact k-NN graph: top-3 neighbors per vector " +
      "within its broadcast-codebook cell (graph-ANN construction " +
      "step; per-cell join + bounded-heap rank, never all-pairs)") { (spark, dir) =>
    val e = Sources.table(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    graft.api.Dedup.knnGraphWithinCells(e, cent, k = 3)
      .orderBy("vec_id", "rank")
  }

  /** Shared oracle middle for s24/s25: relevance + pairwise-similarity
    * micros over the ADC shortlist, then the three unrolled greedy MMR
    * rounds (λ = 7/10, ties to the lower cand_id) as CTEs s1/s2/s3.
    */
  private val duckMmrRounds: String =
    s""", rel AS (
      |  SELECT s.q_id, s.neighbor_id AS cand_id,
      |         CAST(trunc((${duckDot("q.v", "n.v")} / (q.nrm * n.nrm)) * 1000000) AS BIGINT) AS rel_mic
      |  FROM shortlist s
      |  JOIN en q ON q.vec_id = s.q_id
      |  JOIN en n ON n.vec_id = s.neighbor_id
      |), ps AS (
      |  SELECT sa.q_id, sa.neighbor_id AS a_id, sb.neighbor_id AS b_id,
      |         CAST(trunc((${duckDot("na.v", "nb.v")} / (na.nrm * nb.nrm)) * 1000000) AS BIGINT) AS sim_mic
      |  FROM shortlist sa
      |  JOIN shortlist sb ON sb.q_id = sa.q_id
      |                   AND sb.neighbor_id <> sa.neighbor_id
      |  JOIN en na ON na.vec_id = sa.neighbor_id
      |  JOIN en nb ON nb.vec_id = sb.neighbor_id
      |), s1 AS (
      |  SELECT q_id, cand_id, 7 * rel_mic AS mmr_mic FROM (
      |    SELECT q_id, cand_id, rel_mic,
      |           row_number() OVER (PARTITION BY q_id
      |                              ORDER BY rel_mic DESC, cand_id ASC) AS rn
      |    FROM rel) WHERE rn = 1
      |), ms2 AS (
      |  SELECT p.q_id, p.a_id AS cand_id, max(p.sim_mic) AS max_sim
      |  FROM ps p JOIN s1 ON s1.q_id = p.q_id AND s1.cand_id = p.b_id
      |  GROUP BY 1, 2
      |), s2 AS (
      |  SELECT q_id, cand_id, mmr_mic FROM (
      |    SELECT r.q_id, r.cand_id,
      |           7 * r.rel_mic - 3 * m.max_sim AS mmr_mic,
      |           row_number() OVER (PARTITION BY r.q_id
      |                              ORDER BY 7 * r.rel_mic - 3 * m.max_sim DESC,
      |                                       r.cand_id ASC) AS rn
      |    FROM rel r
      |    JOIN ms2 m ON m.q_id = r.q_id AND m.cand_id = r.cand_id
      |    WHERE NOT EXISTS (SELECT 1 FROM s1
      |                      WHERE s1.q_id = r.q_id AND s1.cand_id = r.cand_id)
      |  ) WHERE rn = 1
      |), sel12 AS (
      |  SELECT q_id, cand_id FROM s1 UNION ALL SELECT q_id, cand_id FROM s2
      |), ms3 AS (
      |  SELECT p.q_id, p.a_id AS cand_id, max(p.sim_mic) AS max_sim
      |  FROM ps p JOIN sel12 s ON s.q_id = p.q_id AND s.cand_id = p.b_id
      |  GROUP BY 1, 2
      |), s3 AS (
      |  SELECT q_id, cand_id, mmr_mic FROM (
      |    SELECT r.q_id, r.cand_id,
      |           7 * r.rel_mic - 3 * m.max_sim AS mmr_mic,
      |           row_number() OVER (PARTITION BY r.q_id
      |                              ORDER BY 7 * r.rel_mic - 3 * m.max_sim DESC,
      |                                       r.cand_id ASC) AS rn
      |    FROM rel r
      |    JOIN ms3 m ON m.q_id = r.q_id AND m.cand_id = r.cand_id
      |    WHERE NOT EXISTS (SELECT 1 FROM sel12 s
      |                      WHERE s.q_id = r.q_id AND s.cand_id = r.cand_id)
      |  ) WHERE rn = 1
      |)""".stripMargin

  /** MMR-DIVERSIFIED two-stage retrieval: the s16 retriever (ADC
    * 10-deep shortlist on codes alone, exact cosine on the shortlist)
    * with the final cut made by maximal marginal relevance
    * ([[graft.api.Similarity.mmrSelect]], λ = 0.7) instead of plain
    * top-3 — the standard answer to "my top results are three copies
    * of the same document". Relevance and the pairwise shortlist
    * similarities are both quantized to integer micros from the same
    * bit-portable dot, so every MMR score is exact integer arithmetic;
    * the oracle unrolls the three greedy rounds as CTEs. Scale: the
    * only corpus-sized work is the shared ADC scoring pass; the MMR
    * rounds touch shortlist² rows per probe (≤ 90 here), never the
    * corpus.
    */
  val s24 = OpQuery.oracled("s24_mmr_diversified_rerank",
    s"""$duckAdcShortlist$duckMmrRounds
      |SELECT q_id, CAST(1 AS INT) AS pick_rank, cand_id, mmr_mic FROM s1
      |UNION ALL
      |SELECT q_id, CAST(2 AS INT) AS pick_rank, cand_id, mmr_mic FROM s2
      |UNION ALL
      |SELECT q_id, CAST(3 AS INT) AS pick_rank, cand_id, mmr_mic FROM s3
      |ORDER BY q_id, pick_rank""".stripMargin,
    doc = "MMR-diversified two-stage retrieval: ADC shortlist + exact-cosine relevance, 3 greedy maximal-marginal-relevance picks (lambda 0.7) in exact integer micros; oracle unrolls the greedy rounds") { (spark, dir) =>
    val (rel, pairSim) = mmrScoreFrames(spark, dir)
    graft.api.Similarity.mmrSelect(rel, pairSim, k = 3)
      .select("q_id", "pick_rank", "cand_id", "mmr_mic")
      .orderBy("q_id", "pick_rank")
  }

  /** The s24/s25 score frames: per-probe exact-cosine relevance over
    * the ADC 10-deep shortlist, and the pairwise shortlist
    * similarities, both in integer micros. Every greedy MMR round
    * re-reads both frames; on their raw lineage each reference
    * re-derives the whole ADC pipeline inside one physical plan
    * (~240 exchanges), so the lineage is cut hard with an eager
    * localCheckpoint (the cluster-fixpoint pattern — plan-cache
    * substitution does not reach through the GroupTopK wrapping the
    * greedy rounds use). Both frames are shortlist-sized
    * (≤ |probes|·90 rows); blocks are dropped by the Verify/Bench
    * per-query unpersist sweep.
    */
  private def mmrScoreFrames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val sw = Window.partitionBy("q_id")
      .orderBy(col("adist_pico").asc, col("neighbor_id").asc)
    val shortlist = adcScored(spark, dir)
      .withColumn("rn", row_number().over(sw))
      .filter(col("rn") <= 10)
      .select("q_id", "neighbor_id")
    val en = embedded(spark, dir).select(col("vec_id"), col("v"), col("nrm"))
    val q = en.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("qnrm"))
    val rel = en
      .select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
        col("nrm").as("nnrm"))
      .join(broadcast(q.join(broadcast(shortlist), "q_id")), "neighbor_id")
      .withColumn("rel_mic", expr(
        s"CAST((${dotDec("qv", "nv")} / (qnrm * nnrm)) * 1000000 AS BIGINT)"))
      .select(col("q_id"), col("neighbor_id").as("cand_id"), col("rel_mic"))
    val a = shortlist.select(col("q_id"), col("neighbor_id").as("a_id"))
      .join(en.select(col("vec_id").as("a_id"), col("v").as("av"),
        col("nrm").as("anrm")), "a_id")
    val pairSim = shortlist.select(col("q_id"), col("neighbor_id").as("b_id"))
      .join(en.select(col("vec_id").as("b_id"), col("v").as("bv"),
        col("nrm").as("bnrm")), "b_id")
      .join(broadcast(a), "q_id")
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim_mic", expr(
        s"CAST((${dotDec("av", "bv")} / (anrm * bnrm)) * 1000000 AS BIGINT)"))
      .select("q_id", "a_id", "b_id", "sim_mic")
    (rel.cutLineage, pairSim.cutLineage)
  }

  /** The s24 acceptance DIAL (the house pattern: every retrieval
    * operator ships the number that says whether it is doing its
    * job): per probe, the summed pairwise intra-list similarity (ILS)
    * of the 3 MMR picks vs the plain top-3, and the summed relevance
    * of each set — so the diversity BOUGHT (ILS drop) and the
    * relevance PAID (rel drop) are both visible, per probe, in exact
    * integer micros. Probes where the shortlist's head is already
    * diverse show identical sets (both deltas 0); probes with
    * near-clone heads show the trade. Everything runs on the same
    * checkpointed shortlist-sized frames as s24 — no extra
    * corpus-scale work beyond the shared ADC pass.
    */
  val s25 = OpQuery.oracled("s25_mmr_diversity_gain",
    s"""$duckAdcShortlist$duckMmrRounds, mmr AS (
      |  SELECT q_id, cand_id FROM s1
      |  UNION ALL SELECT q_id, cand_id FROM s2
      |  UNION ALL SELECT q_id, cand_id FROM s3
      |), plain AS (
      |  SELECT q_id, cand_id FROM (
      |    SELECT q_id, cand_id,
      |           row_number() OVER (PARTITION BY q_id
      |                              ORDER BY rel_mic DESC, cand_id ASC) AS rn
      |    FROM rel) WHERE rn <= 3
      |), mrel AS (
      |  SELECT r.q_id, CAST(sum(r.rel_mic) AS BIGINT) AS mmr_rel_sum
      |  FROM rel r JOIN mmr m ON m.q_id = r.q_id AND m.cand_id = r.cand_id
      |  GROUP BY 1
      |), prel AS (
      |  SELECT r.q_id, CAST(sum(r.rel_mic) AS BIGINT) AS top_rel_sum
      |  FROM rel r JOIN plain t ON t.q_id = r.q_id AND t.cand_id = r.cand_id
      |  GROUP BY 1
      |), mils AS (
      |  SELECT p.q_id, CAST(sum(p.sim_mic) AS BIGINT) AS mmr_ils_sum
      |  FROM ps p
      |  JOIN mmr a ON a.q_id = p.q_id AND a.cand_id = p.a_id
      |  JOIN mmr b ON b.q_id = p.q_id AND b.cand_id = p.b_id
      |  GROUP BY 1
      |), pils AS (
      |  SELECT p.q_id, CAST(sum(p.sim_mic) AS BIGINT) AS top_ils_sum
      |  FROM ps p
      |  JOIN plain a ON a.q_id = p.q_id AND a.cand_id = p.a_id
      |  JOIN plain b ON b.q_id = p.q_id AND b.cand_id = p.b_id
      |  GROUP BY 1
      |)
      |SELECT mrel.q_id, mrel.mmr_rel_sum, prel.top_rel_sum,
      |       mils.mmr_ils_sum, pils.top_ils_sum
      |FROM mrel
      |JOIN prel ON prel.q_id = mrel.q_id
      |JOIN mils ON mils.q_id = mrel.q_id
      |JOIN pils ON pils.q_id = mrel.q_id
      |ORDER BY mrel.q_id""".stripMargin,
    doc = "s24's acceptance dial: per-probe intra-list similarity and summed relevance of the MMR picks vs the plain top-3 — the diversity bought and the relevance paid, in exact integer micros") { (spark, dir) =>
    val (rel, pairSim) = mmrScoreFrames(spark, dir)
    // both pick-sets are read three times each below (one rel-sum +
    // two sides of the ILS self-join); checkpoint the ≤3-rows-per-
    // probe frames so the greedy-round lineage isn't re-planned per
    // reference (the s24 lesson, one level up)
    val mmr = graft.api.Similarity.mmrSelect(rel, pairSim, k = 3)
      .select("q_id", "cand_id").cutLineage
    val plain = graft.api.Windows.topKPerGroup(rel, Seq("q_id"),
      Seq(("rel_mic", true), ("cand_id", false)), 3)
      .select("q_id", "cand_id").cutLineage
    def relSum(set: DataFrame, name: String): DataFrame =
      rel.join(set, Seq("q_id", "cand_id"))
        .groupBy("q_id").agg(sum("rel_mic").cast("bigint").as(name))
    def ilsSum(set: DataFrame, name: String): DataFrame =
      pairSim
        .join(set.select(col("q_id"), col("cand_id").as("a_id")),
          Seq("q_id", "a_id"))
        .join(set.select(col("q_id"), col("cand_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy("q_id").agg(sum("sim_mic").cast("bigint").as(name))
    relSum(mmr, "mmr_rel_sum")
      .join(relSum(plain, "top_rel_sum"), "q_id")
      .join(ilsSum(mmr, "mmr_ils_sum"), "q_id")
      .join(ilsSum(plain, "top_ils_sum"), "q_id")
      .select("q_id", "mmr_rel_sum", "top_rel_sum",
        "mmr_ils_sum", "top_ils_sum")
      .orderBy("q_id")
  }

  /** ANN INDEX TOMBSTONE HEALTH — the maintenance half of the IVF
    * index lifecycle the build ops (s04/p05) and drift monitor (s22)
    * leave open: when corpus documents are deleted, a production
    * index does not rebuild per delete — deleted vectors become
    * TOMBSTONES filtered at query time, and the index is rebuilt when
    * a cell's dead share crosses a threshold (dead entries still cost
    * scan time and skew the cell geometry). The deletion set here is
    * deterministic (`vec_id % 7 = 0` — a 14% churn wave); output is
    * the per-cell health manifest: live/dead counts, exact floor-ppm
    * live share, and the integer-compare rebuild verdict
    * `5·n_dead > n_total` (dead share > 20%).
    *
    * Scale shape: cell assignment is the broadcast-codebook map stage
    * every IVF op shares; the manifest is one cell-grain aggregate.
    * The rebuild decision never touches vectors — only the counters a
    * real index keeps per posting list.
    */
  val s26 = OpQuery.oracled("s26_ann_tombstone_health", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), assign AS (
       |  SELECT e.vec_id, cent.c_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC)
       |         AS INT) AS crn
       |  FROM e, cent
       |), cells AS (
       |  SELECT vec_id, c_id FROM assign WHERE crn = 1
       |)
       |SELECT c_id,
       |       CAST(count(*) AS BIGINT) AS n_total,
       |       CAST(sum(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dead,
       |       CAST(((count(*) - sum(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END))
       |             * 1000000) // count(*) AS BIGINT) AS live_ppm,
       |       CAST(CASE WHEN 5 * sum(CASE WHEN vec_id % 7 = 0 THEN 1 ELSE 0 END)
       |                      > count(*)
       |                 THEN 1 ELSE 0 END AS INT) AS rebuild
       |FROM cells
       |GROUP BY 1 ORDER BY c_id""".stripMargin
  },
    doc = "IVF index tombstone health: deterministic delete wave marked dead per cell, exact floor-ppm live share + integer-compare rebuild verdict (dead share > 20%) — the index-maintenance counter surface") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id").asc)
    e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .withColumn("dead", when(col("vec_id") % 7 === 0, 1L).otherwise(0L))
      .groupBy("c_id")
      .agg(count(lit(1)).cast("bigint").as("n_total"),
        sum("dead").cast("bigint").as("n_dead"))
      .select(col("c_id"), col("n_total"), col("n_dead"),
        expr("CAST(((n_total - n_dead) * 1000000) div n_total AS BIGINT)")
          .as("live_ppm"),
        when(lit(5) * col("n_dead") > col("n_total"), 1).otherwise(0)
          .cast("int").as("rebuild"))
      .orderBy("c_id")
  }

  /** IVF posting-list COMPACTION with probe continuity — the
    * index-lifecycle ACTION to s26's tombstone AUDIT (the p10→p11
    * audit→action pairing), extending d20's compaction/GC axis to the
    * second index type the engine ships: s26 says WHICH cells carry
    * dead weight; this query performs the compaction (tombstoned
    * vectors anti-joined out of the posting lists — an index
    * operation, not a re-derivation from raw vectors) and accounts
    * for what a probe workload gets back. Probes are the live
    * `vec_id % 11 = 5` wave, multiprobed to their top-2 centroids
    * (s13's radius discipline); each (probe, cell, rank) row carries
    * the cell's posting size before, its tombstoned count, and its
    * size in the COMPACTED index — `n_after` counted from the
    * anti-joined frame itself, so a compaction bug that drops a live
    * vector or keeps a dead one breaks `after = before − dead` and
    * hash-fails against the oracle's independent re-derivation. The
    * reclaimed candidates (`n_dead` per probed cell) are exactly the
    * scoring work compaction saves the probe path.
    *
    * Scale shape: one broadcast codebook assignment for vectors and
    * probes, one anti-join at posting-list grain, three cell-grain
    * count frames joined onto the ≤2-rows-per-probe fan — no
    * pairwise scoring anywhere.
    */
  val s27 = OpQuery.oracled("s27_ivf_compaction", {
    s"""WITH e AS (
       |  $duckEmbedded
       |), cent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
       |), assign AS (
       |  SELECT e.vec_id, cent.c_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY e.vec_id
       |           ORDER BY ${duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC)
       |         AS INT) AS crn
       |  FROM e, cent
       |), cells AS (
       |  SELECT vec_id, c_id FROM assign WHERE crn = 1
       |), tomb AS (
       |  SELECT vec_id FROM e WHERE vec_id % 7 = 0
       |), compacted AS (
       |  SELECT c.vec_id, c.c_id FROM cells c
       |  WHERE NOT EXISTS (SELECT 1 FROM tomb t WHERE t.vec_id = c.vec_id)
       |), before AS (
       |  SELECT c_id, CAST(count(*) AS BIGINT) AS n_before
       |  FROM cells GROUP BY 1
       |), deadc AS (
       |  SELECT c.c_id, CAST(count(*) AS BIGINT) AS n_dead
       |  FROM cells c JOIN tomb t ON t.vec_id = c.vec_id GROUP BY 1
       |), after AS (
       |  SELECT c_id, CAST(count(*) AS BIGINT) AS n_after
       |  FROM compacted GROUP BY 1
       |), probes AS (
       |  SELECT vec_id AS probe_id, v, nrm FROM e
       |  WHERE vec_id % 11 = 5 AND vec_id % 7 <> 0
       |), passign AS (
       |  SELECT p.probe_id, cent.c_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY p.probe_id
       |           ORDER BY ${duckDot("p.v", "cent.cv")} / (p.nrm * cent.cnrm) DESC, cent.c_id ASC)
       |         AS INT) AS rank
       |  FROM probes p, cent
       |)
       |SELECT pa.probe_id, pa.c_id, pa.rank,
       |       coalesce(b.n_before, 0) AS n_before,
       |       coalesce(d.n_dead, 0) AS n_dead,
       |       coalesce(a.n_after, 0) AS n_after
       |FROM passign pa
       |LEFT JOIN before b ON b.c_id = pa.c_id
       |LEFT JOIN deadc d ON d.c_id = pa.c_id
       |LEFT JOIN after a ON a.c_id = pa.c_id
       |WHERE pa.rank <= 2
       |ORDER BY pa.probe_id, pa.rank""".stripMargin
  },
    doc = "IVF index compaction: tombstoned vectors anti-joined out of the posting lists (the action to s26's audit, d20's GC axis on the second index type), accounted per top-2-multiprobed cell - posting size before, dead, and after from the compacted frame itself, so after = before - dead is certified by the hash gate") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    def nearest(src: DataFrame, idCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("ccos").desc, col("c_id").asc)
      src.crossJoin(broadcast(cent))
        .withColumn("ccos", expr(s"${dotDec("v", "cv")} / (nrm * cnrm)"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= keep)
        .select(col(idCol), col("c_id"), col("rank"))
    }
    val cells = nearest(e, "vec_id", 1).drop("rank")
    val tomb = e.filter(col("vec_id") % 7 === 0).select("vec_id")
    // the compaction ACTION: an anti-join on the posting-list frame
    val compacted = cells.join(tomb, Seq("vec_id"), "left_anti")
    val before = cells.groupBy("c_id")
      .agg(count(lit(1)).cast("bigint").as("n_before"))
    val deadc = cells.join(tomb, Seq("vec_id"))
      .groupBy("c_id").agg(count(lit(1)).cast("bigint").as("n_dead"))
    val after = compacted.groupBy("c_id")
      .agg(count(lit(1)).cast("bigint").as("n_after"))
    val probes = e.filter(col("vec_id") % 11 === 5 &&
        col("vec_id") % 7 =!= 0)
      .select(col("vec_id").as("probe_id"), col("v"), col("nrm"))
    nearest(probes, "probe_id", 2)
      .join(before, Seq("c_id"), "left")
      .join(deadc, Seq("c_id"), "left")
      .join(after, Seq("c_id"), "left")
      .select(col("probe_id"), col("c_id"), col("rank"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_dead"), lit(0L)).as("n_dead"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .orderBy("probe_id", "rank")
  }

  val all: Seq[OpQuery] = Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09,
    s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, s20, s21, s22, s23,
    s24, s25, s26, s27)
}
