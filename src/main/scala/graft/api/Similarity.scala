package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.VectorExprs.dot

/** Public DataFrame-level similarity-search API over an embedding
  * column (`array<float>` or `array<double>`): brute-force cosine top-k
  * as the exact baseline, plus two ANN shapes for scale — random-
  * hyperplane LSH buckets and IVF nearest-centroid cells. Dot products
  * run through the codegen'd [[graft.expr.DotProductExpr]].
  *
  * (The oracle-checked queries in [[graft.ops.SimilarityOps]] use a
  * truncation-quantized dot instead, which is bit-portable to other
  * engines; this API takes the fast IEEE path.)
  *
  * Caching contract: [[annIvf]] and [[cosineNearDupPairs]] persist a
  * shared subtree (the centroid assignment / the bucketed corpus). The
  * blocks stay cached until the caller drops them — after the terminal
  * action, call `spark.catalog.clearCache()` in long-lived
  * applications; the bundled Bench/Verify drivers do that between
  * queries.
  */
object Similarity {

  private def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("_nrm", sqrt(dot(col(vecCol), col(vecCol))))

  /** Exact cosine top-k neighbors for every row matching `probe`:
    * (q_id, rank, neighbor_id, cos_sim). Cost: |probes| * |corpus| —
    * the baseline ANN variants are judged against.
    */
  def cosineTopK(emb: DataFrame, probe: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = withNorm(emb.select(col(idCol), col(vecCol)), vecCol)
    val probes = e.filter(probe)
      .select(col(idCol).as("q_id"), col(vecCol).as("_pv"), col("_nrm").as("_pnrm"))
    val pairs = probes
      .join(broadcast(e), col(idCol) =!= col("q_id"))
      .withColumn("cos_sim",
        dot(col("_pv"), col(vecCol)) / (col("_pnrm") * col("_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col(idCol).asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol).as("neighbor_id"), col("cos_sim"))
  }

  /** Random-hyperplane LSH buckets: sign bits of `planes` deterministic
    * pseudo-random projections (seeded by plane:dim md5). Returns the
    * input plus a `bucket` string column — the partition key of the ANN
    * index at scale. The plane signs are
    * [[graft.ops.SimilarityOps.planeSigns]] — the single source of
    * truth, so this API and the registered oracle queries always agree
    * on the planes.
    */
  def hyperplaneBuckets(emb: DataFrame, planes: Int = 8,
      vecCol: String = "embedding", dims: Int = 64): DataFrame = {
    val bits = (0 until planes).map { p =>
      val plane = array(graft.ops.SimilarityOps.planeSigns(p, dims).map(lit): _*)
      when(dot(col(vecCol), plane) >= 0, "1").otherwise("0")
    }
    emb.withColumn("bucket", concat(bits: _*))
  }

  /** ANN via hyperplane LSH: search only the probe's bucket. */
  def annLsh(emb: DataFrame, probe: Column, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    val b = withNorm(hyperplaneBuckets(emb.select(col(idCol), col(vecCol)),
      planes, vecCol, dims), vecCol)
    val probes = b.filter(probe)
      .select(col(idCol).as("q_id"), col(vecCol).as("_pv"),
        col("_nrm").as("_pnrm"), col("bucket").as("_pbucket"))
    val pairs = probes
      .join(b, col("bucket") === col("_pbucket") && col(idCol) =!= col("q_id"))
      .withColumn("cos_sim",
        dot(col("_pv"), col(vecCol)) / (col("_pnrm") * col("_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col(idCol).asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol).as("neighbor_id"), col("cos_sim"))
  }

  /** IVF-style ANN: vectors matching `centroidPred` become cell
    * centroids; every vector is assigned to its nearest centroid; a
    * probe searches its `nprobe` nearest cells.
    */
  def annIvf(emb: DataFrame, centroidPred: Column, probe: Column, k: Int,
      nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = withNorm(emb.select(col(idCol), col(vecCol)), vecCol)
    val cent = e.filter(centroidPred)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"), col("_nrm").as("_cnrm"))
    val wAssign = Window.partitionBy(idCol).orderBy(col("_ccos").desc, col("_cid").asc)
    // materialize the assignment once so cells and probe_cells share
    // one centroid cross-join subtree
    val assign = e.crossJoin(broadcast(cent))
      .withColumn("_ccos", dot(col(vecCol), col("_cv")) / (col("_nrm") * col("_cnrm")))
      .withColumn("_crn", row_number().over(wAssign))
      .filter(col("_crn") <= nprobe)
      .select(col(idCol), col("_cid"), col("_crn"))
      .persist()
    val cells = assign.filter(col("_crn") === 1)
      .select(col(idCol).as("neighbor_id"), col("_cid"))
    val probeCells = assign.filter(col("_crn") <= nprobe && probe)
      .select(col(idCol).as("q_id"), col("_cid"))
    val cand = probeCells.join(cells, Seq("_cid"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select("q_id", "neighbor_id").distinct()
    val scored = cand
      .join(e.select(col(idCol).as("q_id"), col(vecCol).as("_pv"), col("_nrm").as("_pnrm")), Seq("q_id"))
      .join(e.select(col(idCol).as("neighbor_id"), col(vecCol), col("_nrm")), Seq("neighbor_id"))
      .withColumn("cos_sim",
        dot(col("_pv"), col(vecCol)) / (col("_pnrm") * col("_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Embedding-cosine near-duplicate pairs via BANDED hyperplane LSH:
    * (vec_a, vec_b, cos_sim), vec_a < vec_b, cos_sim >= threshold.
    *
    * Candidate generation follows the MinHash-LSH banding recipe
    * ([[Dedup.nearDupPairs]]) on hyperplane sign bits instead of
    * min-hashes: a pair is a candidate when ALL `bandBits` bits of ANY
    * band agree, then the exact cosine verifies it.
    *
    * Pair-count bound — why this survives 100 TB where a single
    * fixed-width bucket does not: expected candidates are about
    * nBands * N^2 / 2^(bandBits+1), so `bandBits` must be sized
    * ~log2(N / targetBucket); 2^bandBits tracking N makes the per-band
    * within-bucket pair count ~N * targetBucket / 2 — LINEAR in corpus
    * size — while recall is controlled independently by nBands (for
    * cos >= 0.8 each bit agrees w.p. 1 - acos(0.8)/pi ≈ 0.795, an
    * 8-bit band matches w.p. ≈ 0.16, and 4 bands give ≈ 50% recall per
    * true pair; more bands raise recall without touching the per-band
    * bound). The band key is the only data-sized shuffle key and is
    * uniform by construction.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.8,
      nBands: Int = 4, bandBits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    val e = withNorm(
      hyperplaneBuckets(emb.select(col(idCol), col(vecCol)),
        planes = nBands * bandBits, vecCol, dims), vecCol)
      .persist()
    val bandKeys = (0 until nBands).map(b =>
      concat(lit(s"$b:"), substring(col("bucket"), b * bandBits + 1, bandBits)))
    val bands = e.select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bk") === col("b.bk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("vec_a"), col(s"b.$idCol").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col(idCol).as("vec_a"), col(vecCol).as("_va"), col("_nrm").as("_na")), Seq("vec_a"))
      .join(e.select(col(idCol).as("vec_b"), col(vecCol).as("_vb"), col("_nrm").as("_nb")), Seq("vec_b"))
      .withColumn("cos_sim", dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein,
    * SIGIR'98) over a per-query candidate shortlist: greedily pick `k`
    * results trading relevance against redundancy with what is already
    * picked — `argmax λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s)`.
    *
    * Inputs are score frames, not vectors, so any similarity kernel
    * plugs in: `rel(q_id, cand_id, rel_mic)` (one row per shortlist
    * member) and `pairSim(q_id, a_id, b_id, sim_mic)` (both
    * directions of every shortlist pair of the same query). Scores are
    * integer micros and λ a rational `lamNum/lamDen`, so every MMR
    * score is exact integer arithmetic — bit-identical across engines
    * and deterministic under ties (broken by cand_id ascending).
    *
    * The greedy loop is inherently sequential in `k` but each round is
    * one bounded join + aggregate over shortlist-sized frames (≤
    * |probes|·shortlist² rows), never corpus-sized — the corpus-scale
    * work happened upstream in whatever produced the shortlist (e.g.
    * the ADC retriever). Round 1's score is λ·rel alone (empty picked
    * set). Queries with fewer than `k` candidates yield fewer picks.
    * Output: (q_id, pick_rank, cand_id, mmr_mic).
    */
  def mmrSelect(rel: DataFrame, pairSim: DataFrame, k: Int,
      lamNum: Int = 7, lamDen: Int = 10): DataFrame = {
    require(k >= 1, s"bad k $k")
    require(lamNum >= 0 && lamNum <= lamDen && lamDen > 0,
      s"bad lambda $lamNum/$lamDen")
    val first = Windows.topKPerGroup(rel, Seq("q_id"),
        Seq(("rel_mic", true), ("cand_id", false)), 1)
      .select(col("q_id"), col("cand_id"),
        (lit(lamNum.toLong) * col("rel_mic")).as("mmr_mic"),
        lit(1).cast("int").as("pick_rank"))
    var picked = first
    for (r <- 2 to k) {
      val maxSim = pairSim
        .join(picked.select(col("q_id"), col("cand_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id").as("cand_id"))
        .agg(max(col("sim_mic")).as("max_sim_mic"))
      val pick = rel
        .join(picked.select("q_id", "cand_id"), Seq("q_id", "cand_id"),
          "left_anti")
        .join(maxSim, Seq("q_id", "cand_id"))
        .withColumn("mmr_mic",
          lit(lamNum.toLong) * col("rel_mic") -
            lit((lamDen - lamNum).toLong) * col("max_sim_mic"))
      picked = picked.unionByName(
        Windows.topKPerGroup(
            pick.select("q_id", "cand_id", "mmr_mic"), Seq("q_id"),
            Seq(("mmr_mic", true), ("cand_id", false)), 1)
          .withColumn("pick_rank", lit(r).cast("int")))
    }
    picked
  }
}
