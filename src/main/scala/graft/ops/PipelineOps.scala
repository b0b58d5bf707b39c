package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Checkpoints.LineageOps

import graft.io.Sources

/** End-to-end pipeline compositions: each query chains several library
  * operators the way a real corpus job does, and the oracle re-derives
  * the WHOLE chain in SQL — the composition proof (single operators
  * being correct does not yet mean their composition is; the qr*
  * family plays the same role for the reference's own pipeline).
  */
object PipelineOps {

  /** Training-corpus assembly, the canonical four-stage recipe:
    *
    *  1. exact dedup  — keep the min-id copy of each byte-identical text
    *     ([[graft.api.Dedup.exactDupGroups]]);
    *  2. near dedup   — LSH pairs -> transitive clusters -> keep each
    *     cluster's min-id member ([[graft.api.Dedup.nearDupPairs]] /
    *     [[graft.api.Dedup.nearDupClusters]]);
    *  3. length gate  — Gopher-style minimum document length;
    *  4. token budget — per-source prefix-sum admission (t26's rule).
    *
    * Output is the assembled corpus's per-source manifest
    * (docs admitted, tokens admitted). Every stage is an operator the
    * engine already ships; what this query pins is their COMPOSITION —
    * keeper sets feeding the budget in deterministic order, hash-checked
    * end to end against an oracle that re-implements all four stages.
    *
    * Scale shape: stages 1-2 are the dedup family's bounded shuffles,
    * stage 3 is a map-stage predicate, stage 4 is one running-sum
    * window per source. Nothing here collects or re-scans the corpus
    * outside those shuffles.
    */
  val p01 = OpQuery.oracled("p01_corpus_assembly", {
    s"""WITH RECURSIVE pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |${DedupOps.d04.oracle.get}
      |  )
      |), edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION ALL
      |  SELECT doc_b AS u, doc_a AS v FROM pairs
      |), reach AS (
      |  SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
      |), lab AS (
      |  SELECT u AS doc_id, min(l) AS cluster_id FROM reach GROUP BY 1
      |), exact_keep AS (
      |  SELECT min(doc_id) AS doc_id
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |  GROUP BY md5(text)
      |), survivors AS (
      |  SELECT d.doc_id, d.source,
      |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
      |  FROM read_parquet('{SFDIR}/documents.parquet') d
      |  JOIN exact_keep k ON k.doc_id = d.doc_id
      |  LEFT JOIN lab ON lab.doc_id = d.doc_id
      |  WHERE (lab.cluster_id IS NULL OR lab.cluster_id = d.doc_id)
      |    AND len(string_split(d.text, ' ')) >= 20
      |), admitted AS (
      |  SELECT source, doc_id, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      |  FROM survivors
      |)
      |SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM admitted WHERE cum <= 1000
      |GROUP BY source ORDER BY source""".stripMargin
  },
    doc = "four-stage corpus assembly (exact dedup -> near dedup -> length gate -> token budget), oracle re-derives the whole chain") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    // stage 1: exact dedup — keep the min-id copy per content hash
    val exactKeep = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // stage 2: near dedup — cluster keeper is the min-id member, i.e.
    // the member whose id IS the cluster id under min-label propagation
    val clusters = graft.api.Dedup.nearDupClusters(DedupOps.d04.fn(spark, dir))
      .select(col("doc_id"), col("cluster_id"))
    val survivors = docs
      .join(exactKeep, "doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      // stage 3: Gopher-style length gate
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .filter(col("n_tokens") >= 20)
    // stage 4: per-source token budget (t26's prefix-sum rule, via the
    // same api.Corpus entry point the t26 query uses)
    graft.api.Corpus.tokenBudget(survivors, group = "source",
        order = "doc_id", nTokens = "n_tokens", budget = 1000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"))
      .orderBy("source")
  }

  /** Training-feature-frame assembly — the events-side composition
    * twin of p01's corpus assembly: three independent per-user feature
    * families (session counts from 30-minute-gap sessionization,
    * consecutive-day streaks from gaps-and-islands, RFM purchase
    * aggregates) derived separately and joined into one model-ready
    * wide frame, non-purchasers zero-filled. What the oracle pins is
    * the COMPOSITION: the same event row feeding three different
    * window/aggregate paths and landing aligned on user_id.
    *
    * Scale shape: every branch shuffles on user_id and reduces to one
    * row per user before the three-way join, so the join inputs are
    * user-frame-sized and hash-align on the same key — no branch ever
    * joins at event grain.
    */
  val p02 = OpQuery.oracled("p02_training_feature_frame",
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), lagged AS (
      |  SELECT user_id, us,
      |         lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      |  FROM ev
      |), sess AS (
      |  SELECT user_id,
      |         CAST(1 + sum(CASE WHEN prev_us IS NOT NULL
      |                            AND us - prev_us > 1800000000
      |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM lagged GROUP BY 1
      |), du AS (
      |  SELECT DISTINCT user_id, us // 86400000000 AS day FROM ev
      |), g AS (
      |  SELECT user_id, day,
      |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM du
      |), runs AS (
      |  SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2
      |), streaks AS (
      |  SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |         CAST(sum(len) AS BIGINT) AS total_active_days
      |  FROM runs GROUP BY 1
      |), rfm AS (
      |  SELECT user_id, CAST(max(us) AS BIGINT) AS last_purchase_us,
      |         CAST(count(*) AS BIGINT) AS n_purchases,
      |         CAST(sum(cents) AS BIGINT) AS monetary_cents
      |  FROM ev WHERE event_type = 'purchase' GROUP BY 1
      |)
      |SELECT s.user_id, s.n_events, s.n_sessions,
      |       st.longest_streak, st.total_active_days,
      |       CAST(coalesce(r.n_purchases, 0) AS BIGINT) AS n_purchases,
      |       CAST(coalesce(r.monetary_cents, 0) AS BIGINT) AS monetary_cents,
      |       CAST(coalesce(r.last_purchase_us, -1) AS BIGINT) AS last_purchase_us
      |FROM sess s
      |JOIN streaks st USING (user_id)
      |LEFT JOIN rfm r USING (user_id)
      |ORDER BY user_id""".stripMargin,
    doc = "per-user training feature frame (sessionization + streaks + RFM joined user-aligned), oracle re-derives the whole composition") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val wUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sess = ev
      .withColumn("prev_us", lag(col("us"), 1).over(wUser))
      .withColumn("new_sess",
        when(col("prev_us").isNotNull &&
          col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .groupBy("user_id")
      .agg((sum(col("new_sess")) + 1).cast("bigint").as("n_sessions"),
        count(lit(1)).cast("bigint").as("n_events"))
    val streaks = graft.api.Features.streaks(
        ev.select(col("user_id"), expr("us DIV 86400000000").as("day"))
          .distinct(),
        key = "user_id", unit = "day")
      .select("user_id", "longest_streak", "total_active_days")
    val rfm = graft.api.Features.rfm(
        ev.filter(col("event_type") === "purchase"), "user_id", "us", "cents")
      .withColumnRenamed("last_seen_us", "last_purchase_us")
      .withColumnRenamed("frequency", "n_purchases")
    sess.join(streaks, Seq("user_id"))
      .join(rfm, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_sessions"),
        col("longest_streak"), col("total_active_days"),
        coalesce(col("n_purchases"), lit(0L)).cast("bigint").as("n_purchases"),
        coalesce(col("monetary_cents"), lit(0L)).cast("bigint").as("monetary_cents"),
        coalesce(col("last_purchase_us"), lit(-1L)).cast("bigint").as("last_purchase_us"))
      .orderBy("user_id")
  }

  /** Contamination-halo corpus gate — the graph composition: when a
    * source is quarantined (licensing, eval overlap, poisoning), its
    * documents AND everything transitively near them must go, because
    * a near-duplicate of a contaminated document carries the
    * contamination. Stages: (1) the verified near-dup pairs (d04's
    * banded-MinHash + Jaccard verify) become the doc-graph edges;
    * (2) a 2-hop multi-source BFS from every quarantined doc marks the
    * halo ([[graft.api.Graph.multiSourceBfs]] — one frontier join per
    * hop, NOT one traversal per seed; at 100 TB the seed set is
    * millions of docs and per-seed walks are impossible); (3) the gate
    * reports per-source kept/dropped/halo counts. The oracle splices
    * d04's oracle text and unrolls both hops as set-subtracted CTEs —
    * the m07/p01 splicing pattern, here across the dedup and graph
    * families.
    */
  val p03 = OpQuery.oracled("p03_contamination_halo_gate", {
    s"""WITH pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |${DedupOps.d04.oracle.get}
      |  )
      |), sym AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION ALL
      |  SELECT doc_b AS u, doc_a AS v FROM pairs
      |), h0 AS (
      |  SELECT doc_id AS node FROM read_parquet('{SFDIR}/documents.parquet')
      |  WHERE source IN ('src5', 'src7')
      |), h1 AS (
      |  SELECT DISTINCT e.v AS node FROM sym e JOIN h0 ON h0.node = e.u
      |  WHERE e.v NOT IN (SELECT node FROM h0)
      |), h2 AS (
      |  SELECT DISTINCT e.v AS node FROM sym e JOIN h1 ON h1.node = e.u
      |  WHERE e.v NOT IN (SELECT node FROM h0)
      |    AND e.v NOT IN (SELECT node FROM h1)
      |), reached AS (
      |  SELECT node FROM h0 UNION ALL SELECT node FROM h1
      |  UNION ALL SELECT node FROM h2
      |)
      |SELECT d.source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(CASE WHEN r.node IS NOT NULL THEN 1 END) AS BIGINT)
      |         AS n_dropped,
      |       CAST(count(CASE WHEN r.node IS NOT NULL
      |                  AND d.source NOT IN ('src5', 'src7') THEN 1 END)
      |            AS BIGINT) AS n_halo,
      |       CAST(count(CASE WHEN r.node IS NULL THEN 1 END) AS BIGINT)
      |         AS n_kept
      |FROM read_parquet('{SFDIR}/documents.parquet') d
      |LEFT JOIN reached r ON r.node = d.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin
  },
    doc = "contamination-halo gate: quarantined sources + 2-hop BFS halo over the verified near-dup graph, per-source kept/dropped manifest") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val edges = DedupOps.d04.fn(spark, dir)
      .select(col("doc_a").as("pa"), col("doc_b").as("pb"))
    val seeds = docs.filter(col("source").isin("src5", "src7"))
      .select(col("doc_id").as("node"))
    val halo = graft.api.Graph.multiSourceBfs(edges, seeds, maxHops = 2)
      .select(col("node"))
    val quarantined = Seq("src5", "src7")
    docs.join(halo, docs("doc_id") === halo("node"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        count(when(col("node").isNotNull, lit(1))).cast("bigint")
          .as("n_dropped"),
        count(when(col("node").isNotNull &&
          !col("source").isin(quarantined: _*), lit(1))).cast("bigint")
          .as("n_halo"),
        count(when(col("node").isNull, lit(1))).cast("bigint").as("n_kept"))
      .orderBy("source")
  }

  /** Incremental ingest refresh — p01's assembly recipe in its
    * PRODUCTION form, where a new batch lands against an EXISTING
    * corpus (dedup runs per ingest, not as a global recompute). The
    * batch/corpus split is d09's hash-bucket split (bucket >= 205 =
    * incoming). Stages, each classifying the incoming docs:
    *
    *  1. exact screen — incoming text whose content hash already
    *     exists in the corpus (semi join on md5);
    *  2. near screen  — survivors that near-dup a corpus document
    *     (d09's incremental banded-LSH machinery, oracle spliced);
    *  3. quality gate — integer ratio test `20*n_good >= 19*n_tokens
    *     AND n_tokens >= 20` (good = token length in [3,8]);
    *  4. admission    — per-source 500-token prefix-sum budget over
    *     the survivors (the two-phase tokenBudget operator).
    *
    * Output: the per-source ingest manifest (incoming, exact-dup,
    * near-dup, low-quality, admitted, admitted tokens) — what a daily
    * ingest job reports. The oracle re-derives all four stages.
    */
  val p04 = OpQuery.oracled("p04_incremental_ingest", {
    s"""WITH nd AS (
      |  SELECT DISTINCT doc_new FROM (
      |${DedupOps.d09.oracle.get}
      |  )
      |), sp AS (
      |  SELECT doc_id,
      |         CASE WHEN ${DedupOps.duckBucket} < 205 THEN 'old' ELSE 'new' END AS side
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), inc AS (
      |  SELECT d.source, d.doc_id, md5(d.text) AS h,
      |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(string_split(d.text, ' '),
      |                  t -> length(t) BETWEEN 3 AND 8)) AS BIGINT) AS n_good
      |  FROM read_parquet('{SFDIR}/documents.parquet') d
      |  JOIN sp ON sp.doc_id = d.doc_id AND sp.side = 'new'
      |), old_h AS (
      |  SELECT DISTINCT md5(d.text) AS h
      |  FROM read_parquet('{SFDIR}/documents.parquet') d
      |  JOIN sp ON sp.doc_id = d.doc_id AND sp.side = 'old'
      |), staged AS (
      |  SELECT source, doc_id, n_tokens,
      |         CASE WHEN h IN (SELECT h FROM old_h) THEN 'exact'
      |              WHEN doc_id IN (SELECT doc_new FROM nd) THEN 'near'
      |              WHEN NOT (20 * n_good >= 19 * n_tokens
      |                        AND n_tokens >= 20) THEN 'lowq'
      |              ELSE 'pass' END AS st
      |  FROM inc
      |), adm AS (
      |  SELECT source, doc_id, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
      |              AS BIGINT) AS cum
      |  FROM staged WHERE st = 'pass'
      |), admitted AS (
      |  SELECT source, doc_id, n_tokens FROM adm WHERE cum <= 500
      |), manifest AS (
      |  SELECT source,
      |         CAST(count(*) AS BIGINT) AS n_incoming,
      |         CAST(sum(CASE WHEN st = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
      |         CAST(sum(CASE WHEN st = 'near' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
      |         CAST(sum(CASE WHEN st = 'lowq' THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
      |  FROM staged GROUP BY 1
      |), adm_agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_admitted,
      |         CAST(sum(n_tokens) AS BIGINT) AS admitted_tokens
      |  FROM admitted GROUP BY 1
      |)
      |SELECT m.source, m.n_incoming, m.n_exact_dup, m.n_near_dup,
      |       m.n_low_quality,
      |       CAST(coalesce(a.n_admitted, 0) AS BIGINT) AS n_admitted,
      |       CAST(coalesce(a.admitted_tokens, 0) AS BIGINT) AS admitted_tokens
      |FROM manifest m LEFT JOIN adm_agg a ON a.source = m.source
      |ORDER BY m.source""".stripMargin
  },
    doc = "incremental ingest manifest: exact screen vs corpus + d09 near screen + integer quality gate + per-source token budget, all four stages oracle-spliced") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
    val bucket = graft.api.Sampling.hashBucket(col("doc_id"))
    val incomingRaw = docs.filter(bucket >= 205)
    val corpus = docs.filter(bucket < 205)
    val inc = incomingRaw.select(col("source"), col("doc_id"),
      md5(col("text")).as("h"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
      expr("CAST(size(filter(split(text, ' '), " +
        "t -> length(t) >= 3 AND length(t) <= 8)) AS BIGINT)").as("n_good"))
    val oldH = corpus.select(md5(col("text")).as("h")).distinct()
      .withColumn("_ex", lit(1))
    val nearNew = graft.api.Dedup.incrementalNearDups(
        incoming = incomingRaw, corpus = corpus, threshold = 0.5)
      .select(col("doc_new").as("doc_id")).distinct()
      .withColumn("_nr", lit(1))
    val staged = inc
      .join(oldH, Seq("h"), "left")
      .join(nearNew, Seq("doc_id"), "left")
      .select(col("source"), col("doc_id"), col("n_tokens"),
        when(col("_ex").isNotNull, "exact")
          .when(col("_nr").isNotNull, "near")
          .when(!(col("n_good") * 20 >= col("n_tokens") * 19 &&
            col("n_tokens") >= 20), "lowq")
          .otherwise("pass").as("st"))
    val admitted = graft.api.Corpus.tokenBudget(
        staged.filter(col("st") === "pass")
          .select("source", "doc_id", "n_tokens"),
        group = "source", order = "doc_id", nTokens = "n_tokens",
        budget = 500L)
    val manifest = staged.groupBy("source").agg(
      count(lit(1)).cast("bigint").as("n_incoming"),
      sum(when(col("st") === "exact", 1L).otherwise(0L)).cast("bigint")
        .as("n_exact_dup"),
      sum(when(col("st") === "near", 1L).otherwise(0L)).cast("bigint")
        .as("n_near_dup"),
      sum(when(col("st") === "lowq", 1L).otherwise(0L)).cast("bigint")
        .as("n_low_quality"))
    val admAgg = admitted.groupBy("source").agg(
      count(lit(1)).cast("bigint").as("n_admitted0"),
      sum(col("n_tokens")).cast("bigint").as("admitted_tokens0"))
    manifest.join(admAgg, Seq("source"), "left")
      .select(col("source"), col("n_incoming"), col("n_exact_dup"),
        col("n_near_dup"), col("n_low_quality"),
        coalesce(col("n_admitted0"), lit(0L)).cast("bigint").as("n_admitted"),
        coalesce(col("admitted_tokens0"), lit(0L)).cast("bigint")
          .as("admitted_tokens"))
      .orderBy("source")
  }

  /** ANN index BUILD — the similarity-family composition: the
    * IVF-PQ index construction job every vector deployment runs,
    * chaining
    *
    *  1. coarse quantizer — every vector assigned to its nearest
    *     centroid cell by the bit-portable quantized cosine (s04's
    *     assignment stage);
    *  2. product quantization — each vector's two halves encoded
    *     against the per-half codebooks, residual errors kept (s09);
    *  3. inverted-list manifest — per cell: posting-list size,
    *     distinct PQ code pairs (the table an ADC scan loads), and the
    *     total quantization error in exact picounits (the build-time
    *     quality number that decides codebook retraining).
    *
    * What this pins is the COMPOSITION: the same vector keyed through
    * both quantizers lands in one posting row, hash-checked end to end
    * by an oracle re-deriving both stages. Scale shape: two broadcast
    * codebook joins (kilobytes each) + per-(vector, half) windows whose
    * partitions are k rows + one final cell-keyed aggregate — the
    * corpus shuffles once, on the cell key; no stage is quadratic.
    */
  val p05 = OpQuery.oracled("p05_ann_index_build", {
    s"""WITH e AS (
      |  ${SimilarityOps.duckEmbedded}
      |), cent AS (
      |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id % 250 = 0
      |), assign AS (
      |  SELECT e.vec_id, cent.c_id,
      |         CAST(row_number() OVER (
      |           PARTITION BY e.vec_id
      |           ORDER BY ${SimilarityOps.duckDot("e.v", "cent.cv")} / (e.nrm * cent.cnrm) DESC, cent.c_id ASC)
      |         AS INT) AS crn
      |  FROM e, cent
      |), cells AS (
      |  SELECT vec_id, c_id FROM assign WHERE crn = 1
      |), halves AS (
      |  SELECT vec_id, 0 AS h, list_slice(v, 1, len(v) // 2) AS sv FROM e
      |  UNION ALL
      |  SELECT vec_id, 1, list_slice(v, len(v) // 2 + 1, len(v)) FROM e
      |), cents2 AS (
      |  SELECT vec_id AS p_id, h, sv AS cv FROM halves WHERE vec_id % 250 = 0
      |), ppairs AS (
      |  SELECT halves.vec_id, halves.h, cents2.p_id,
      |         CAST(list_sum(list_transform(generate_series(1, len(halves.sv)),
      |              i -> CAST(trunc((halves.sv[i] - cents2.cv[i]) * (halves.sv[i] - cents2.cv[i]) * 1e12) AS BIGINT))) AS BIGINT) AS qd
      |  FROM halves JOIN cents2 ON cents2.h = halves.h
      |), passign AS (
      |  SELECT vec_id, h, p_id, qd,
      |         row_number() OVER (PARTITION BY vec_id, h ORDER BY qd ASC, p_id ASC) AS rn
      |  FROM ppairs
      |), codes AS (
      |  SELECT vec_id,
      |         max(CASE WHEN h = 0 THEN p_id END) AS code0,
      |         max(CASE WHEN h = 1 THEN p_id END) AS code1,
      |         max(CASE WHEN h = 0 THEN qd END)
      |           + max(CASE WHEN h = 1 THEN qd END) AS err_pico
      |  FROM passign WHERE rn = 1 GROUP BY 1
      |)
      |SELECT c.c_id,
      |       CAST(count(*) AS BIGINT) AS n_vectors,
      |       CAST(count(DISTINCT CAST(code0 AS VARCHAR) || ':' || CAST(code1 AS VARCHAR)) AS BIGINT) AS n_code_pairs,
      |       CAST(sum(err_pico) AS BIGINT) AS sum_err_pico
      |FROM cells c JOIN codes k ON k.vec_id = c.vec_id
      |GROUP BY 1
      |ORDER BY c_id""".stripMargin
  },
    doc = "ANN index build: IVF cell assignment + PQ encode composed into the per-cell inverted-list manifest; both stages oracle-rederived end to end") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = SimilarityOps.embedded(spark, dir).select("vec_id", "v", "nrm")
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wA = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id").asc)
    val cells = e.crossJoin(broadcast(cent))
      .withColumn("ccos",
        expr(s"${SimilarityOps.dotDec("v", "cv")} / (nrm * cnrm)"))
      .withColumn("crn", row_number().over(wA))
      .filter(col("crn") === 1)
      .select("vec_id", "c_id")
    val halves = e.select(col("vec_id"), lit(0).as("h"),
        expr("slice(v, 1, size(v) DIV 2)").as("sv"))
      .unionAll(e.select(col("vec_id"), lit(1).as("h"),
        expr("slice(v, size(v) DIV 2 + 1, size(v) - size(v) DIV 2)").as("sv")))
    val cents2 = halves.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("p_id"), col("h"), col("sv").as("cv"))
    val ppairs = halves.join(broadcast(cents2), Seq("h"))
      .withColumn("qd",
        graft.expr.VectorExprs.quantized_l2(col("sv"), col("cv")))
    val wP = Window.partitionBy("vec_id", "h")
      .orderBy(col("qd").asc, col("p_id").asc)
    val codes = ppairs.withColumn("rn", row_number().over(wP))
      .filter(col("rn") === 1)
      .groupBy("vec_id")
      .agg(
        max(when(col("h") === 0, col("p_id"))).as("code0"),
        max(when(col("h") === 1, col("p_id"))).as("code1"),
        (max(when(col("h") === 0, col("qd")))
          + max(when(col("h") === 1, col("qd")))).as("err_pico"))
    cells.join(codes, "vec_id")
      .groupBy("c_id")
      .agg(
        count(lit(1)).as("n_vectors"),
        countDistinct(concat_ws(":", col("code0"), col("code1")))
          .as("n_code_pairs"),
        sum("err_pico").cast("bigint").as("sum_err_pico"))
      .orderBy("c_id")
  }

  /** Point-in-time-correct training-set assembly — the leakage-safe
    * feature join every supervised pipeline needs: for each label event
    * (a purchase), attach the user's feature snapshot as it stood
    * STRICTLY BEFORE the label's timestamp. Features here are running
    * click aggregates (count + decimal-exact value sum) materialized as
    * one snapshot per (user, instant); the label side reaches its
    * snapshot through the native [[graft.plans.AsOfJoin]] operator at
    * `label_ts - 1 µs` — the operator matches at-or-before, so the
    * 1-µs shift makes the strictness structural rather than a filter
    * someone can forget (a feature computed AT the label instant is
    * label leakage, the classic silent training bug). Purchases before
    * any click surface with zeroed features, not dropped rows. The
    * oracle re-derives snapshots with windows and ranks candidates
    * with `s_us < label_ts` directly, so the operator path and the
    * strictness rule are both value-checked.
    *
    * Scale shape: snapshots are one window pass over the click slice;
    * the as-of is the one-pass co-partitioned merge (no per-label
    * candidate expansion, unlike the oracle's quadratic form).
    */
  val p06 = OpQuery.oracled("p06_point_in_time_features",
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |), c AS (
      |  SELECT user_id, event_id, ts_us, CAST(value AS DECIMAL(18,6)) AS v
      |  FROM e WHERE event_type = 'click'
      |), snap0 AS (
      |  SELECT user_id, ts_us,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS n_run,
      |         sum(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_run
      |  FROM c
      |), snap AS (
      |  SELECT user_id, ts_us AS s_us, max(n_run) AS n_clicks, max(cum_run) AS cumv
      |  FROM snap0 GROUP BY 1, 2
      |), p AS (
      |  SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase'
      |), cand AS (
      |  SELECT p.event_id, s.n_clicks, s.cumv,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY s.s_us DESC) AS rn
      |  FROM p JOIN snap s ON s.user_id = p.user_id AND s.s_us < p.ts_us
      |)
      |SELECT p.event_id, p.user_id, p.ts_us,
      |       CAST(coalesce(m.n_clicks, 0) AS BIGINT) AS n_clicks_before,
      |       CAST(coalesce(m.cumv, 0) AS DOUBLE) AS value_before,
      |       p.value AS label_value
      |FROM p LEFT JOIN (SELECT event_id, n_clicks, cumv FROM cand WHERE rn = 1) m
      |  ON m.event_id = p.event_id
      |ORDER BY p.event_id""".stripMargin,
    doc = "point-in-time training join: strictly-before feature snapshots attached to labels via the native as-of operator (leakage-safe by construction)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Sources.table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one feature snapshot per (user, instant): same-instant clicks
    // collapse to the latest running state (max of monotone columns)
    val snap = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("n_run", row_number().over(w))
      .withColumn("cum_run", sum(col("v")).over(w))
      .groupBy(col("user_id").as("s_user"), col("ts_us").as("s_us"))
      .agg(max("n_run").as("n_clicks"), max("cum_run").as("cumv"))
    val labels = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("value").as("label_value"),
        // operator matches at-or-before; -1µs makes it strictly-before
        (col("ts_us") - 1).as("asof_us"))
    graft.api.Joins.asOfJoin(labels, snap,
        leftKeys = Seq("user_id"), rightKeys = Seq("s_user"),
        leftTimeCol = "asof_us", rightTimeCol = "s_us")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_clicks"), lit(0)).cast("bigint").as("n_clicks_before"),
        coalesce(col("cumv"), lit(0)).cast("double").as("value_before"),
        col("label_value"))
      .orderBy("event_id")
  }

  /** Planted-probe recall of the BM25 retriever — the lexical twin of
    * s14's ANN acceptance metric: every 25th document, two novel
    * tokens appended, becomes a probe whose right answer is known a
    * priori (its own base), so top-1 recall isolates what the scorer +
    * df-cap lose — the number a retrieval tuning loop actually
    * watches. A hit counts when the retrieved doc's TEXT equals the
    * base text (an exact copy of the source is a retrieval success;
    * at SFs with real duplicate groups the id tie-break alone would
    * misattribute copy wins as misses). Composition: the t37 scoring
    * core ([[graft.ops.TextOps.bm25ScoresMicro]]) over the probe-
    * augmented corpus, the bounded-heap top-1 cut, and a text-identity
    * join — the oracle re-derives the whole chain.
    */
  val p07 = OpQuery.oracled("p07_bm25_planted_recall", {
    s"""WITH base AS (
      |  SELECT doc_id, text FROM read_parquet('{SFDIR}/documents.parquet')
      |), mutn AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |         text || ' zq' || CAST(doc_id AS VARCHAR) AS text
      |  FROM base WHERE doc_id % 25 = 0 AND doc_id < ${TextOps.probeIdBound}
      |), docs AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM mutn
      |), tf AS (
      |  SELECT doc_id, t, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM docs)
      |  GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
      |), corp AS (
      |  SELECT count(*) AS n, sum(dl) AS tt FROM dl
      |), nd AS (
      |  SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) AS cap FROM docs
      |), df AS (
      |  SELECT t, count(*) AS df FROM tf GROUP BY 1
      |  HAVING count(*) <= (SELECT cap FROM nd)
      |), scored AS (
      |  SELECT q.doc_id AS query_doc, c.doc_id AS doc_id,
      |         sum(CAST(floor(
      |           (CAST(2 * corp.n - 2 * df.df + 1 AS DOUBLE) / (2 * df.df + 1))
      |             * (CAST(22 * corp.tt * c.tf AS DOUBLE)
      |                / (10 * corp.tt * c.tf + 3 * corp.tt + 9 * dl.dl * corp.n))
      |             * 1000000.0) AS BIGINT)) AS score_micro
      |  FROM tf q
      |  JOIN df ON df.t = q.t
      |  JOIN tf c ON c.t = q.t AND c.doc_id <> q.doc_id
      |  JOIN dl ON dl.doc_id = c.doc_id
      |  CROSS JOIN corp
      |  WHERE q.doc_id >= 1000000
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT query_doc, doc_id,
      |         row_number() OVER (PARTITION BY query_doc
      |                            ORDER BY score_micro DESC, doc_id) AS rn
      |  FROM scored
      |), hit AS (
      |  SELECT r.query_doc,
      |         max(CASE WHEN r.rn = 1 AND cb.text = bb.text THEN 1 ELSE 0 END) AS h1,
      |         max(CASE WHEN cb.text = bb.text THEN 1 ELSE 0 END) AS h10
      |  FROM ranked r
      |  JOIN docs cb ON cb.doc_id = r.doc_id
      |  JOIN base bb ON bb.doc_id = r.query_doc - 1000000
      |  WHERE r.rn <= 10
      |  GROUP BY 1
      |), np AS (SELECT CAST(count(*) AS BIGINT) AS n_planted FROM mutn
      |), nf AS (
      |  SELECT CAST(coalesce(sum(h1), 0) AS BIGINT) AS at1,
      |         CAST(coalesce(sum(h10), 0) AS BIGINT) AS at10
      |  FROM hit)
      |SELECT np.n_planted, nf.at1 AS top1_hits, nf.at10 AS top10_hits,
      |       CAST(nf.at1 AS DOUBLE) / np.n_planted AS recall_at1,
      |       CAST(nf.at10 AS DOUBLE) / np.n_planted AS recall_at10
      |FROM np CROSS JOIN nf""".stripMargin
  },
    doc = "BM25 planted-probe recall@1/@10 (the s14 acceptance metric for lexical retrieval): bounded probe batch of unique-suffix mutants over the t37 scoring core, text-identity hits; the driver fixtures' 31-token vocabulary caps @1 there (corpus-limitation dial, like s12's) — on the Zipf-vocabulary sf1 rung recall@1 = 1.0") { (spark, dir) =>
    val base = Sources.table(spark, dir, "documents").select("doc_id", "text")
    val mutn = base
      .filter(col("doc_id") % 25 === 0 && col("doc_id") < TextOps.probeIdBound)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zq"), col("doc_id").cast("string"))
          .as("text"))
    val docs = base.unionByName(mutn)
    val scored = TextOps.bm25ScoresMicro(docs, col("doc_id") >= 1000000L)
    // rank within the bounded top-10 only — the heap cut runs first, the
    // per-query window then sorts 10 rows, never the full candidate set
    val top10 = graft.api.Windows.topKPerGroup(scored, Seq("query_doc"),
        Seq(("score_micro", true), ("doc_id", false)), 10)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_doc")
      .orderBy(col("score_micro").desc, col("doc_id"))
    val hit = top10.withColumn("rn", row_number().over(w))
      .join(docs.select(col("doc_id"), col("text").as("cand_text")), "doc_id")
      .join(base.select((col("doc_id") + 1000000L).as("query_doc"),
        col("text").as("base_text")), "query_doc")
      .groupBy("query_doc")
      .agg(
        max(when(col("rn") === 1 && col("cand_text") === col("base_text"), 1)
          .otherwise(0)).as("h1"),
        max(when(col("cand_text") === col("base_text"), 1).otherwise(0))
          .as("h10"))
    val np = mutn.agg(count(lit(1)).cast("bigint").as("n_planted"))
    val nf = hit.agg(
      coalesce(sum(col("h1")), lit(0)).cast("bigint").as("top1_hits"),
      coalesce(sum(col("h10")), lit(0)).cast("bigint").as("top10_hits"))
    np.crossJoin(nf)
      .select(col("n_planted"), col("top1_hits"), col("top10_hits"),
        (col("top1_hits").cast("double") / col("n_planted")).as("recall_at1"),
        (col("top10_hits").cast("double") / col("n_planted")).as("recall_at10"))
  }

  /** Cluster-balanced subsampling — the diversity-preserving draw a
    * curation pipeline runs AFTER semantic dedup (SemDeDup §4 keeps
    * one representative per cluster; density-based pruning keeps a
    * budget per region): assign every embedding to its nearest-
    * centroid cell (the d14 machinery via
    * [[graft.api.Dedup.cellAssignments]]), rank members within a cell
    * by quantized cosine to their OWN centroid (most-representative
    * first, vec_id tie-break), keep the top 16 per cell, and report
    * the per-cell manifest (population, kept, and the kept
    * representativeness mass in exact integer micros — per-member
    * truncation-quantized so the sum is order-free, the t37 pattern).
    *
    * Scale shape: assignment is one projected Long per row (no N×k
    * rows); ranking shuffles on the cell key whose population is
    * bounded by codebook sizing (k ∝ N/S), and the row_number-≤-K
    * idiom auto-rewrites to the bounded-heap GroupTopK operator, so a
    * cell is never fully sorted. The oracle re-derives the TWO-LEVEL
    * assignment CTE-for-CTE (d14's rule; one rep group at driver SFs,
    * where it equals the flat argmax) plus the rank/cap/fold.
    */
  val p08 = OpQuery.oracled("p08_cluster_balanced_sample", {
    import DedupOps.duckQDot
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM read_parquet('{SFDIR}/embeddings.parquet')
      |), n AS (
      |  SELECT vec_id, v, sqrt(${duckQDot("v", "v")}) AS nrm FROM e
      |), cent AS (
      |  SELECT vec_id AS c_id, v AS cv, sqrt(${duckQDot("v", "v")}) AS cnrm,
      |         row_number() OVER (ORDER BY vec_id) - 1 AS rnk
      |  FROM e WHERE vec_id % 250 = 0
      |), gs AS (
      |  SELECT greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS g FROM cent
      |), reps AS (
      |  SELECT c_id, cv, cnrm FROM cent WHERE rnk % (SELECT g FROM gs) = 0
      |), fg AS (
      |  SELECT c.c_id, c.cv, c.cnrm, r.c_id AS grp,
      |         row_number() OVER (
      |           PARTITION BY c.c_id
      |           ORDER BY ${duckQDot("c.cv", "r.cv")} / (c.cnrm * r.cnrm) DESC, r.c_id ASC) AS rr
      |  FROM cent c, reps r
      |), fines AS (
      |  SELECT c_id, cv, cnrm, grp FROM fg WHERE rr = 1
      |), vg AS (
      |  SELECT n.vec_id, r.c_id AS grp,
      |         row_number() OVER (
      |           PARTITION BY n.vec_id
      |           ORDER BY ${duckQDot("n.v", "r.cv")} / (n.nrm * r.cnrm) DESC, r.c_id ASC) AS rr
      |  FROM n, reps r
      |), vgrp AS (
      |  SELECT vec_id, grp FROM vg WHERE rr = 1
      |), assign AS (
      |  SELECT n.vec_id, f.c_id,
      |         CAST(trunc((${duckQDot("n.v", "f.cv")} / (n.nrm * f.cnrm)) * 1000000) AS BIGINT) AS cm,
      |         row_number() OVER (
      |           PARTITION BY n.vec_id
      |           ORDER BY ${duckQDot("n.v", "f.cv")} / (n.nrm * f.cnrm) DESC, f.c_id ASC) AS rn
      |  FROM n JOIN vgrp ON vgrp.vec_id = n.vec_id
      |         JOIN fines f ON f.grp = vgrp.grp
      |), cells AS (
      |  SELECT vec_id, c_id AS cell, cm AS cos_micros
      |  FROM assign WHERE rn = 1
      |), ranked AS (
      |  SELECT vec_id, cell, cos_micros,
      |         row_number() OVER (PARTITION BY cell
      |                            ORDER BY cos_micros DESC, vec_id ASC) AS kr
      |  FROM cells
      |)
      |SELECT cell,
      |       CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(count(CASE WHEN kr <= 16 THEN 1 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN kr <= 16 THEN cos_micros ELSE 0 END) AS BIGINT)
      |         AS kept_cos_micros
      |FROM ranked
      |GROUP BY cell ORDER BY cell""".stripMargin
  },
    doc = "cluster-balanced subsample: nearest-cell assignment + top-16 most-representative per cell (quantized cosine to own centroid), per-cell manifest") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    graft.expr.Functions.register(spark)
    val e = Sources.table(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cent = e.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val cells = graft.api.Dedup.cellAssignments(e, cent)
    // cosine to the OWN centroid: one broadcast join against the
    // codebook, quantized to integer micros BEFORE ranking so the
    // order and the kept-mass sum are bit-identical across engines
    val scored = cells
      .join(e, "vec_id")
      .join(broadcast(cent), col("cell") === col("c_id"))
      .withColumn("cos_micros", expr(
        """CAST((quantized_dot(v, cv)
          |  / (sqrt(quantized_dot(v, v)) * sqrt(quantized_dot(cv, cv))))
          |  * 1000000 AS BIGINT)""".stripMargin))
      .select(col("vec_id"), col("cell"), col("cos_micros"))
    // the rank-filter idiom rewrites to the bounded-heap GroupTopK
    // operator (no full per-cell sort); population counted separately
    val kept = scored
      .withColumn("kr",
        row_number().over(Window.partitionBy("cell")
          .orderBy(col("cos_micros").desc, col("vec_id"))))
      .filter(col("kr") <= 16)
      .groupBy("cell")
      .agg(count(lit(1)).cast("bigint").as("n_kept"),
        sum(col("cos_micros")).cast("bigint").as("kept_cos_micros"))
    scored.groupBy("cell")
      .agg(count(lit(1)).cast("bigint").as("n_total"))
      .join(kept, "cell")
      .select("cell", "n_total", "n_kept", "kept_cos_micros")
      .orderBy("cell")
  }

  /** DATASET CARD — the per-source datasheet every corpus release
    * ships (Gebru et al.'s "datasheets for datasets", reduced to the
    * numbers a training-mixture owner actually reads): volume (docs /
    * tokens / chars), exact-duplication exposure (docs whose full
    * text hash appears anywhere else in the corpus — within OR across
    * sources), the p04 integer quality gate's pass count, and
    * language breadth. Everything is an exact integer, so the card is
    * bit-stable across engines and releases — diffing two cards IS
    * the ingest regression report. Scale: one hash census
    * (uniform-key aggregate over md5), one join back on the hash
    * (co-partitioned), one per-source aggregate; no floats, no
    * windows, no driver state.
    */
  val p09 = OpQuery.oracled("p09_dataset_card", {
    s"""WITH f AS (
      |  SELECT doc_id, source, lang, n_chars, md5(text) AS h,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                  t -> length(t) BETWEEN 3 AND 8)) AS BIGINT) AS n_good
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), hc AS (
      |  SELECT h, count(*) AS k FROM f GROUP BY 1
      |)
      |SELECT f.source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(sum(f.n_chars) AS BIGINT) AS n_chars,
      |       CAST(sum(CASE WHEN hc.k > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_exact_dup,
      |       CAST(sum(CASE WHEN 20 * f.n_good >= 19 * f.n_tokens
      |                      AND f.n_tokens >= 20 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_quality_pass,
      |       CAST(count(DISTINCT f.lang) AS BIGINT) AS n_langs
      |FROM f JOIN hc ON hc.h = f.h
      |GROUP BY 1
      |ORDER BY 1""".stripMargin
  },
    doc = "per-source dataset card: docs/tokens/chars, global exact-dup exposure, integer quality-gate pass count, language breadth — all exact integers, the diffable ingest regression report") { (spark, dir) =>
    val f = Sources.table(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        md5(col("text")).as("h"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        expr("CAST(size(filter(toks, t -> length(t) >= 3 AND length(t) <= 8)) AS BIGINT)")
          .as("n_good"))
    val hc = f.groupBy("h").agg(count(lit(1)).as("k"))
    f.join(hc, "h")
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tokens").cast("bigint").as("n_tokens"),
        sum("n_chars").cast("bigint").as("n_chars"),
        sum(when(col("k") > 1, 1L).otherwise(0L)).cast("bigint")
          .as("n_exact_dup"),
        sum(when(col("n_good") * 20 >= col("n_tokens") * 19 &&
          col("n_tokens") >= 20, 1L).otherwise(0L)).cast("bigint")
          .as("n_quality_pass"),
        countDistinct("lang").cast("bigint").as("n_langs"))
      .orderBy("source")
  }

  /** k-anonymity audit of the corpus's released metadata surface
    * ([[graft.api.Corpus.kAnonymityProfile]]): the quasi-identifier is
    * (lang, source, 500-char length band) — the tuple a release's
    * per-document metadata exposes — and the output is the
    * group-size histogram: every document in a QI group of size k < 5
    * is re-identifiable to within k candidates, and the histogram says
    * how many rows sit at each exposure level. The privacy twin of
    * p09's dataset card: run both before a release, diff across
    * releases. Exact integers end to end.
    */
  /** p10's oracle, shared VERBATIM with the streaming monitor qs21
    * (the s22/qs16 pairing): the streamed QI-count view's read-time
    * histogram must land on the flat-table histogram exactly.
    */
  private[ops] val kAnonOracleSql: String =
    """WITH qi AS (
      |  SELECT lang, source, n_chars // 500 AS len_band, count(*) AS k
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |  GROUP BY 1, 2, 3
      |)
      |SELECT CAST(k AS BIGINT) AS k,
      |       CAST(count(*) AS BIGINT) AS n_groups,
      |       CAST(sum(k) AS BIGINT) AS n_rows
      |FROM qi GROUP BY 1
      |ORDER BY k""".stripMargin

  val p10 = OpQuery.oracled("p10_k_anonymity_audit", kAnonOracleSql,
    doc = "k-anonymity audit of the (lang, source, length-band) quasi-identifier: group-size histogram with rows-at-exposure counts — the release privacy gate, exact integers") { (spark, dir) =>
    graft.api.Corpus.kAnonymityProfile(
        Sources.table(spark, dir, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 500").as("len_band")),
        Seq("lang", "source", "len_band"))
      .orderBy("k")
  }

  /** The SUPPRESSION half of the k-anonymity story (p10 is the audit):
    * documents whose (lang, source, length-band) QI group is smaller
    * than k = 5 are withheld from the release, and the output is the
    * per-source release manifest — docs released, docs suppressed,
    * chars released — the privacy-gated composition of p10's grouping
    * with p09's card shape. Suppression (drop the row) rather than
    * generalization (coarsen the band) keeps the released rows' values
    * untouched, which is what a reproducible corpus release wants.
    *
    * Scale shape: one QI-grain aggregate, one join of the corpus back
    * to its (far smaller) QI frame on the same key the aggregate
    * shuffled on, one per-source aggregate. No row-level window.
    */
  val p11 = OpQuery.oracled("p11_anonymized_release",
    """WITH qi AS (
      |  SELECT lang, source, n_chars // 500 AS len_band, count(*) AS k
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |  GROUP BY 1, 2, 3
      |), d AS (
      |  SELECT f.source, f.n_chars,
      |         CASE WHEN qi.k >= 5 THEN 1 ELSE 0 END AS rel
      |  FROM read_parquet('{SFDIR}/documents.parquet') f
      |  JOIN qi ON qi.lang = f.lang AND qi.source = f.source
      |         AND qi.len_band = f.n_chars // 500
      |)
      |SELECT source,
      |       CAST(sum(rel) AS BIGINT) AS n_released,
      |       CAST(sum(1 - rel) AS BIGINT) AS n_suppressed,
      |       CAST(sum(CASE WHEN rel = 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |         AS chars_released
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "k-anonymous release manifest: suppress documents in QI groups smaller than 5, report per-source released/suppressed/chars — the suppression half of p10's audit") { (spark, dir) =>
    val f = Sources.table(spark, dir, "documents")
      .select(col("lang"), col("source"),
        expr("n_chars div 500").as("len_band"), col("n_chars"))
    val qi = f.groupBy("lang", "source", "len_band")
      .agg(count(lit(1)).as("k"))
    f.join(qi, Seq("lang", "source", "len_band"))
      .withColumn("rel", when(col("k") >= 5, 1L).otherwise(0L))
      .groupBy("source")
      .agg(sum("rel").cast("bigint").as("n_released"),
        sum(lit(1L) - col("rel")).cast("bigint").as("n_suppressed"),
        sum(when(col("rel") === 1L, col("n_chars")).otherwise(0L))
          .cast("bigint").as("chars_released"))
      .orderBy("source")
  }

  /** EVAL-LEAKAGE FIREWALL — the release-side composition of the
    * decontamination family, run in the direction that actually guards
    * a training run: t06's deterministic hash split fixes the eval set,
    * then every TRAIN document sharing ≥ 1 word 5-gram with ANY eval
    * document is dropped before release (t08 flags leaky TEST docs for
    * eval reporting; t32 scrubs spans; this gate removes leaky TRAIN
    * docs wholesale — the three directions a real pipeline runs
    * together). Output is the per-language release manifest — train
    * docs seen / dropped / kept, chars kept, the leak share in exact
    * floor-ppm — plus a gate verdict per stratum (pass iff leak_ppm ≤
    * 20 000, a 2% eval-leak budget; both engines compare the same exact
    * integers, so the flag is hash-stable).
    *
    * Scale shape: shingling is the codegen'd
    * [[graft.expr.WordShingles]] map stage; the eval side collapses to
    * its DISTINCT shingle set before the join (one row per shingle no
    * matter how many eval docs contain it — t08's uniform-key
    * argument), the train side stays (doc, shingle) distinct and the
    * leak test is a semi-join on the shingle key; the manifest is one
    * aggregate at language grain. No frequency caps needed, nothing
    * quadratic, nothing driver-side.
    */
  /** p12 kernel after the split: on a (doc_id, split, lang, n_chars,
    * text) frame, drop every train doc sharing a word 5-gram with any
    * test doc and emit the per-language release manifest — factored
    * for the hand fixture in CorpusSpec; see [[p12]] for the full
    * contract.
    */
  def evalLeakageManifest(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sh = docs.select(col("doc_id"), col("split"),
      explode(graft.expr.WordShingles.word_shingles(col("text"), 5)).as("g"))
    val ev = sh.filter(col("split") === "test").select("g").distinct()
    val leaky = sh.filter(col("split") === "train")
      .select("doc_id", "g").distinct()
      .join(ev, Seq("g"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("leak", lit(1L))
    docs.filter(col("split") === "train")
      .select("doc_id", "lang", "n_chars")
      .join(leaky, Seq("doc_id"), "left")
      .withColumn("leak", coalesce(col("leak"), lit(0L)))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_train"),
        sum("leak").cast("bigint").as("n_dropped"),
        (count(lit(1)) - sum("leak")).cast("bigint").as("n_kept"),
        sum(when(col("leak") === 0L, col("n_chars")).otherwise(0L))
          .cast("bigint").as("chars_kept"),
        expr("(sum(leak) * 1000000) div count(1)").cast("bigint")
          .as("leak_ppm"),
        when(expr("(sum(leak) * 1000000) div count(1)") <= 20000L, 1)
          .otherwise(0).cast("int").as("gate_pass"))
      .orderBy("lang")
  }

  val p12 = OpQuery.oracled("p12_eval_leakage_firewall",
    """WITH s AS (
      |  SELECT doc_id, text, lang, n_chars,
      |         CASE WHEN (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |                 + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 205
      |              THEN 'train' ELSE 'test' END AS split
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), tok AS (
      |  SELECT doc_id, split, string_split(text, ' ') AS ts FROM s
      |), sh AS (
      |  SELECT doc_id, split,
      |         concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4]) AS g
      |  FROM tok, unnest(generate_series(1, len(ts) - 4)) AS u(i)
      |  WHERE len(ts) >= 5
      |), ev AS (
      |  SELECT DISTINCT g FROM sh WHERE split = 'test'
      |), leaky AS (
      |  SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (g)
      |  WHERE sh.split = 'train'
      |), m AS (
      |  SELECT s.lang, s.n_chars,
      |         CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS leak
      |  FROM s LEFT JOIN leaky l USING (doc_id)
      |  WHERE s.split = 'train'
      |)
      |SELECT lang,
      |       CAST(count(*) AS BIGINT) AS n_train,
      |       CAST(sum(leak) AS BIGINT) AS n_dropped,
      |       CAST(count(*) - sum(leak) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN leak = 0 THEN n_chars ELSE 0 END) AS BIGINT)
      |         AS chars_kept,
      |       CAST((sum(leak) * 1000000) // count(*) AS BIGINT) AS leak_ppm,
      |       CAST(CASE WHEN (sum(leak) * 1000000) // count(*) <= 20000
      |            THEN 1 ELSE 0 END AS INT) AS gate_pass
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "eval-leakage firewall: train docs sharing any eval 5-gram dropped before release; per-language manifest + exact-ppm leak share + 2%-budget gate verdict (distinct-shingle semi-join, t08's scale shape)") { (spark, dir) =>
    evalLeakageManifest(graft.api.Sampling.withTrainTestSplit(
      Sources.table(spark, dir, "documents"), "doc_id", trainFraction = 0.8))
  }

  /** p01/p03 consume d04's verified-pairs stage, which reads the
    * per-SF materialized pairs table — carry its build as prepare so
    * their timings never absorb it, independent of run order.
    */
  /** Output shard count for p13 — small enough that every SF rung
    * fills all shards, large enough that the stripe balance is a real
    * claim (500 docs / 16 shards at sf0.001 → ~31 docs each).
    */
  private val nShards = 16

  /** RELEASE-SHARD PACKING PLAN — the manifest that turns an assembled
    * corpus into the fixed set of output shards a training run reads:
    * within each source, documents are ranked by size (tokens DESC,
    * doc_id tie-break) and striped round-robin across `nShards`
    * shards — the classic sorted-round-robin LPT approximation, which
    * bounds each shard's token excess over the mean by one stripe's
    * largest document. Because the stripe is PER SOURCE, every shard
    * also inherits a near-proportional slice of every source (no
    * shard is all-web or all-code), which is what keeps shard order
    * from becoming an accidental curriculum. Complements t14: t14
    * packs context-window BINS inside a shard in ingest order; p13
    * decides which documents land in which shard file.
    *
    * Scale shape: the only window is a per-SOURCE rank (executor-sized
    * partitions — never a global sort; the t14 doctrine), then one
    * shard-grain aggregate of ≤ nShards rows. All-integer output.
    */
  val p13 = OpQuery.oracled("p13_shard_packing_plan",
    s"""WITH d AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), r AS (
      |  SELECT source, doc_id, n_tok,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY n_tok DESC, doc_id) AS rk
      |  FROM d
      |), s AS (
      |  SELECT CAST((rk - 1) % $nShards AS INT) AS shard, source, n_tok
      |  FROM r
      |)
      |SELECT shard,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |       CAST(max(n_tok) AS BIGINT) AS max_doc_tokens
      |FROM s GROUP BY 1 ORDER BY shard""".stripMargin,
    doc = "release-shard packing plan: per-source size-sorted round-robin striping into fixed output shards — per-shard docs/tokens/source-breadth manifest with LPT-style balance, no global sort") { (spark, dir) =>
    shardPackingPlan(
      Sources.table(spark, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("bigint").as("n_tok")),
      nShards)
  }

  /** p13 kernel on a (source, doc_id, n_tok) frame — factored for the
    * balance-invariant fixture in CorpusSpec; see [[p13]].
    */
  def shardPackingPlan(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("n_tok").desc, col("doc_id"))))
      .select((((col("rk") - 1) % k)).cast("int").as("shard"),
        col("source"), col("n_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tok").cast("bigint").as("n_tokens"),
        countDistinct(col("source")).cast("bigint").as("n_sources"),
        max("n_tok").cast("bigint").as("max_doc_tokens"))
      .orderBy("shard")
  }

  /** DEDUP-CASCADE FUNNEL REPORT — p01's four-stage assembly re-read
    * as the per-stage DIAGNOSTICS table: for every source, how many
    * documents enter, and how many survive the exact-dedup, near-dedup,
    * length-gate and token-budget stages CUMULATIVELY (each stage a
    * conditional count over the same staged flag frame — the corpus is
    * never re-scanned per stage), plus the end-to-end exact floor-ppm
    * survival rate. This is the table that says WHERE a source's
    * documents die — a source bleeding at the near-dup stage is a
    * mirror; one dying at the length gate is fragments — which p01's
    * final manifest cannot distinguish.
    *
    * Stage semantics are p01's verbatim (same keeper rules, same
    * budget rule through the same `api.Corpus.tokenBudget` entry
    * point); the oracle re-derives all four stages and every
    * intermediate count.
    */
  val p14 = OpQuery.oracled("p14_dedup_cascade_report", {
    s"""WITH RECURSIVE pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |${DedupOps.d04.oracle.get}
      |  )
      |), edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION ALL
      |  SELECT doc_b AS u, doc_a AS v FROM pairs
      |), reach AS (
      |  SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
      |), lab AS (
      |  SELECT u AS doc_id, min(l) AS cluster_id FROM reach GROUP BY 1
      |), ek AS (
      |  SELECT min(doc_id) AS doc_id
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |  GROUP BY md5(text)
      |), d AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), st AS (
      |  SELECT d.doc_id, d.source, d.n_tokens,
      |         CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS exact_ok,
      |         CASE WHEN k.doc_id IS NOT NULL
      |                AND (lab.cluster_id IS NULL OR lab.cluster_id = d.doc_id)
      |              THEN 1 ELSE 0 END AS near_ok
      |  FROM d
      |  LEFT JOIN ek k ON k.doc_id = d.doc_id
      |  LEFT JOIN lab ON lab.doc_id = d.doc_id
      |), st2 AS (
      |  SELECT st.*, CASE WHEN near_ok = 1 AND n_tokens >= 20
      |                    THEN 1 ELSE 0 END AS len_ok
      |  FROM st
      |), adm AS (
      |  SELECT doc_id FROM (
      |    SELECT doc_id,
      |           sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
      |             AS cum
      |    FROM st2 WHERE len_ok = 1)
      |  WHERE cum <= 1000
      |)
      |SELECT s.source,
      |       CAST(count(*) AS BIGINT) AS n_raw,
      |       CAST(sum(s.exact_ok) AS BIGINT) AS n_exact,
      |       CAST(sum(s.near_ok) AS BIGINT) AS n_near,
      |       CAST(sum(s.len_ok) AS BIGINT) AS n_len,
      |       CAST(sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_admitted,
      |       CAST((sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 ELSE 0 END)
      |             * 1000000) // count(*) AS BIGINT) AS survival_ppm
      |FROM st2 s LEFT JOIN adm a ON a.doc_id = s.doc_id
      |GROUP BY 1 ORDER BY s.source""".stripMargin
  },
    doc = "dedup-cascade funnel report: per source, cumulative survivors of exact dedup -> near dedup -> length gate -> token budget (p01's stage semantics verbatim) + exact floor-ppm end-to-end survival — the where-do-documents-die diagnostics table") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val exactKeep = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).withColumn("ex", lit(1L))
    val clusters = graft.api.Dedup
      .nearDupClusters(DedupOps.d04.fn(spark, dir))
      .select(col("doc_id"), col("cluster_id"))
    val staged = docs
      .join(exactKeep, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint"))
      .withColumn("exact_ok",
        when(col("ex").isNotNull, 1L).otherwise(0L))
      .withColumn("near_ok",
        when(col("ex").isNotNull &&
          (col("cluster_id").isNull || col("cluster_id") === col("doc_id")),
          1L).otherwise(0L))
      .withColumn("len_ok",
        when(col("near_ok") === 1L && col("n_tokens") >= 20, 1L)
          .otherwise(0L))
      // text dropped, then eager localCheckpoint: the flag frame feeds
      // both the budget stage and the final aggregate — raw lineage
      // would re-run the near-dup join chain per consumer
      .select("doc_id", "source", "n_tokens", "exact_ok", "near_ok",
        "len_ok")
      .cutLineage
    val admitted = graft.api.Corpus.tokenBudget(
        staged.filter(col("len_ok") === 1L)
          .select("source", "doc_id", "n_tokens"),
        group = "source", order = "doc_id", nTokens = "n_tokens",
        budget = 1000L)
      .select(col("doc_id")).withColumn("bud", lit(1L))
    staged.join(admitted, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_raw"),
        sum("exact_ok").cast("bigint").as("n_exact"),
        sum("near_ok").cast("bigint").as("n_near"),
        sum("len_ok").cast("bigint").as("n_len"),
        sum(coalesce(col("bud"), lit(0L))).cast("bigint").as("n_admitted"))
      .select(col("source"), col("n_raw"), col("n_exact"), col("n_near"),
        col("n_len"), col("n_admitted"),
        expr("CAST((n_admitted * 1000000) div n_raw AS BIGINT)")
          .as("survival_ppm"))
      .orderBy("source")
  }

  /** Multi-objective corpus selection as a SKYLINE (Pareto-dominance)
    * operator — [[graft.api.Select.paretoSkyline]] — the operator
    * class the selection family lacks: p08/t22/t31 rank or gate on
    * ONE score, but "keep every document no other document beats on
    * ALL criteria at once" is a dominance relation, not a ranking,
    * and it's how a corpus curator trades off incomparable objectives
    * without inventing weights. Objectives here (all exact integers):
    * maximize lexical information (distinct whitespace tokens),
    * minimize byte cost (n_chars), minimize repetition (total −
    * distinct tokens). Duplicate objective vectors never dominate
    * each other, so ties all stay on the frontier. The kernel is the
    * two-phase distributed skyline (grid-cell prune + exact broadcast
    * dominance anti-join — scale argument and in-path caps on the
    * kernel's scaladoc); the oracle is the INDEPENDENT brute-force
    * NOT EXISTS, so a pruning bug that drops or resurrects a frontier
    * point hash-fails.
    */
  val p15 = OpQuery.oracled("p15_corpus_pareto_frontier",
    """WITH d AS (
      |  SELECT doc_id,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS info,
      |         CAST(n_chars AS BIGINT) AS cost,
      |         CAST(len(string_split(text, ' '))
      |              - len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS rep
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT p.doc_id, p.info, p.cost, p.rep
      |FROM d p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM d q
      |  WHERE q.info >= p.info AND q.cost <= p.cost AND q.rep <= p.rep
      |    AND (q.info > p.info OR q.cost < p.cost OR q.rep < p.rep)
      |)
      |ORDER BY p.doc_id""".stripMargin,
    doc = "skyline operator (Pareto frontier) over integer corpus objectives (max distinct tokens, min chars, min repetition): grid-cell prune + exact broadcast dominance anti-join; oracle is the independent brute-force NOT EXISTS") { (spark, dir) =>
    graft.api.Select.paretoSkyline(docObjectives(spark, dir), skyObjectives)
      .orderBy("doc_id")
  }

  /** p15/p16's shared per-document objective frame (exact integers). */
  private def docObjectives(spark: SparkSession, dir: String): DataFrame =
    Sources.table(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(array_distinct(col("toks"))).cast("long").as("info"),
        col("n_chars").cast("long").as("cost"),
        (size(col("toks")) - size(array_distinct(col("toks"))))
          .cast("long").as("rep"))

  private val skyObjectives =
    Seq("info" -> true, "cost" -> false, "rep" -> false)

  /** p15's objective CTE for the DuckDB side, shared by both skyline
    * oracles so the two queries certify the SAME objective surface.
    */
  private val skyObjectivesSql =
    """SELECT doc_id,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS info,
      |         CAST(n_chars AS BIGINT) AS cost,
      |         CAST(len(string_split(text, ' '))
      |              - len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS rep
      |  FROM read_parquet('{SFDIR}/documents.parquet')""".stripMargin

  /** Incremental maintenance of the p15 frontier under an ingest
    * batch — the VIEW-MAINTENANCE axis of the dominance view (the d20
    * index-lifecycle discipline applied to a derived view): the d09
    * md5 80/20 split stands in for "corpus so far" vs "new batch",
    * and the new frontier is computed from the OLD FRONTIER plus the
    * batch only — never by rescanning the base corpus. The identity
    * skyline(B ∪ I) = skyline(skyline(B) ∪ I) is exact: a base point
    * dominated within B stays dominated in the superset, and any
    * dominator in B of a surviving point is itself dominated by a
    * frontier point that (by transitivity) also dominates — so
    * pruning non-frontier base points removes no dominance evidence.
    * The audit labels every affected doc: `retained` (still frontier),
    * `displaced` (old frontier point now dominated — only an ingest
    * doc can do this), `entered` (batch doc joining the frontier).
    *
    * The ORACLE does NOT use the identity: it re-derives both
    * frontiers brute-force from first principles over the full
    * corpus, so the maintenance shortcut itself is what the hash gate
    * certifies. Scale shape: the incremental pass touches |frontier|
    * + |batch| rows (both cutLineage'd), not |corpus| — the whole
    * point of maintaining the view.
    */
  val p16 = OpQuery.oracled("p16_frontier_maintenance",
    s"""WITH d AS (
      |  SELECT doc_id, info, cost, rep,
      |         (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bkt
      |  FROM ($skyObjectivesSql
      |  ) obj
      |), base AS (
      |  SELECT doc_id, info, cost, rep FROM d WHERE bkt < 205
      |), fb AS (
      |  SELECT p.doc_id, p.info, p.cost, p.rep FROM base p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM base q
      |    WHERE q.info >= p.info AND q.cost <= p.cost AND q.rep <= p.rep
      |      AND (q.info > p.info OR q.cost < p.cost OR q.rep < p.rep))
      |), f AS (
      |  SELECT p.doc_id, p.info, p.cost, p.rep FROM d p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM d q
      |    WHERE q.info >= p.info AND q.cost <= p.cost AND q.rep <= p.rep
      |      AND (q.info > p.info OR q.cost < p.cost OR q.rep < p.rep))
      |)
      |SELECT doc_id, status, info, cost, rep FROM (
      |  SELECT fb.doc_id,
      |         CASE WHEN f.doc_id IS NOT NULL THEN 'retained'
      |              ELSE 'displaced' END AS status,
      |         fb.info, fb.cost, fb.rep
      |  FROM fb LEFT JOIN f ON f.doc_id = fb.doc_id
      |  UNION ALL
      |  SELECT f.doc_id, 'entered', f.info, f.cost, f.rep
      |  FROM f JOIN d ON d.doc_id = f.doc_id AND d.bkt >= 205
      |) ORDER BY doc_id""".stripMargin,
    doc = "incremental skyline view maintenance over the d09 80/20 ingest split: new frontier from old frontier + batch only (identity proved in scaladoc), audit rows retained/displaced/entered; oracle re-derives both frontiers brute-force from the full corpus") { (spark, dir) =>
    val withB = docObjectives(spark, dir)
      .withColumn("bkt", graft.api.Sampling.hashBucket(col("doc_id")))
    val base = withB.filter(col("bkt") < 205).drop("bkt")
    val batch = withB.filter(col("bkt") >= 205).drop("bkt")
    val baseF =
      graft.api.Select.paretoSkyline(base, skyObjectives).cutLineage
    val newF = graft.api.Select
      .paretoSkyline(baseF.unionAll(batch), skyObjectives).cutLineage
    val newIds = newF.select("doc_id")
    val retained = baseF.join(newIds, Seq("doc_id"), "left_semi")
      .withColumn("status", lit("retained"))
    val displaced = baseF.join(newIds, Seq("doc_id"), "left_anti")
      .withColumn("status", lit("displaced"))
    val entered = newF
      .join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("status", lit("entered"))
    retained.unionAll(displaced).unionAll(entered)
      .select(col("doc_id"), col("status"), col("info"), col("cost"),
        col("rep"))
      .orderBy("doc_id")
  }

  val all: Seq[OpQuery] = Seq(p01, p02, p03, p04, p05, p06, p07, p08,
    p09, p10, p11, p12, p13, p14, p15, p16).map { q =>
    if (Set(p01.name, p03.name, p14.name).contains(q.name))
      q.copy(prepare = (s, d) => { DedupOps.ensureNearDupPairs(s, d); () })
    else q
  }
}
