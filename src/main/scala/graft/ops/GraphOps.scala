package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.Checkpoints.LineageOps

import graft.io.Sources

/** Graph analytics over relational data — the co-purchase graph: two
  * parts are connected when some order contains both. Complements the
  * label-propagation connected components already in
  * [[graft.api.Dedup.nearDupClusters]] (d07) with the other canonical
  * massive-graph kernels: triangle counting and clustering
  * coefficients.
  *
  * The graph is deterministically sparsified (an arithmetic filter on
  * the endpoint keys, mirrored exactly in the oracle) so the edge set
  * stays analyzable at every scale factor; the ALGORITHM is the
  * unsparsified one.
  */
object GraphOps {

  // Keep ~10% of edges, by endpoint arithmetic both engines share.
  // Known (harmless, documented) structure: 7a+13b ≡ 0 (mod 10) holds
  // iff a ≡ b (mod 10), so the kept subgraph splits into the 10 key-
  // residue classes — g04 reports exactly 10 equal components, which
  // is the sparsifier showing through, not a bug. The kernels under
  // test are indifferent to it (triangles, coefficients, ranks, and
  // components are computed by the same code paths on any edge list;
  // GraphSpec runs them on irregular hand-built graphs).
  private val edgeKeep = "(7 * pa + 13 * pb) % 10 = 0"

  /** Distinct undirected co-purchase edges (pa < pb), sparsified.
    *
    * One shuffle, not two: the naive form is a lineitem SELF-JOIN on
    * the order key followed by a distinct — the whole fact table
    * shuffles twice. Instead each order's (bounded, <= 7-item) part set
    * is collected once and its a<b pairs expand in a map stage; only
    * the final distinct shuffles, and it shuffles pairs, which the
    * self-join would have shuffled anyway. The group-collect is safe
    * precisely because the per-order basket is bounded — this is NOT
    * the r15 collect_set anti-pattern, where the group was the hot
    * dimension itself.
    */
  private[graft] def deriveEdges(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    Sources.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps,
          |  (x, i) -> transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .filter(expr(edgeKeep))
      .distinct()

  /** Materialized per-SF co-purchase edge list; returns its path,
    * building (or refreshing) it when absent or stale vs the source
    * fingerprint. The edge list is a shared asset of the whole g-family
    * (11 queries): re-deriving it per query re-pays the same
    * one-shuffle build 11×, ~35 s of a 218 s full bench. At 100 TB an
    * edge list is a maintained materialized table, not a per-query
    * subtree — this mirrors that: built once per SF under
    * `target/edges`, read by every kernel, wired into each g-query's
    * `prepare` hook so Bench pays the build outside the timed section
    * (the same contract as the bucketed-table and media-staging
    * queries). Queries stay standalone because [[edges]] itself ensures
    * the build.
    */
  private[graft] def ensureEdges(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = synchronized {
    val sf = new java.io.File(dir).getName.replace(".", "_")
    val loc = s"${graft.io.Scratch.targetRoot}/edges/$sf/copurchase"
    val fp = graft.io.DerivedCache.fingerprint(dir, Seq("lineitem"))
    if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
      deriveEdges(spark, dir).write.mode("overwrite").parquet(loc)
      graft.io.DerivedCache.stamp(loc, fp)
    }
    loc
  }

  /** Distinct undirected co-purchase edges (pa < pb), sparsified — via
    * the materialized per-SF cache ([[ensureEdges]]).
    */
  private def edges(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(ensureEdges(spark, dir))

  // The kernels themselves live in the public API ([[graft.api.Graph]],
  // the Features/Corpus pattern) — these forwards keep GraphSpec and the
  // queries on one implementation.
  private[graft] def triangleStats(edgeList: DataFrame): DataFrame =
    graft.api.Graph.triangleStats(edgeList)

  private[graft] def clusteringCoefficients(edgeList: DataFrame): DataFrame =
    graft.api.Graph.clusteringCoefficients(edgeList)

  /** Global triangle census — count vs the oracle's naive 3-way
    * self-join, which is exactly the equivalence the orientation trick
    * must preserve.
    */
  val g01 = OpQuery.oracled("g01_triangle_count", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), nodes AS (
      |  SELECT pa AS n FROM e UNION SELECT pb FROM e
      |)
      |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
      |       (SELECT count(*) FROM e) AS n_edges,
      |       (SELECT count(*)
      |        FROM e e1 JOIN e e2 ON e2.pa = e1.pb
      |        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb) AS n_triangles""".stripMargin
  },
    doc = "triangle count via degree orientation (co-purchase graph; oracle = naive 3-way self-join)") { (spark, dir) =>
    triangleStats(edges(spark, dir))
  }

  /** The 20 most clustered nodes (local coefficient, degree >= 2, ties
    * broken by node id) — the "how cliquish is this product's
    * neighborhood" signal recommender features are built from. The
    * coefficient is an exact small-integer ratio, so the double divide
    * is bit-identical in both engines.
    */
  val g02 = OpQuery.oracled("g02_clustering_coefficients", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), deg AS (
      |  SELECT n AS node, count(*) AS deg
      |  FROM (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e)
      |  GROUP BY 1
      |), tri AS (
      |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      |  FROM e e1 JOIN e e2 ON e2.pa = e1.pb
      |  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
      |), nt AS (
      |  SELECT n AS node, count(*) AS n_tri
      |  FROM (SELECT unnest([a, b, c]) AS n FROM tri)
      |  GROUP BY 1
      |)
      |SELECT d.node, d.deg, coalesce(nt.n_tri, 0) AS n_tri,
      |       CAST(2 * coalesce(nt.n_tri, 0) AS DOUBLE) / (d.deg * (d.deg - 1)) AS coeff
      |FROM deg d LEFT JOIN nt USING (node)
      |WHERE d.deg >= 2
      |ORDER BY coeff DESC, node LIMIT 20""".stripMargin
  },
    doc = "top-20 local clustering coefficients (per-node triangle fan-out over the oriented census)") { (spark, dir) =>
    clusteringCoefficients(edges(spark, dir))
      .orderBy(col("coeff").desc, col("node"))
      .limit(20)
  }

  // PageRank fixed-point scale: ranks are integer picoranks (1e12 = 1.0)
  // so every engine computes bit-identical values — double-precision
  // PageRank cannot be oracled across engines (summation order), integer
  // PageRank can. Damping 0.85 becomes (85 * s) // 100; all operands are
  // positive, so floor division == truncation in both dialects.
  private val prOne = 1000000000000L
  private val prBase = 150000000000L // 0.15 in picoranks

  /** PageRank (3 power iterations, damping 0.85) over the co-purchase
    * graph in EXACT fixed-point arithmetic. Each iteration is one join
    * (edge list against current ranks, both keyed by the node — a
    * co-partitioned shuffle at scale) and one aggregate; the damping
    * and the degree division are integer ops, so the oracle's unrolled
    * CTE chain lands on the same bits. Degrees are joined into the
    * edge list ONCE, not per iteration. Intermediate sums stay far
    * under 2^63 here; a 100 TB graph would lift the accumulator to
    * DECIMAL(38,0) — same algebra.
    *
    * Undirected graph, every node has degree >= 1, so there is no
    * dangling-mass term and total rank is conserved up to truncation.
    */
  val g03 = OpQuery.oracled("g03_pagerank_fixedpoint", {
    def iterSql(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
      |  SELECT ed.v AS node, sum(p.r // ed.deg) AS s
      |  FROM ed JOIN $prev p ON p.node = ed.u
      |  GROUP BY 1
      |), r$i AS (
      |  SELECT node, $prBase + (85 * s) // 100 AS r FROM c$i
      |)"""
    }
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), e2 AS (
      |  SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e
      |), deg AS (
      |  SELECT u, count(*) AS deg FROM e2 GROUP BY 1
      |), ed AS (
      |  SELECT e2.u, e2.v, deg.deg FROM e2 JOIN deg ON deg.u = e2.u
      |), r0 AS (
      |  SELECT u AS node, CAST($prOne AS BIGINT) AS r FROM deg
      |), ${iterSql(1)}, ${iterSql(2)}, ${iterSql(3)}
      |SELECT node, CAST(r AS BIGINT) AS rank_pico
      |FROM r3
      |ORDER BY rank_pico DESC, node LIMIT 20""".stripMargin
  },
    doc = "fixed-point integer PageRank, 3 power iterations (one edge-rank join + aggregate per iteration)") { (spark, dir) =>
    graft.api.Graph.pageRankFixedPoint(edges(spark, dir), iterations = 3)
      .orderBy(col("rank_pico").desc, col("node"))
      .limit(20)
  }

  /** Connected-component size histogram of the co-purchase graph —
    * the same min-label-propagation machinery that clusters near-dups
    * ([[graft.api.Dedup.nearDupClusters]], d07) applied as a general
    * graph kernel, which is the point: transitive closure is ONE
    * operator in this engine, whatever the edges mean. The oracle is
    * the independent recursive-CTE formulation.
    */
  val g04 = OpQuery.oracled("g04_connected_components", {
    s"""WITH RECURSIVE pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), edges AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), reach AS (
      |  SELECT u, u AS l FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v
      |), lab AS (
      |  SELECT u AS node, min(l) AS comp FROM reach GROUP BY 1
      |), comps AS (
      |  SELECT comp, count(*) AS comp_size FROM lab GROUP BY 1
      |)
      |SELECT CAST(comp_size AS BIGINT) AS comp_size,
      |       count(*) AS n_components
      |FROM comps GROUP BY 1
      |ORDER BY comp_size""".stripMargin
  },
    doc = "connected-component size histogram (min-label propagation, shared with the dedup cluster operator)") { (spark, dir) =>
    graft.api.Graph.components(edges(spark, dir))
      .select("cluster_id", "cluster_size").distinct()
      .groupBy(col("cluster_size").as("comp_size"))
      .agg(count(lit(1)).as("n_components"))
      .orderBy("comp_size")
  }

  /** Degree distribution + degree correlation: per degree k, how many
    * nodes have degree k and the exact average degree of their
    * neighbors (the k_nn(k) assortativity curve — rising means hubs
    * attach to hubs). Three uniform-key shuffles: degree aggregation,
    * edge-to-degree join, per-node neighbor-degree sum; the final
    * per-k histogram is tiny. Every average is an exact
    * bigint-sum / count division, so the doubles are reproducible.
    */
  val g05 = OpQuery.oracled("g05_degree_assortativity", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), deg AS (
      |  SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |), nbr AS (
      |  SELECT s.u AS node, sum(d.deg) AS nbr_deg_sum, count(*) AS nbr_n
      |  FROM sym s JOIN deg d ON d.node = s.v GROUP BY 1
      |)
      |SELECT CAST(deg.deg AS BIGINT) AS deg,
      |       count(*) AS n_nodes,
      |       CAST(sum(nbr.nbr_deg_sum) AS DOUBLE) / sum(nbr.nbr_n) AS avg_neighbor_deg
      |FROM deg JOIN nbr USING (node)
      |GROUP BY 1 ORDER BY deg""".stripMargin
  },
    doc = "degree histogram + exact k_nn(k) assortativity curve of the co-purchase graph") { (spark, dir) =>
    graft.api.Graph.degreeAssortativity(edges(spark, dir))
  }

  /** Multi-source BFS from the graph's 5 highest-degree hubs, 2 hops —
    * the "blast radius" / influence-neighborhood query (recall
    * expansion, contamination spread, recommendation seeds). Runs
    * through [[graft.api.Graph.multiSourceBfs]]: one frontier join +
    * visited anti join per hop, never one traversal per seed. The
    * oracle unrolls the two frontier expansions as set-subtracted
    * CTEs.
    */
  val g06 = OpQuery.oracled("g06_multi_source_bfs", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), deg AS (
      |  SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |), h0 AS (
      |  SELECT node, 0 AS hop FROM deg ORDER BY deg DESC, node LIMIT 5
      |), h1 AS (
      |  SELECT DISTINCT e.v AS node, 1 AS hop
      |  FROM sym e JOIN h0 ON h0.node = e.u
      |  WHERE e.v NOT IN (SELECT node FROM h0)
      |), h2 AS (
      |  SELECT DISTINCT e.v AS node, 2 AS hop
      |  FROM sym e JOIN h1 ON h1.node = e.u
      |  WHERE e.v NOT IN (SELECT node FROM h0)
      |    AND e.v NOT IN (SELECT node FROM h1)
      |)
      |SELECT node, CAST(hop AS INT) AS hop
      |FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1
      |      UNION ALL SELECT * FROM h2)
      |ORDER BY hop, node""".stripMargin
  },
    doc = "2-hop multi-source BFS from the top-5 degree hubs (one frontier join per hop, not one traversal per seed)") { (spark, dir) =>
    val e = edges(spark, dir)
    val sym = e.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
    val seeds = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node")).limit(5)
      .select("node")
    graft.api.Graph.multiSourceBfs(e, seeds, maxHops = 2)
      .select(col("node"), col("hop").cast("int").as("hop"))
      .orderBy("hop", "node")
  }

  /** Semi-supervised label spread from the top-5 degree hubs (each
    * seeded with its own node id as the label), 2 synchronous
    * min-rounds. The oracle unrolls both rounds as CTEs — union of
    * self + neighbor labels, min per node, seeds re-asserted — which
    * is exactly the synchronous-update semantics the distributed
    * kernel must preserve (an asynchronous/in-place variant would leak
    * labels two hops in one round).
    */
  val g07 = OpQuery.oracled("g07_label_spread", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), seeds AS (
      |  SELECT node, node AS label FROM (
      |    SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |    ORDER BY deg DESC, node LIMIT 5)
      |), m1 AS (
      |  SELECT node, min(label) AS label FROM (
      |    SELECT node, label FROM seeds
      |    UNION ALL
      |    SELECT e.v AS node, l.label FROM sym e JOIN seeds l ON l.node = e.u)
      |  GROUP BY 1
      |), l1 AS (
      |  SELECT m.node, coalesce(s.label, m.label) AS label
      |  FROM m1 m LEFT JOIN seeds s ON s.node = m.node
      |), m2 AS (
      |  SELECT node, min(label) AS label FROM (
      |    SELECT node, label FROM l1
      |    UNION ALL
      |    SELECT e.v AS node, l.label FROM sym e JOIN l1 l ON l.node = e.u)
      |  GROUP BY 1
      |), l2 AS (
      |  SELECT m.node, coalesce(s.label, m.label) AS label
      |  FROM m2 m LEFT JOIN seeds s ON s.node = m.node
      |)
      |SELECT node, CAST(label AS BIGINT) AS label
      |FROM l2 ORDER BY node""".stripMargin
  },
    doc = "semi-supervised min-label spread from the top-5 hubs, 2 synchronous rounds (one frontier join + one min-aggregate per round)") { (spark, dir) =>
    val e = edges(spark, dir)
    val sym = e.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
    val seeds = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node")).limit(5)
      .select(col("node"), col("node").as("label"))
    graft.api.Graph.labelSpread(e, seeds, rounds = 2)
      .select(col("node"), col("label").cast("bigint").as("label"))
      .orderBy("node")
  }

  /** Link-prediction candidates: the strongest non-adjacent
    * distance-2 pairs by neighborhood Jaccard. The oracle keeps the
    * canonical wedge self-join + NOT EXISTS; the engine runs the same
    * wedge expansion with the existing-edge exclusion as an anti join
    * and the degree joins broadcast-able, guarded by the connector-
    * degree cap (64 — nodes above it cannot serve as wedge centers;
    * mirrored in the oracle's wedge WHERE, see
    * [[graft.api.Graph.linkFeatures]] for why the cap, not an
    * orientation, is the scale bound here). Top-100 with a full
    * deterministic tie-break — the score is one IEEE division of
    * exact integer counts, bit-identical in both engines.
    */
  val g08 = OpQuery.oracled("g08_link_prediction", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), deg AS (
      |  SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |), wedge AS (
      |  SELECT e1.v AS a, e2.v AS b, count(*) AS common
      |  FROM sym e1 JOIN sym e2 ON e1.u = e2.u AND e1.v < e2.v
      |  WHERE e1.u IN (SELECT node FROM deg WHERE deg <= 64)
      |  GROUP BY 1, 2
      |), cand AS (
      |  SELECT w.a, w.b, w.common FROM wedge w
      |  WHERE NOT EXISTS (SELECT 1 FROM e0
      |                    WHERE e0.pa = w.a AND e0.pb = w.b)
      |)
      |SELECT c.a, c.b, CAST(c.common AS BIGINT) AS common_neighbors,
      |       CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common)
      |         AS jaccard
      |FROM cand c
      |JOIN deg da ON da.node = c.a
      |JOIN deg db ON db.node = c.b
      |ORDER BY jaccard DESC, a, b LIMIT 100""".stripMargin
  },
    doc = "INDEX-SERVING timing: top-100 link-prediction ranking over " +
      "the prepare-materialized candidate table (the offline build is " +
      "timed separately as g16)") { (spark, dir) =>
    graft.api.Graph.scoreLinkCandidates(
      spark.read.parquet(ensureLinkCandidates(spark, dir)), topK = 100)
  }

  /** The OFFLINE half of the link-prediction pipeline as its own
    * timed, oracled entry: the full candidate build (degree-capped
    * wedge expansion, existing-edge anti join, degree joins) that g08
    * consumes from its `prepare`-materialized table. g08 alone would
    * let the expensive stage hide outside every timed section — this
    * query IS that stage, reduced to a per-common-count histogram so
    * the output stays bounded while the aggregate still forces every
    * candidate row through the anti join and both degree joins.
    */
  val g16 = OpQuery.oracled("g16_link_candidate_build", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), deg AS (
      |  SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |), wedge AS (
      |  SELECT e1.v AS a, e2.v AS b, count(*) AS common
      |  FROM sym e1 JOIN sym e2 ON e1.u = e2.u AND e1.v < e2.v
      |  WHERE e1.u IN (SELECT node FROM deg WHERE deg <= 64)
      |  GROUP BY 1, 2
      |), cand AS (
      |  SELECT w.a, w.b, w.common FROM wedge w
      |  WHERE NOT EXISTS (SELECT 1 FROM e0
      |                    WHERE e0.pa = w.a AND e0.pb = w.b)
      |)
      |SELECT CAST(c.common AS BIGINT) AS common_neighbors,
      |       count(*) AS n_pairs,
      |       CAST(sum(da.deg + db.deg) AS BIGINT) AS deg_mass
      |FROM cand c
      |JOIN deg da ON da.node = c.a
      |JOIN deg db ON db.node = c.b
      |GROUP BY 1 ORDER BY common_neighbors""".stripMargin
  },
    doc = "offline link-prediction candidate build timed end-to-end " +
      "(wedge expansion + anti join + degree joins), folded to a " +
      "per-common-count histogram") { (spark, dir) =>
    graft.api.Graph.linkCandidates(edges(spark, dir),
      maxConnectorDegree = Some(64L))
      .groupBy(col("common").cast("bigint").as("common_neighbors"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("deg_a") + col("deg_b")).cast("bigint").as("deg_mass"))
      .orderBy("common_neighbors")
  }

  /** Build-and-cache g08's distance-2 candidate table per SF
    * ([[graft.api.Graph.linkCandidates]]) — the offline half of the
    * link-prediction pipeline (candidate generation is a corpus-
    * snapshot batch build in production; only scoring/ranking runs
    * per request). Carried as g08's `prepare` so the timed section
    * measures the scoring stage, the same split d04/d09/p01/p03 use
    * for their index builds.
    */
  private[graft] def ensureLinkCandidates(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val loc = s"${graft.io.Scratch.targetRoot}/linkpred/$sf/candidates"
      val fp = graft.io.DerivedCache.fingerprint(dir, Seq("lineitem"))
      if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
        graft.api.Graph.linkCandidates(edges(spark, dir),
          maxConnectorDegree = Some(64L))
          .write.mode("overwrite").parquet(loc)
        graft.io.DerivedCache.stamp(loc, fp)
      }
      loc
    }

  /** Bounded k-core peel: three rounds of delete-degree-below-k with
    * degrees recomputed each round, reported as each surviving node's
    * degree. The oracle unrolls the three rounds as nested CTEs —
    * cross-engine parity proves the TRANSITION FUNCTION (one peel
    * round) exact, which is the inductive step the fixpoint form
    * ([[graft.api.Graph.kCore]] with `toFixpoint = true`, the
    * production contract, spec-tested to convergence in GraphSpec)
    * repeats; the full peel depth at the critical k (~20 rounds here)
    * is not expressible as one SQL statement, so the oracle pins the
    * algebra, the spec pins the fixpoint. k=8 sits at this graph's
    * critical threshold — the rounds genuinely shrink the graph at
    * every SF rather than no-op'ing.
    */
  val g09 = OpQuery.oracled("g09_kcore_peel", {
    def peel(src: String, i: Int): String =
      s"""d$i AS (
      |  SELECT u, count(*) AS d FROM (
      |    SELECT pa AS u FROM $src UNION ALL SELECT pb AS u FROM $src) GROUP BY 1
      |), e${i + 1} AS (
      |  SELECT pa, pb FROM $src
      |  WHERE pa NOT IN (SELECT u FROM d$i WHERE d < 8)
      |    AND pb NOT IN (SELECT u FROM d$i WHERE d < 8)
      |)""".stripMargin
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), ${peel("e0", 0)}, ${peel("e1", 1)}, ${peel("e2", 2)}
      |SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
      |FROM (SELECT pa AS u FROM e3 UNION ALL SELECT pb AS u FROM e3)
      |GROUP BY 1 ORDER BY node""".stripMargin
  },
    doc = "three k-core peel rounds (k=8): per-round degree recompute + anti joins; surviving node degrees vs the unrolled-CTE oracle") { (spark, dir) =>
    graft.api.Graph.kCore(edges(spark, dir), k = 8, maxRounds = 3,
        toFixpoint = false)
      .select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("bigint").as("deg"))
      .orderBy("node")
  }

  /** HyperBall (Boldi & Vigna, WWW 2013 — public algorithm): per-node
    * approximate BALL SIZE at radius 2 via one 16-register HLL per
    * node, iterated as "my ball sketch = max-merge of my neighbors'
    * previous sketches and mine". This is THE scale path to
    * neighborhood functions and harmonic/closeness centrality: each
    * round is one edge join + one max-aggregate over (node, bucket)
    * rows — 16 registers per node, uniform keys, cost independent of
    * ball sizes — where the exact computation (multi-source BFS per
    * node, or the sym∘sym expansion) pays the sum-of-deg² blowup g08
    * caps. Registers reuse r34's from-first-principles md5 HLL, so
    * every register, the harmonic numerator, and the IEEE estimate
    * hash-compare against DuckDB (exactly deterministic — the
    * approximation is to the BALL SIZE, not to the arithmetic).
    * Radius-2 accuracy is spec-checked against exact ball sizes in
    * GraphSpec; the oracle pins the sketch algebra.
    */
  val g10 = OpQuery.oracled("g10_hyperball_registers", {
    def merge(src: String, dst: String): String =
      s"""$dst AS (
      |  SELECT node, bucket, max(register) AS register FROM (
      |    SELECT node, bucket, register FROM $src
      |    UNION ALL
      |    SELECT s.v AS node, r.bucket, r.register
      |    FROM sym s JOIN $src r ON r.node = s.u)
      |  GROUP BY 1, 2
      |)""".stripMargin
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), h AS (
      |  SELECT DISTINCT u AS node,
      |         CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM sym
      |), r0 AS (
      |  SELECT node, h % 16 AS bucket,
      |         CASE WHEN h // 16 = 0 THEN 57
      |              ELSE 57 - length(bin(h // 16)) END AS register
      |  FROM h
      |), ${merge("r0", "r1")}, ${merge("r1", "r2")}
      |SELECT node,
      |       CAST(ssum + (16 - cnt) * (CAST(1 AS BIGINT) << 57) AS BIGINT) AS s_num,
      |       CAST(16 - cnt AS BIGINT) AS zero_regs,
      |       CAST(0.673 AS DOUBLE) * 256
      |         * CAST((CAST(1 AS BIGINT) << 57) AS DOUBLE)
      |         / CAST(ssum + (16 - cnt) * (CAST(1 AS BIGINT) << 57) AS DOUBLE)
      |         AS ball_estimate
      |FROM (
      |  SELECT node,
      |         sum(CAST(1 AS BIGINT) << (57 - register)) AS ssum,
      |         count(*) AS cnt
      |  FROM r2 GROUP BY 1)
      |ORDER BY node""".stripMargin
  },
    doc = "HyperBall radius-2 ball-size sketch: per-node 16-register HLL max-merged along edges for 2 rounds; registers, harmonic numerator and estimate hash-compared") { (spark, dir) =>
    val e = edges(spark, dir)
    graft.api.Graph.hyperBall(e, radius = 2).orderBy("node")
  }

  /** Harmonic centrality from the HyperBall profile — the sketch's
    * canonical consumer (what g10's registers exist FOR): H(v) =
    * (N̂_1 - 1)/1 + (N̂_2 - N̂_1)/2, the discounted count of how much
    * graph sits near each node, computable per radius from the same
    * 16-register frames with NO per-node traversal. Deltas and
    * divisions are fixed-order IEEE arithmetic over the
    * bit-deterministic estimates, so both engines produce identical
    * doubles. The exact computation needs per-node distances (all-pairs
    * BFS); the sketch path is the only one that survives 100 TB.
    */
  val g11 = OpQuery.oracled("g11_harmonic_centrality", {
    def merge(src: String, dst: String): String =
      s"""$dst AS (
      |  SELECT node, bucket, max(register) AS register FROM (
      |    SELECT node, bucket, register FROM $src
      |    UNION ALL
      |    SELECT s.v AS node, r.bucket, r.register
      |    FROM sym s JOIN $src r ON r.node = s.u)
      |  GROUP BY 1, 2
      |)""".stripMargin
    def est(src: String, dst: String): String =
      s"""$dst AS (
      |  SELECT node,
      |         CAST(0.673 AS DOUBLE) * 256
      |           * CAST((CAST(1 AS BIGINT) << 57) AS DOUBLE)
      |           / CAST(ssum + (16 - cnt) * (CAST(1 AS BIGINT) << 57) AS DOUBLE)
      |           AS est
      |  FROM (
      |    SELECT node,
      |           sum(CAST(1 AS BIGINT) << (57 - register)) AS ssum,
      |           count(*) AS cnt
      |    FROM $src GROUP BY 1)
      |)""".stripMargin
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), h AS (
      |  SELECT DISTINCT u AS node,
      |         CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM sym
      |), r0 AS (
      |  SELECT node, h % 16 AS bucket,
      |         CASE WHEN h // 16 = 0 THEN 57
      |              ELSE 57 - length(bin(h // 16)) END AS register
      |  FROM h
      |), ${merge("r0", "r1")}, ${merge("r1", "r2")},
      |${est("r1", "s1")}, ${est("r2", "s2")}
      |SELECT s1.node, s1.est AS est_1, s2.est AS est_2,
      |       (s1.est - CAST(1 AS DOUBLE))
      |         + (s2.est - s1.est) / CAST(2 AS DOUBLE) AS harmonic
      |FROM s1 JOIN s2 ON s2.node = s1.node
      |ORDER BY s1.node""".stripMargin
  },
    doc = "harmonic centrality from HyperBall radius-1/2 estimate deltas (fixed-order IEEE arithmetic over bit-deterministic registers)") { (spark, dir) =>
    graft.api.Graph.harmonicCentrality(edges(spark, dir), maxRadius = 2)
      .orderBy("node")
  }

  /** Personalized PageRank from the top-3 degree hubs — the "related
    * to THESE products" recommendation kernel: teleport mass lands
    * only on the seed set, so rank decays with distance from it and
    * only the seed neighborhood ever holds nonzero rank (the locality
    * that makes PPR cheap at 100 TB where global PageRank is a
    * whole-graph job). Same exact picorank arithmetic as g03, so the
    * unrolled-CTE oracle bit-checks all three iterations.
    */
  val g12 = OpQuery.oracled("g12_personalized_pagerank", {
    def iterSql(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
      |  SELECT ed.v AS node, sum(p.r // ed.deg) AS s
      |  FROM ed JOIN $prev p ON p.node = ed.u
      |  GROUP BY 1
      |), r$i AS (
      |  SELECT COALESCE(c.node, sb.node) AS node,
      |         COALESCE((85 * c.s) // 100, 0) + COALESCE(sb.base, 0) AS r
      |  FROM c$i c FULL JOIN sb ON sb.node = c.node
      |)"""
    }
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), e2 AS (
      |  SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e
      |), deg AS (
      |  SELECT u, count(*) AS deg FROM e2 GROUP BY 1
      |), ed AS (
      |  SELECT e2.u, e2.v, deg.deg FROM e2 JOIN deg ON deg.u = e2.u
      |), seeds AS (
      |  SELECT u AS node FROM deg ORDER BY deg DESC, u ASC LIMIT 3
      |), sb AS (
      |  SELECT node, CAST($prBase AS BIGINT) AS base FROM seeds
      |), r0 AS (
      |  SELECT node, CAST($prOne AS BIGINT) AS r FROM seeds
      |), ${iterSql(1)}, ${iterSql(2)}, ${iterSql(3)}
      |SELECT node, CAST(r AS BIGINT) AS rank_pico
      |FROM r3
      |ORDER BY rank_pico DESC, node LIMIT 20""".stripMargin
  },
    doc = "personalized PageRank from the top-3 degree hubs (seed-only teleport; exact picorank arithmetic, rank frame bounded by the seed neighborhood)") { (spark, dir) =>
    val el = edges(spark, dir)
    val e2 = el.select(col("pa").as("u"))
      .unionAll(el.select(col("pb").as("u")))
    val seeds = e2.groupBy("u").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("u").asc).limit(3)
      .select(col("u").as("node"))
    graft.api.Graph.personalizedPageRank(el, seeds, iterations = 3)
      .orderBy(col("rank_pico").desc, col("node"))
      .limit(20)
  }

  /** WEIGHTED co-purchase edges: the distinct-pair derivation kept at
    * order grain so each pair's multiplicity (how many orders bought
    * both parts) survives as the edge weight — the collect_set basket
    * already dedups within an order, so `count(*)` over the expanded
    * pairs IS the distinct-order count. Materialized per SF beside the
    * unweighted table with the same staleness guard.
    */
  private[graft] def ensureWeightedEdges(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val loc = s"${graft.io.Scratch.targetRoot}/edges/$sf/copurchase_weighted"
      val fp = graft.io.DerivedCache.fingerprint(dir, Seq("lineitem"))
      if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
        Sources.table(spark, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps,
              |  (x, i) -> transform(slice(ps, i + 2, size(ps)),
              |            y -> struct(x AS pa, y AS pb))))""".stripMargin)).as("p"))
          .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
          .filter(expr(edgeKeep))
          .groupBy("pa", "pb").agg(count(lit(1)).as("w"))
          .write.mode("overwrite").parquet(loc)
        graft.io.DerivedCache.stamp(loc, fp)
      }
      loc
    }

  private def weightedEdges(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(ensureWeightedEdges(spark, dir))

  /** Weighted PageRank over the co-purchase graph — g03 with rank
    * flowing in proportion to how often each pair is actually bought
    * together ([[graft.api.Graph.weightedPageRank]]). Weighted graphs
    * are the production norm; the oracle unrolls the same fixed-point
    * recurrence with the weight ratio inside the integer division.
    */
  val g13 = OpQuery.oracled("g13_weighted_pagerank", {
    def iterSql(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
      |  SELECT ed.v AS node, sum((p.r * ed.w) // ed.wsum) AS s
      |  FROM ed JOIN $prev p ON p.node = ed.u
      |  GROUP BY 1
      |), r$i AS (
      |  SELECT node, $prBase + (85 * s) // 100 AS r FROM c$i
      |)"""
    }
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT pa, pb, count(*) AS w FROM pairs WHERE $edgeKeep GROUP BY 1, 2
      |), e2 AS (
      |  SELECT pa AS u, pb AS v, w FROM e UNION ALL SELECT pb, pa, w FROM e
      |), wdeg AS (
      |  SELECT u, sum(w) AS wsum FROM e2 GROUP BY 1
      |), ed AS (
      |  SELECT e2.u, e2.v, e2.w, wdeg.wsum FROM e2 JOIN wdeg ON wdeg.u = e2.u
      |), r0 AS (
      |  SELECT u AS node, CAST($prOne AS BIGINT) AS r FROM wdeg
      |), ${iterSql(1)}, ${iterSql(2)}, ${iterSql(3)}
      |SELECT node, CAST(r AS BIGINT) AS rank_pico
      |FROM r3
      |ORDER BY rank_pico DESC, node LIMIT 20""".stripMargin
  },
    doc = "weighted PageRank, 3 fixed-point iterations: rank flows proportional to co-purchase multiplicity") { (spark, dir) =>
    graft.api.Graph.weightedPageRank(weightedEdges(spark, dir), iterations = 3)
      .orderBy(col("rank_pico").desc, col("node"))
      .limit(20)
  }

  /** Association-rule mining over the co-purchase baskets — the
    * market-basket classic (Apriori at the 2-itemset level): for each
    * kept pair A,B bought together in >= 2 orders, both directed rules
    * A->B and B->A with their support, confidence and lift. The pair
    * counts ARE the weighted edge table ([[ensureWeightedEdges]], g13's
    * input) — one maintained asset, two consumers — over the same
    * sparsifier-kept pair universe (mirrored in the oracle, as for
    * every g-query). The min-support cut is the Apriori scale guard:
    * at any SF the rule candidates are the pairs that repeat, a tiny
    * fraction of all pairs. Per-item order counts come from one
    * distinct-aggregate over lineitem and broadcast into the rule
    * join (items are a dimension next to fact-scale pair data). All
    * three metrics are single IEEE divisions of exact integer products
    * (`lift = w·N / (c_A·c_B)` cross-multiplied before the one cast),
    * so the doubles — and the lift-ranked top-20 cut — are
    * bit-identical on both engines.
    */
  val r62 = OpQuery.oracled("r62_association_rules", {
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT pa, pb, count(*) AS w FROM pairs WHERE $edgeKeep GROUP BY 1, 2
      |), n AS (
      |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem
      |), item AS (
      |  SELECT l_partkey AS p, count(DISTINCT l_orderkey) AS c
      |  FROM lineitem GROUP BY 1
      |), rules AS (
      |  SELECT pa AS antecedent, pb AS consequent, w FROM e WHERE w >= 2
      |  UNION ALL
      |  SELECT pb AS antecedent, pa AS consequent, w FROM e WHERE w >= 2
      |)
      |SELECT r.antecedent, r.consequent, CAST(r.w AS BIGINT) AS pair_orders,
      |       CAST(r.w AS DOUBLE) / n.n_orders AS support,
      |       CAST(r.w AS DOUBLE) / ca.c AS confidence,
      |       CAST(r.w * n.n_orders AS DOUBLE) / (ca.c * cb.c) AS lift
      |FROM rules r
      |CROSS JOIN n
      |JOIN item ca ON ca.p = r.antecedent
      |JOIN item cb ON cb.p = r.consequent
      |ORDER BY lift DESC, antecedent, consequent LIMIT 20""".stripMargin
  },
    doc = "market-basket association rules (Apriori 2-itemsets): support/confidence/lift from the shared weighted co-purchase table, top-20 by lift") { (spark, dir) =>
    val li = Sources.table(spark, dir, "lineitem")
    val nOrders = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val item = li.groupBy(col("l_partkey").as("p"))
      .agg(countDistinct(col("l_orderkey")).as("c"))
    val e = weightedEdges(spark, dir).filter(col("w") >= 2)
    val rules = e.select(col("pa").as("antecedent"),
        col("pb").as("consequent"), col("w"))
      .unionAll(e.select(col("pb").as("antecedent"),
        col("pa").as("consequent"), col("w")))
    rules
      .crossJoin(broadcast(nOrders))
      .join(broadcast(item.select(col("p").as("antecedent"), col("c").as("ca"))),
        "antecedent")
      .join(broadcast(item.select(col("p").as("consequent"), col("c").as("cb"))),
        "consequent")
      .select(col("antecedent"), col("consequent"),
        col("w").cast("bigint").as("pair_orders"),
        (col("w").cast("double") / col("n_orders")).as("support"),
        (col("w").cast("double") / col("ca")).as("confidence"),
        ((col("w") * col("n_orders")).cast("double") / (col("ca") * col("cb")))
          .as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(20)
  }

  /** Item-item collaborative-filtering similarity — the bipartite
    * complement of the order-grain co-purchase graph: the incidence is
    * (customer, part) over a customer's WHOLE purchase history
    * (orders ⋈ lineitem, distinct), projected to item-item cosine
    * `co / (√n_a·√n_b)` where `co` counts shared customers and `n_x`
    * counts an item's customers. This is the classic recommender
    * primitive ("customers who bought A also bought B, normalized for
    * popularity") and a genuinely different graph from g01–g13's:
    * per-order baskets say "bought together in one checkout", the
    * customer projection says "bought by the same person ever".
    *
    * Scale shape: the pair expansion is per-customer over the user's
    * basket, and the bound is ENFORCED, not assumed: customers with
    * more than [[maxBasketItems]] distinct items (median here is ~39,
    * p99 ~77) are excluded from the pair expansion — on power-law
    * incidence the hot users are exactly the basket² blowup, and their
    * co-occurrence signal is popularity noise the cosine denominator
    * exists to cancel anyway. Popularity counts stay over the FULL
    * incidence (true n_x in the denominator), the same split as g08's
    * connector cap; the oracle mirrors the cap in its `ub` CTE. Total
    * pairs are thus O(users·cap²) by construction, not O(items²). The
    * ≥2-shared-customers cut drops the noise tail before the cosine
    * join; item customer-counts are a broadcast dimension; the top-3
    * cut is the bounded-heap GroupTopK. Cosines are one double
    * division of exact integers times two correctly-rounded sqrts
    * (t31/t36 precedent) — bit-identical across engines.
    */
  private val maxBasketItems = 64L

  val g14 = OpQuery.oracled("g14_item_cf_similarity", {
    s"""WITH ui AS (
      |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |), np AS (
      |  SELECT p, count(*) AS n FROM ui GROUP BY 1
      |), ub AS (
      |  SELECT u FROM ui GROUP BY 1 HAVING count(*) <= $maxBasketItems
      |), co AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*) AS co
      |  FROM ui a JOIN ub ON ub.u = a.u
      |  JOIN ui b ON a.u = b.u AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), sym AS (
      |  SELECT pa AS item, pb AS neighbor, co FROM co
      |  UNION ALL
      |  SELECT pb AS item, pa AS neighbor, co FROM co
      |), scored AS (
      |  SELECT s.item, s.neighbor, CAST(s.co AS BIGINT) AS shared_users,
      |         CAST(s.co AS DOUBLE)
      |           / (sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE))) AS cosine
      |  FROM sym s
      |  JOIN np na ON na.p = s.item
      |  JOIN np nb ON nb.p = s.neighbor
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY item
      |                               ORDER BY cosine DESC, neighbor) AS rn
      |  FROM scored
      |)
      |SELECT item, neighbor, shared_users, cosine
      |FROM ranked WHERE rn <= 3
      |ORDER BY item, cosine DESC, neighbor""".stripMargin
  },
    doc = "item-item CF: customer-history bipartite projection, enforced per-user basket cap, popularity-normalized cosine, >=2 shared-customer cut, bounded-heap top-3 per item; auto a-priori support prune (off on this flat fixture, on for power-law tails)") { (spark, dir) =>
    graft.api.Graph.itemCfSimilarity(
        spark.read.parquet(ensureCfIncidence(spark, dir)),
        minShared = 2, k = 3, maxBasket = Some(maxBasketItems),
        assumeDeduped = true)
      .orderBy(col("item"), col("cosine").desc, col("neighbor"))
  }

  /** The (customer, part) purchase-history incidence behind g14/g25. */
  private def cfIncidence(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Sources.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey").as("p"))
      .join(Sources.table(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey").as("u")),
        "l_orderkey")
      .select("u", "p")

  /** Materialized per-SF DEDUPED (customer, part) incidence — the
    * shared input of g14 (exact item-CF) and g25 (DIMSUM sampled
    * sibling), maintained as an OFFLINE asset like [[ensureCfTruth]]
    * one step downstream (r15 verdict item 1): both queries used to
    * re-pay the lineitem⋈orders join + distinct INSIDE their timed
    * bodies (together 16% of the r15 official draw), measuring input
    * prep instead of the similarity kernels the two queries exist to
    * compare. In production the purchase-history incidence is a
    * maintained table refreshed with the corpus, not rebuilt per
    * probe. Built under the DerivedCache fingerprint guard with the
    * loud REBUILD marker (the ensureBucketed precedent), so an
    * in-timing rebuild after a swallowed prepare() failure is
    * attributable in the bench log; the DuckDB oracles still
    * re-derive the incidence from the raw tables, so a stale or
    * wrong materialization hash-fails.
    */
  private[graft] def ensureCfIncidence(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): String = synchronized {
    val sf = new java.io.File(dir).getName.replace(".", "_")
    val loc = s"${graft.io.Scratch.targetRoot}/mirror/$sf/cf_incidence"
    val fp = graft.io.DerivedCache.fingerprint(dir, Seq("lineitem", "orders"))
    if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
      System.err.println(s"[ensureCfIncidence] REBUILD from $dir")
      cfIncidence(spark, dir).distinct()
        .write.mode("overwrite").parquet(loc)
      graft.io.DerivedCache.stamp(loc, fp)
    }
    loc
  }

  /** Materialized per-SF exact item-CF top-3 — g25's planted truth as
    * a maintained OFFLINE asset (the qs26/g08 offline-vs-serving
    * split): in production the exact neighbor table is refreshed with
    * the corpus on its own cadence, not recomputed inside every
    * recall probe, so the probe's timed cost is the SAMPLED leg it
    * exists to measure. Built under the DerivedCache fingerprint
    * guard; the DuckDB oracle still re-derives the entire exact leg
    * from the raw tables, so a stale or wrong truth hash-fails. The
    * REBUILD stderr marker (r15 ADVICE) makes an in-timing rebuild —
    * the one code path that could legitimately inflate g25's timed
    * reading — attributable in one read of the bench log.
    */
  private def ensureCfTruth(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = synchronized {
    val sf = new java.io.File(dir).getName.replace(".", "_")
    val loc = s"${graft.io.Scratch.targetRoot}/mirror/$sf/cf_truth"
    val fp = graft.io.DerivedCache.fingerprint(dir, Seq("lineitem", "orders"))
    if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
      System.err.println(s"[ensureCfTruth] REBUILD from $dir")
      graft.api.Graph.itemCfSimilarity(
          spark.read.parquet(ensureCfIncidence(spark, dir)),
          minShared = 2, k = 3, maxBasket = Some(maxBasketItems),
          assumeDeduped = true)
        .select("item", "neighbor")
        .write.mode("overwrite").parquet(loc)
      graft.io.DerivedCache.stamp(loc, fp)
    }
    loc
  }

  /** g25's sampling dials: a sparse setting (~7% of the flat
    * fixture's typical √n_a·√n_b ≈ 27 at sf0.01/sf0.1) and a moderate
    * one (~30%) — BOTH genuinely sampled at the bench rungs, so the
    * registry query's shuffle stays a fraction of the census (the
    * first cut used γ = 32 > den, whose "dense" leg degenerated to
    * the full exact pair shuffle at sf0.1 and read 12.6 s — a recall
    * dial that pays census cost measures nothing). The p = 1 census
    * branch of the estimator is still registry-exercised: at sf0.001
    * den ≈ 3 < 8, so the moderate dial IS the census there, and the
    * kernel spec pins the branch directly.
    */
  private val dimsumGammas = Seq(2, 8)

  /** The DIMSUM sampled sibling of g14 (r14 verdict item 4): the
    * a-priori prune is the exact path's lever and stays OFF on the
    * flat fixture by design, so this query puts the OTHER scale lever
    * — γ-thresholded map-side sampling, shuffle volume independent of
    * user count — in the registry where correctness and scaling are
    * exercised every round, not probe-only. Per γ, the sampled top-3
    * neighbors (ranked on the re-inflated cosine estimate) are scored
    * against the EXACT g14 top-3 as planted truth: one summary row
    * per γ with the emitted-occurrence count (the shuffle the dial
    * buys) and exact-integer recall ppm (what it costs). The md5 coin
    * makes the draw bit-reproducible, so DuckDB replays the entire
    * sample and the recall table hash-matches.
    */
  val g25 = OpQuery.oracled("g25_dimsum_sampled_similarity", {
    val gammaList = dimsumGammas.mkString(", ")
    s"""WITH ui AS (
      |  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |), np AS (
      |  SELECT p, count(*) AS n FROM ui GROUP BY 1
      |), ub AS (
      |  SELECT u FROM ui GROUP BY 1 HAVING count(*) <= $maxBasketItems
      |), co AS (
      |  SELECT a.p AS pa, b.p AS pb, count(*) AS co
      |  FROM ui a JOIN ub ON ub.u = a.u
      |  JOIN ui b ON a.u = b.u AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), symx AS (
      |  SELECT pa AS item, pb AS neighbor, co FROM co
      |  UNION ALL
      |  SELECT pb AS item, pa AS neighbor, co FROM co
      |), rankedx AS (
      |  SELECT item, neighbor,
      |         row_number() OVER (PARTITION BY item ORDER BY
      |           CAST(co AS DOUBLE)
      |             / (sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE)))
      |           DESC, neighbor) AS rn
      |  FROM symx s
      |  JOIN np na ON na.p = s.item
      |  JOIN np nb ON nb.p = s.neighbor
      |), slots AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_exact_slots
      |  FROM rankedx WHERE rn <= 3
      |), cand AS (
      |  SELECT a.u, a.p AS pa, b.p AS pb
      |  FROM ui a JOIN ub ON ub.u = a.u
      |  JOIN ui b ON a.u = b.u AND a.p < b.p
      |), drawn AS (
      |  SELECT c.u, c.pa, c.pb,
      |         CAST(CAST('0x' || substr(md5(CAST(c.u AS VARCHAR) || '|'
      |              || CAST(c.pa AS VARCHAR) || '|'
      |              || CAST(c.pb AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
      |           AS u01,
      |         sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE)) AS den
      |  FROM cand c
      |  JOIN np na ON na.p = c.pa
      |  JOIN np nb ON nb.p = c.pb
      |), gs AS (
      |  SELECT unnest([$gammaList]) AS gamma
      |), kept AS (
      |  SELECT gs.gamma, d.pa, d.pb
      |  FROM drawn d CROSS JOIN gs
      |  WHERE d.u01 < (CAST(gs.gamma AS DOUBLE) / d.den)
      |                  * 1152921504606846976.0
      |), agg AS (
      |  SELECT gamma, pa, pb, CAST(count(*) AS BIGINT) AS c
      |  FROM kept GROUP BY 1, 2, 3
      |), est AS (
      |  SELECT a.gamma, a.pa, a.pb, a.c,
      |         CASE WHEN sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE))
      |                   <= CAST(a.gamma AS DOUBLE)
      |              THEN CAST(a.c AS DOUBLE)
      |                   / (sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE)))
      |              ELSE CAST(a.c AS DOUBLE) / CAST(a.gamma AS DOUBLE)
      |         END AS est_cosine
      |  FROM agg a
      |  JOIN np na ON na.p = a.pa
      |  JOIN np nb ON nb.p = a.pb
      |), syms AS (
      |  SELECT gamma, pa AS item, pb AS neighbor, est_cosine FROM est
      |  UNION ALL
      |  SELECT gamma, pb AS item, pa AS neighbor, est_cosine FROM est
      |), rsamp AS (
      |  SELECT gamma, item, neighbor,
      |         row_number() OVER (PARTITION BY gamma, item
      |                            ORDER BY est_cosine DESC, neighbor) AS rn
      |  FROM syms
      |), hits AS (
      |  SELECT s.gamma, CAST(count(*) AS BIGINT) AS n_hits
      |  FROM rsamp s
      |  JOIN rankedx x ON x.rn <= 3 AND x.item = s.item
      |                AND x.neighbor = s.neighbor
      |  WHERE s.rn <= 3
      |  GROUP BY 1
      |), pe AS (
      |  SELECT gamma, CAST(count(*) AS BIGINT) AS n_sampled_pairs,
      |         CAST(sum(c) AS BIGINT) AS n_emitted
      |  FROM est GROUP BY 1
      |)
      |SELECT pe.gamma, pe.n_sampled_pairs, pe.n_emitted,
      |       slots.n_exact_slots,
      |       coalesce(h.n_hits, 0) AS n_hits,
      |       CAST((coalesce(h.n_hits, 0) * 1000000) // slots.n_exact_slots
      |            AS BIGINT) AS recall_ppm
      |FROM pe CROSS JOIN slots
      |LEFT JOIN hits h ON h.gamma = pe.gamma
      |ORDER BY pe.gamma""".stripMargin
  },
    doc = "DIMSUM sampled item-item similarity: md5-coin pair sampling at p=min(1, gamma/(sqrt(na)*sqrt(nb))) with read-time re-inflation, scored per gamma against the exact g14 top-3 as planted truth - the shuffle-vs-recall dial in the registry") { (spark, dir) =>
    val est = graft.api.Graph.dimsumPairEstimates(
      spark.read.parquet(ensureCfIncidence(spark, dir)),
      dimsumGammas, maxBasket = Some(maxBasketItems),
      assumeDeduped = true).cutLineage
    // exact planted truth = g14's own output (minShared 2, top-3),
    // served from the prepare-materialized offline table
    val exact = spark.read.parquet(ensureCfTruth(spark, dir))
    val sym = est.select(col("gamma"), col("pa").as("item"),
        col("pb").as("neighbor"), col("est_cosine"))
      .unionAll(est.select(col("gamma"), col("pb").as("item"),
        col("pa").as("neighbor"), col("est_cosine")))
    val top = graft.api.Windows.topKPerGroup(sym, Seq("gamma", "item"),
      Seq(("est_cosine", true), ("neighbor", false)), 3)
    val hits = top
      .join(exact.select(col("item"), col("neighbor")),
        Seq("item", "neighbor"), "left_semi")
      .groupBy("gamma").agg(count(lit(1)).cast("bigint").as("n_hits"))
    val pe = est.groupBy("gamma")
      .agg(count(lit(1)).cast("bigint").as("n_sampled_pairs"),
        sum("c").cast("bigint").as("n_emitted"))
    val slots = exact.agg(count(lit(1)).cast("bigint").as("n_exact_slots"))
    pe.crossJoin(broadcast(slots))
      .join(hits, Seq("gamma"), "left")
      .select(col("gamma"), col("n_sampled_pairs"), col("n_emitted"),
        col("n_exact_slots"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("CAST((coalesce(n_hits, 0L) * 1000000) div n_exact_slots AS BIGINT)")
          .as("recall_ppm"))
      .orderBy("gamma")
  }

  /** Walk-corpus generation for graph embeddings
    * ([[graft.api.Graph.hashWalks]]): 3-step deterministic
    * hash-directed walks from the top-5 degree hubs. The md5 draw
    * replaces the RNG so the walk table is bit-reproducible — and
    * therefore oracle-checkable: the oracle unrolls the three argmin
    * steps with the identical hash expression.
    */
  val g15 = OpQuery.oracled("g15_hash_walk_corpus", {
    def stepSql(s: Int): String = {
      val prev = s"w${s - 1}"
      s"""w$s AS (
      |  SELECT seed, v AS node FROM (
      |    SELECT w.seed, s.v,
      |           row_number() OVER (PARTITION BY w.seed ORDER BY
      |             md5(concat_ws('|', CAST(w.seed AS VARCHAR), '$s',
      |                           CAST(s.u AS VARCHAR), CAST(s.v AS VARCHAR))),
      |             s.v) AS rn
      |    FROM $prev w JOIN sym s ON s.u = w.node) WHERE rn = 1
      |)"""
    }
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), deg AS (
      |  SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |), seeds AS (
      |  SELECT node FROM deg ORDER BY deg DESC, node LIMIT 5
      |), w0 AS (
      |  SELECT node AS seed, node FROM seeds
      |), ${stepSql(1)}, ${stepSql(2)}, ${stepSql(3)}
      |SELECT seed, CAST(step AS INT) AS step, node FROM (
      |  SELECT seed, 0 AS step, node FROM w0
      |  UNION ALL SELECT seed, 1, node FROM w1
      |  UNION ALL SELECT seed, 2, node FROM w2
      |  UNION ALL SELECT seed, 3, node FROM w3)
      |ORDER BY seed, step""".stripMargin
  },
    doc = "deterministic hash-directed 3-step walks from the top-5 hubs (node2vec walk corpus with a portable md5 draw; bit-reproducible, oracle unrolls the argmin steps)") { (spark, dir) =>
    val e = edges(spark, dir)
    val sym = e.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
    val seeds = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node")).limit(5)
      .select("node")
    graft.api.Graph.hashWalks(e, seeds, steps = 3)
      .select(col("seed"), col("step").cast("int").as("step"), col("node"))
      .orderBy("seed", "step")
  }

  /** Community modularity report over the g07 label-spread partition:
    * every node gets a community (its 2-round min-spread label where
    * the spread reached it, its own id as a singleton otherwise — a
    * full partition, which modularity requires), then Newman's
    * per-community decomposition Q_c = e_c/m − (d_c/2m)² via
    * [[graft.api.Graph.modularity]] — the quality gate a community
    * pipeline runs before trusting its clusters downstream. The
    * oracle carries g07's label CTEs verbatim, completes the
    * partition with the same coalesce, and mirrors the two-division
    * float expression token-for-token (exact integer counts
    * underneath, the e26 contract).
    */
  val g17 = OpQuery.oracled("g17_community_modularity", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), seeds AS (
      |  SELECT node, node AS label FROM (
      |    SELECT u AS node, count(*) AS deg FROM sym GROUP BY 1
      |    ORDER BY deg DESC, node LIMIT 5)
      |), m1 AS (
      |  SELECT node, min(label) AS label FROM (
      |    SELECT node, label FROM seeds
      |    UNION ALL
      |    SELECT e.v AS node, l.label FROM sym e JOIN seeds l ON l.node = e.u)
      |  GROUP BY 1
      |), l1 AS (
      |  SELECT m.node, coalesce(s.label, m.label) AS label
      |  FROM m1 m LEFT JOIN seeds s ON s.node = m.node
      |), m2 AS (
      |  SELECT node, min(label) AS label FROM (
      |    SELECT node, label FROM l1
      |    UNION ALL
      |    SELECT e.v AS node, l.label FROM sym e JOIN l1 l ON l.node = e.u)
      |  GROUP BY 1
      |), l2 AS (
      |  SELECT m.node, coalesce(s.label, m.label) AS label
      |  FROM m2 m LEFT JOIN seeds s ON s.node = m.node
      |), allnodes AS (
      |  SELECT DISTINCT u AS node FROM sym
      |), lab AS (
      |  SELECT a.node, coalesce(l.label, a.node) AS label
      |  FROM allnodes a LEFT JOIN l2 l ON l.node = a.node
      |), mt AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m FROM e0
      |), el AS (
      |  SELECT x.label AS la, y.label AS lb
      |  FROM e0 e
      |  JOIN lab x ON x.node = e.pa
      |  JOIN lab y ON y.node = e.pb
      |), intra AS (
      |  SELECT la AS label, count(*) AS intra_edges FROM el
      |  WHERE la = lb GROUP BY 1
      |), degs AS (
      |  SELECT label, count(*) AS degree_sum FROM (
      |    SELECT la AS label FROM el UNION ALL SELECT lb AS label FROM el)
      |  GROUP BY 1
      |), sizes AS (
      |  SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1
      |)
      |SELECT s.label, CAST(s.n_nodes AS BIGINT) AS n_nodes,
      |       CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
      |       CAST(coalesce(d.degree_sum, 0) AS BIGINT) AS degree_sum,
      |       CAST(coalesce(i.intra_edges, 0) AS DOUBLE) / m
      |         - (CAST(coalesce(d.degree_sum, 0) AS DOUBLE) / (2.0 * m))
      |           * (CAST(coalesce(d.degree_sum, 0) AS DOUBLE) / (2.0 * m))
      |         AS q_contrib
      |FROM sizes s
      |LEFT JOIN degs d USING (label)
      |LEFT JOIN intra i USING (label)
      |CROSS JOIN mt
      |ORDER BY label""".stripMargin
  },
    doc = "per-community Newman modularity over the g07 label-spread " +
      "partition completed with singletons (exact integer counts; " +
      "mirrored two-division float expression)") { (spark, dir) =>
    val e = edges(spark, dir)
    val sym = e.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(e.select(col("pb").as("u"), col("pa").as("v")))
    val seeds = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node")).limit(5)
      .select(col("node"), col("node").as("label"))
    val spread = graft.api.Graph.labelSpread(e, seeds, rounds = 2)
    val labels = sym.select(col("u").as("node")).distinct()
      .join(spread, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    graft.api.Graph.modularity(e, labels)
      .select(col("label"), col("n_nodes"), col("intra_edges"),
        col("degree_sum"), col("q_contrib"))
      .orderBy("label")
  }

  /** Bounded-hop weighted shortest paths from the graph's 3
    * highest-degree hubs — the weighted generalization of g06's BFS
    * blast radius (cheapest-reach gating: "which items can be reached
    * from the anchors within 3 hops, and at what tie-strength cost").
    * Edge cost is an exact integer derived from co-purchase
    * multiplicity, `c = 1 + 16 div (w + 1)` — stronger ties are
    * cheaper — mirrored verbatim in the oracle (both engines integer-
    * divide). Three synchronous Bellman-Ford relaxations through
    * [[graft.api.Graph.weightedSssp]]: one frontier-edge join + one
    * min-aggregate per round, distances as exact BIGINTs; the oracle
    * unrolls the three relaxations as min-union CTEs.
    */
  val g18 = OpQuery.oracled("g18_weighted_sssp", {
    def relaxSql(i: Int): String = {
      val prev = s"d${i - 1}"
      s"""d$i AS (
      |  SELECT node, min(dist) AS dist FROM (
      |    SELECT node, dist FROM $prev
      |    UNION ALL
      |    SELECT ed.v AS node, p.dist + ed.c AS dist
      |    FROM ed JOIN $prev p ON p.node = ed.u
      |  ) GROUP BY 1
      |)"""
    }
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT pa, pb, count(*) AS w FROM pairs WHERE $edgeKeep GROUP BY 1, 2
      |), ed AS (
      |  SELECT pa AS u, pb AS v, 1 + 16 // (w + 1) AS c FROM e
      |  UNION ALL
      |  SELECT pb, pa, 1 + 16 // (w + 1) FROM e
      |), deg AS (
      |  SELECT u AS node, count(*) AS deg FROM ed GROUP BY 1
      |), d0 AS (
      |  SELECT node, CAST(0 AS BIGINT) AS dist
      |  FROM (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 3)
      |), ${relaxSql(1)}, ${relaxSql(2)}, ${relaxSql(3)}
      |SELECT node, CAST(dist AS BIGINT) AS dist
      |FROM d3 ORDER BY node""".stripMargin
  },
    doc = "3-round multi-seed weighted Bellman-Ford over co-purchase tie strength (oracle unrolls the relaxations)") { (spark, dir) =>
    val e = weightedEdges(spark, dir)
      .select(col("pa"), col("pb"),
        (lit(1L) + expr("16 div (w + 1)")).as("c"))
    val sym = e.select(col("pa").as("u"))
      .unionAll(e.select(col("pb").as("u")))
    val seeds = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("node")).limit(3)
      .select("node")
    graft.api.Graph.weightedSssp(e, seeds, rounds = 3)
      .select(col("node"), col("dist").cast("bigint").as("dist"))
      .orderBy("node")
  }

  /** Edge-support histogram of the co-purchase graph — for every
    * edge, the number of triangles containing it (common neighbors of
    * its endpoints), aggregated to (support, n_edges). The support-0
    * row counts the LOCAL BRIDGES (weak ties with no alternative
    * local route); the rest is the k-truss peeling spectrum. Runs
    * through [[graft.api.Graph.edgeSupport]] (degree-oriented
    * triangle census + per-edge fan-out); the oracle counts common
    * neighbors naively per edge.
    */
  val g19 = OpQuery.oracled("g19_edge_support_histogram", {
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e
      |), cn AS (
      |  SELECT e.pa, e.pb, count(*) AS sup
      |  FROM e
      |  JOIN sym a ON a.u = e.pa
      |  JOIN sym b ON b.u = e.pb AND b.v = a.v
      |  GROUP BY 1, 2
      |), supported AS (
      |  SELECT e.pa, e.pb, coalesce(cn.sup, 0) AS sup
      |  FROM e LEFT JOIN cn ON cn.pa = e.pa AND cn.pb = e.pb
      |)
      |SELECT CAST(sup AS BIGINT) AS sup, count(*) AS n_edges
      |FROM supported
      |GROUP BY 1 ORDER BY sup""".stripMargin
  },
    doc = "per-edge triangle support histogram (support 0 = local bridges; oracle = naive common-neighbor count per edge)") { (spark, dir) =>
    graft.api.Graph.edgeSupport(edges(spark, dir))
      .groupBy("sup").agg(count(lit(1)).as("n_edges"))
      .orderBy("sup")
  }

  /** Bounded 4-truss core of the co-purchase graph — two peels of
    * "drop every edge in fewer than 2 triangles, recompute support"
    * ([[graft.api.Graph.ktrussPeel]]) and the support census of what
    * survives. One notch stronger than the g09 k-core (it demands
    * TRIANGLES through every edge, not just degree), the truss core is
    * the classic recommendation-graph community filter: an edge that
    * survives is embedded in a dense neighborhood, one that peels away
    * was a weak tie riding on a single wedge. The oracle unrolls the
    * two peels CTE-for-CTE over the g19 naive common-neighbor census.
    */
  val g20 = OpQuery.oracled("g20_ktruss_core", {
    def census(i: Int): String =
      s"""sym$i AS (
      |  SELECT pa AS u, pb AS v FROM e$i
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e$i
      |), cn$i AS (
      |  SELECT e.pa, e.pb, count(*) AS sup
      |  FROM e$i e
      |  JOIN sym$i a ON a.u = e.pa
      |  JOIN sym$i b ON b.u = e.pb AND b.v = a.v
      |  GROUP BY 1, 2
      |), sup$i AS (
      |  SELECT e.pa, e.pb, coalesce(cn.sup, 0) AS sup
      |  FROM e$i e LEFT JOIN cn$i cn ON cn.pa = e.pa AND cn.pb = e.pb
      |)"""
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), ${census(0)}, e1 AS (
      |  SELECT pa, pb FROM sup0 WHERE sup >= 2
      |), ${census(1)}, e2 AS (
      |  SELECT pa, pb FROM sup1 WHERE sup >= 2
      |), ${census(2)}
      |SELECT CAST(sup AS BIGINT) AS sup, count(*) AS n_edges
      |FROM sup2
      |GROUP BY 1 ORDER BY sup""".stripMargin
  },
    doc = "bounded 4-truss peel: two drop-if-support<2 rounds + final " +
      "support census of the surviving core (oracle unrolls the peels " +
      "over the naive per-edge common-neighbor count)") { (spark, dir) =>
    graft.api.Graph.ktrussPeel(edges(spark, dir), k = 4, rounds = 2)
      .groupBy("sup").agg(count(lit(1)).as("n_edges"))
      .orderBy("sup")
  }

  /** HITS hubs and authorities ([[graft.api.Graph.hitsScores]],
    * Kleinberg 1999) over the DIRECTED bipartite purchase graph
    * customer→part: a customer is a good HUB when they buy
    * authoritative parts, a part a good AUTHORITY when good hubs buy
    * it — the mutual-reinforcement ranking PageRank's single score
    * can't express, and the classic recommender bootstrap on exactly
    * this bipartite shape. L1-normalized exact fixed-point arithmetic
    * (see the API doc for why L1, not L2), two iterations, top-20 per
    * side. The oracle unrolls both rounds as CTEs with `//` floors.
    */
  val g21 = OpQuery.oracled("g21_hits_bipartite", {
    def round(i: Int): String = {
      val prev = if (i == 1) "h0" else s"h${i - 1}n"
      s"""a$i AS (
      |  SELECT e.p, sum($prev.h) AS a FROM e JOIN $prev USING (c) GROUP BY 1
      |), a${i}n AS (
      |  SELECT p, (a * 1000000) // (SELECT sum(a) FROM a$i) AS a FROM a$i
      |), h$i AS (
      |  SELECT e.c, sum(a${i}n.a) AS h FROM e JOIN a${i}n USING (p) GROUP BY 1
      |), h${i}n AS (
      |  SELECT c, (h * 1000000) // (SELECT sum(h) FROM h$i) AS h FROM h$i
      |)"""
    }
    s"""WITH e AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |), h0 AS (
      |  SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM e
      |), ${round(1)}, ${round(2)}
      |SELECT * FROM (
      |  SELECT 'hub' AS side, c AS node, CAST(h AS BIGINT) AS score_ppm
      |  FROM h2n ORDER BY score_ppm DESC, node LIMIT 20
      |)
      |UNION ALL
      |SELECT * FROM (
      |  SELECT 'authority' AS side, p AS node, CAST(a AS BIGINT) AS score_ppm
      |  FROM a2n ORDER BY score_ppm DESC, node LIMIT 20
      |)
      |ORDER BY side, score_ppm DESC, node""".stripMargin
  },
    doc = "HITS hubs/authorities on the bipartite customer-part purchase graph: L1-normalized exact fixed-point power iteration, 2 rounds, top-20 per side") { (spark, dir) =>
    val e = spark.read.parquet(ensureBipartiteEdges(spark, dir))
    graft.api.Windows.topKPerGroup(
        graft.api.Graph.hitsScores(e, iterations = 2),
        Seq("side"), Seq(("score_ppm", true), ("node", false)), 20)
      .select("side", "node", "score_ppm")
      .orderBy(col("side"), col("score_ppm").desc, col("node"))
  }

  /** Materialized per-SF bipartite customer→part purchase edge list
    * (g21's input) — the same maintained-table contract as
    * [[ensureEdges]]: built once per SF outside the timed section, so
    * the g21 number measures the HITS kernel, not the orderkey join.
    */
  private[graft] def ensureBipartiteEdges(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val loc = s"${graft.io.Scratch.targetRoot}/edges/$sf/purchase_bipartite"
      val fp = graft.io.DerivedCache.fingerprint(dir,
        Seq("orders", "lineitem"))
      if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
        Sources.table(spark, dir, "orders")
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("src"))
          .join(Sources.table(spark, dir, "lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("dst")),
            "ok")
          .select("src", "dst").distinct()
          .write.mode("overwrite").parquet(loc)
        graft.io.DerivedCache.stamp(loc, fp)
      }
      loc
    }

  /** STRONGLY connected components (g22) over the DIRECTED line-
    * sequence graph: part a → part b when some order lists a on the
    * line immediately before b (both lines at quantity ≥ 30 — the
    * deterministic sparsifier that keeps the cycle structure
    * non-degenerate: unfiltered, every part reaches every part and the
    * SCC census collapses to one row). Cross-order reversals create
    * real cycles, so the graph has the canonical web shape — one giant
    * SCC plus an acyclic rim — and the census (size histogram + each
    * size class's exact-ppm share of nodes) is the "how much of this
    * graph is cyclically tangled" diagnostic.
    *
    * Engine vs oracle is the whole point here: the oracle computes
    * mutual reachability by RECURSIVE-CTE transitive closure — O(V²)
    * pairs, fine for DuckDB at oracle scale, catastrophic at 100 TB —
    * while the engine runs the two-phase
    * [[graft.api.Graph.stronglyConnectedComponents]]: distributed
    * WEAK-component decomposition (the existing contraction + bail-out
    * CC kernel) shards the graph perfectly, then each weak component
    * resolves in ONE task by the iterative Tarjan kernel under a loud
    * edge cap (the union-find bail-out contract). Equality proves the
    * scalable shape lands on the closure's answer.
    */
  val g22 = OpQuery.oracled("g22_scc_census", {
    s"""WITH RECURSIVE e AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey
      |   AND a.l_linenumber + 1 = b.l_linenumber
      |   AND a.l_partkey <> b.l_partkey
      |  WHERE a.l_quantity >= 30 AND b.l_quantity >= 30
      |), reach(src, dst) AS (
      |  SELECT src, dst FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
      |), nodes AS (
      |  -- explicit DISTINCT: inside a WITH RECURSIVE clause list,
      |  -- DuckDB does not apply UNION's dedup here
      |  SELECT DISTINCT v FROM (
      |    SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
      |), mutual AS (
      |  SELECT a.src AS u, a.dst AS v
      |  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
      |), scc AS (
      |  SELECT n.v AS node, least(n.v, coalesce(min(m.v), n.v)) AS scc_id
      |  FROM nodes n LEFT JOIN mutual m ON m.u = n.v
      |  GROUP BY n.v
      |), sizes AS (
      |  SELECT scc_id, count(*) AS sz FROM scc GROUP BY 1
      |), tot AS (
      |  SELECT count(*) AS n FROM nodes
      |)
      |SELECT CAST(sz AS BIGINT) AS scc_size,
      |       CAST(count(*) AS BIGINT) AS n_sccs,
      |       CAST(sz * count(*) AS BIGINT) AS n_nodes,
      |       CAST((sz * count(*) * 1000000) // (SELECT n FROM tot)
      |            AS BIGINT) AS share_ppm
      |FROM sizes GROUP BY sz ORDER BY scc_size""".stripMargin
  },
    doc = "strongly-connected-component census of the directed line-sequence part graph: coloring/FW-BW peeling (trim + delta-frontier max-color + backward carve) vs the oracle's O(V^2) recursive-CTE closure — size histogram + exact-ppm node shares") { (spark, dir) =>
    val scc = graft.api.Graph.stronglyConnectedComponents(
      spark.read.parquet(ensureSequenceEdges(spark, dir)))
    val sizes = scc.groupBy("scc_id").agg(count(lit(1)).as("sz"))
    val tot = scc.agg(count(lit(1)).as("n"))
    sizes.groupBy("sz")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .select(col("sz").cast("bigint").as("scc_size"),
        col("cnt").cast("bigint").as("n_sccs"),
        (col("sz") * col("cnt")).cast("bigint").as("n_nodes"),
        expr("(sz * cnt * 1000000) div n").cast("bigint").as("share_ppm"))
      .orderBy("scc_size")
  }

  /** Materialized per-SF directed line-sequence edge list (g22's
    * input) — same maintained-table contract as [[ensureEdges]].
    */
  private[graft] def ensureSequenceEdges(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    synchronized {
      val sf = new java.io.File(dir).getName.replace(".", "_")
      val loc = s"${graft.io.Scratch.targetRoot}/edges/$sf/line_sequence"
      val fp = graft.io.DerivedCache.fingerprint(dir, Seq("lineitem"))
      if (!graft.io.DerivedCache.isFresh(loc, s"$loc/_SUCCESS", fp)) {
        val li = Sources.table(spark, dir, "lineitem")
          .filter(col("l_quantity") >= 30)
          .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
            col("l_partkey"))
        li.select(col("ok"), col("ln"), col("l_partkey").as("src"))
          .join(li.select(col("ok"), (col("ln") - 1).as("ln"),
            col("l_partkey").as("dst")), Seq("ok", "ln"))
          .filter(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
          .write.mode("overwrite").parquet(loc)
        graft.io.DerivedCache.stamp(loc, fp)
      }
      loc
    }

  /** Every g-query carries the shared edge build as its `prepare` step:
    * Verify/Bench run it once per SF outside the timed section, so the
    * per-query numbers measure the kernel, not an 12×-repaid derivation.
    */
  /** EFFECTIVE DIAMETER (90%) from the HyperBall neighborhood
    * function — the classic sketch readout (Palmer/Gibbons/Faloutsos
    * ANF; Boldi–Vigna HyperBall): NF(r) = Σ_v |ball_r(v)| estimated
    * from the same 16-register frames g10/g11 maintain, and the
    * effective diameter is the smallest radius whose NF reaches 90%
    * of the horizon's. Per-node estimates are quantized to integer
    * micros BEFORE the global sum (floor of a bit-deterministic
    * double — the t37 truncation doctrine), so the sum is order-free
    * and exact; the 90% rule is the integer cross-multiply
    * `10·NF(r) ≥ 9·NF(R)`. Output is the radius profile with the
    * threshold flag AS DATA — the first flagged radius IS the
    * effective diameter.
    *
    * Scale shape: [[graft.api.Graph.hyperBallProfile]]'s bounded
    * rounds (constant work per node per round), then a radius-grain
    * aggregate of |nodes|·R rows. The exact alternative is all-pairs
    * BFS — the sketch path is the only one alive at 100 TB.
    */
  val g23 = OpQuery.oracled("g23_effective_diameter", {
    def merge(src: String, dst: String): String =
      s"""$dst AS (
      |  SELECT node, bucket, max(register) AS register FROM (
      |    SELECT node, bucket, register FROM $src
      |    UNION ALL
      |    SELECT s.v AS node, r.bucket, r.register
      |    FROM sym s JOIN $src r ON r.node = s.u)
      |  GROUP BY 1, 2
      |)""".stripMargin
    def est(src: String, dst: String, r: Int): String =
      s"""$dst AS (
      |  SELECT $r AS radius,
      |         CAST(floor(CAST(0.673 AS DOUBLE) * 256
      |           * CAST((CAST(1 AS BIGINT) << 57) AS DOUBLE)
      |           / CAST(ssum + (16 - cnt) * (CAST(1 AS BIGINT) << 57) AS DOUBLE)
      |           * 1000000) AS BIGINT) AS em
      |  FROM (
      |    SELECT node,
      |           sum(CAST(1 AS BIGINT) << (57 - register)) AS ssum,
      |           count(*) AS cnt
      |    FROM $src GROUP BY 1)
      |)""".stripMargin
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e0 AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), sym AS (
      |  SELECT pa AS u, pb AS v FROM e0
      |  UNION ALL
      |  SELECT pb AS u, pa AS v FROM e0
      |), h AS (
      |  SELECT DISTINCT u AS node,
      |         CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM sym
      |), r0 AS (
      |  SELECT node, h % 16 AS bucket,
      |         CASE WHEN h // 16 = 0 THEN 57
      |              ELSE 57 - length(bin(h // 16)) END AS register
      |  FROM h
      |), ${merge("r0", "r1")}, ${merge("r1", "r2")}, ${merge("r2", "r3")},
      |${est("r1", "e1", 1)}, ${est("r2", "e2", 2)}, ${est("r3", "e3", 3)},
      |nf AS (
      |  SELECT radius, CAST(count(*) AS BIGINT) AS n_nodes,
      |         CAST(sum(em) AS BIGINT) AS nf_micros
      |  FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2
      |        UNION ALL SELECT * FROM e3)
      |  GROUP BY 1
      |), mx AS (SELECT nf_micros AS nf_max FROM nf WHERE radius = 3)
      |SELECT CAST(radius AS INT) AS radius, n_nodes, nf_micros,
      |       CAST((nf_micros * 1000000) // (SELECT nf_max FROM mx) AS BIGINT)
      |         AS share_ppm,
      |       CAST(CASE WHEN 10 * nf_micros >= 9 * (SELECT nf_max FROM mx)
      |                 THEN 1 ELSE 0 END AS INT) AS reaches_90pct
      |FROM nf ORDER BY radius""".stripMargin
  },
    doc = "effective diameter from the HyperBall neighborhood function: per-radius NF as an order-free sum of floor-micros ball estimates, 90% rule as integer cross-multiply — the first flagged radius is the effective diameter") { (spark, dir) =>
    effectiveDiameterProfile(
      graft.api.Graph.hyperBallProfile(edges(spark, dir), maxRadius = 3),
      horizon = 3)
  }

  /** g23 readout kernel on a (radius, ball_estimate) profile frame —
    * factored for the hand fixture in GraphSpec; see [[g23]].
    */
  def effectiveDiameterProfile(prof: org.apache.spark.sql.DataFrame,
      horizon: Int): org.apache.spark.sql.DataFrame = {
    val nf = prof
      .select(col("radius"),
        floor(col("ball_estimate") * 1000000).cast("bigint").as("em"))
      .groupBy("radius")
      .agg(count(lit(1)).cast("bigint").as("n_nodes"),
        sum("em").cast("bigint").as("nf_micros"))
    val mx = nf.agg(max(when(col("radius") === horizon, col("nf_micros")))
      .as("nf_max"))
    nf.crossJoin(broadcast(mx))
      .select(col("radius").cast("int").as("radius"), col("n_nodes"),
        col("nf_micros"),
        expr("CAST((nf_micros * 1000000) div nf_max AS BIGINT)")
          .as("share_ppm"),
        when(lit(10) * col("nf_micros") >= lit(9) * col("nf_max"), 1)
          .otherwise(0).cast("int").as("reaches_90pct"))
      .orderBy("radius")
  }

  /** PAGERANK CONVERGENCE CURVE — g03's fixed-point iteration with its
    * stopping dial exposed ([[graft.api.Graph.pageRankConvergence]]):
    * per power round, the exact L1 / max picorank deltas vs the
    * previous generation and how many nodes moved. g03 fixes 3 rounds
    * by convention; this is the table that JUSTIFIES a round budget —
    * production jobs stop on `l1_delta < ε·mass`, and the curve shows
    * where that crossing happens for this graph. All deltas are exact
    * BIGINTs of the same `div`-floored arithmetic, so the oracle
    * unrolls the rounds and reproduces every bit.
    *
    * Scale shape: identical per-round cost to g03 (one edge-rank join
    * + aggregate), plus one node-grain delta join per round; output is
    * R rows.
    */
  val g24 = OpQuery.oracled("g24_pagerank_convergence", {
    def iterSql(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
      |  SELECT ed.v AS node, sum(p.r // ed.deg) AS s
      |  FROM ed JOIN $prev p ON p.node = ed.u
      |  GROUP BY 1
      |), r$i AS (
      |  SELECT node, $prBase + (85 * s) // 100 AS r FROM c$i
      |)"""
    }
    def deltaSql(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""SELECT $i AS round,
      |       CAST(sum(abs(n.r - p.r)) AS BIGINT) AS l1_delta_pico,
      |       CAST(max(abs(n.r - p.r)) AS BIGINT) AS max_delta_pico,
      |       CAST(sum(CASE WHEN n.r <> p.r THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_changed
      |FROM r$i n JOIN $prev p ON p.node = n.node"""
    }
    s"""WITH pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |), e AS (
      |  SELECT DISTINCT pa, pb FROM pairs WHERE $edgeKeep
      |), e2 AS (
      |  SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e
      |), deg AS (
      |  SELECT u, count(*) AS deg FROM e2 GROUP BY 1
      |), ed AS (
      |  SELECT e2.u, e2.v, deg.deg FROM e2 JOIN deg ON deg.u = e2.u
      |), r0 AS (
      |  SELECT u AS node, CAST($prOne AS BIGINT) AS r FROM deg
      |), ${iterSql(1)}, ${iterSql(2)}, ${iterSql(3)}
      |SELECT * FROM (
      |  ${deltaSql(1)}
      |  UNION ALL
      |  ${deltaSql(2)}
      |  UNION ALL
      |  ${deltaSql(3)}
      |) ORDER BY round""".stripMargin
  },
    doc = "PageRank convergence curve: per power round, exact L1/max picorank deltas vs the previous generation + moved-node count — the stopping-rule dial behind g03's fixed round budget") { (spark, dir) =>
    graft.api.Graph.pageRankConvergence(edges(spark, dir), iterations = 3)
  }

  val all: Seq[OpQuery] = Seq(g01, g02, g03, g04, g05, g06, g07, g09,
    g10, g11, g12, g15, g16, g17, g19, g20, g23, g24).map(_.copy(prepare = (s, d) => { ensureEdges(s, d); () })) ++
    Seq(g08.copy(prepare = (s, d) => { ensureLinkCandidates(s, d); () })) ++
    Seq(g13, g18, r62).map(_.copy(prepare = (s, d) => { ensureWeightedEdges(s, d); () })) ++
    Seq(g14.copy(prepare = (s, d) => { ensureCfIncidence(s, d); () }),
      g25.copy(prepare = (s, d) => { ensureCfTruth(s, d); () }),
      g21.copy(prepare = (s, d) => { ensureBipartiteEdges(s, d); () }),
      g22.copy(prepare = (s, d) => { ensureSequenceEdges(s, d); () }))
}
