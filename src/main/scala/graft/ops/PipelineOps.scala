package graft.ops

import org.apache.spark.sql.functions._

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
    // stage 4: per-source token budget (t26's prefix-sum rule)
    val w = Window.partitionBy("source").orderBy("doc_id")
    survivors
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") <= 1000)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"))
      .orderBy("source")
  }

  val all: Seq[OpQuery] = Seq(p01)
}
