package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Text analysis for a training-data pipeline over `documents`:
  * tokenization stats, quality scoring, language ID, fingerprinting.
  * All pure column expressions (higher-order functions, no UDFs) — at
  * 100 TB this is one codegen'd map stage per operator.
  */
object TextOps {

  /** Whitespace tokenization + per-doc token statistics. */
  val t01 = OpQuery.oracled("t01_token_stats",
    """SELECT doc_id,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
      |       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS total_token_chars,
      |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |         / len(string_split(text, ' ')) AS type_token_ratio
      |FROM read_parquet('{SFDIR}/documents.parquet')
      |ORDER BY doc_id""".stripMargin,
    doc = "token counting (north-star text analysis); HOF sum of token lengths") { (spark, dir) =>
    Sources.table(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        expr("CAST(aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x) AS BIGINT)")
          .as("total_token_chars"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("type_token_ratio"))
      .orderBy("doc_id")
  }

  private[ops] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private[ops] val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Upper doc-id bound of every probe batch (t36/t37 retrieval, p07's
    * planted probes, d06's dedup screen): probes are drawn from
    * `doc_id % k == 0` RESTRICTED to ids below this bound, so the
    * probe batch has a FIXED size at every scale — the deployment
    * workload shape (a bounded query/ingest batch against a growing
    * corpus). Without the bound the probe set is a corpus fraction and
    * the scored-pair count grows quadratically with data by workload
    * construction rather than operator design — which is exactly what
    * the bench's cross-SF ratio then reports, at every rung whose
    * probe count still grows (the first bound of 5000 cleaned the
    * sf0.1→sf1 rung but left sf0.01→sf0.1 probe growth, and p07's
    * ratio there scattered across the flag line on its sub-second
    * denominator). 500 = the correctness fixture's whole doc-id space,
    * so the driver-gate results at sf0.01 (and sf0.001) are provably
    * unchanged by the bound, and every larger rung runs the IDENTICAL
    * probe batch the oracle certifies.
    */
  private[graft] val probeIdBound = 500L

  /** Heuristic quality score: stopword ratio + length saturation —
    * the shape of C4/RefinedWeb-style quality filters.
    */
  val t02 = OpQuery.oracled("t02_quality_score",
    s"""WITH f AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |         len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS n_stop,
      |         CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS tok_chars
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT doc_id, n_tokens,
      |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
      |       CAST(tok_chars AS DOUBLE) / n_tokens AS mean_token_len,
      |       (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5
      |         + (CAST(least(n_tokens, 200) AS DOUBLE) / 200.0) * 0.5 AS quality_score
      |FROM f
      |ORDER BY doc_id""".stripMargin,
    doc = "quality scoring (length/stopword ratios) for corpus filtering") { (spark, dir) =>
    Sources.table(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> t IN ($stopList)))"))
      .withColumn("tok_chars",
        expr("CAST(aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x) AS BIGINT)"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("tok_chars").cast("double") / col("n_tokens")).as("mean_token_len"),
        ((col("n_stop").cast("double") / col("n_tokens")) * 0.5
          + (least(col("n_tokens"), lit(200)).cast("double") / 200.0) * 0.5)
          .as("quality_score"))
      .orderBy("doc_id")
  }

  // Tiny per-language lexicons for the n-gram/stopword language-ID
  // heuristic. Integer hit counts decide (no float compare), ties break
  // en > de > es > fr.
  private val lex = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  val t03 = OpQuery.oracled("t03_language_id", {
    val hitCols = lex.map { case (l, ws) =>
      val in = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($in))) AS h_$l"
    }.mkString(",\n      |         ")
    s"""WITH hits AS (
      |  SELECT doc_id, lang,
      |         $hitCols
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT lang,
      |       CASE WHEN h_en >= greatest(h_de, h_es, h_fr) THEN 'en'
      |            WHEN h_de >= greatest(h_es, h_fr) THEN 'de'
      |            WHEN h_es >= h_fr THEN 'es'
      |            ELSE 'fr' END AS predicted,
      |       count(*) AS cnt
      |FROM hits
      |GROUP BY 1, 2
      |ORDER BY lang, predicted""".stripMargin
  },
    doc = "language-ID heuristic (stopword lexicon hits; integer argmax)") { (spark, dir) =>
    val withHits = lex.foldLeft(
      Sources.table(spark, dir, "documents")
        .withColumn("toks", split(col("text"), " "))) { case (df, (l, ws)) =>
      val in = ws.map(w => s"'$w'").mkString(", ")
      df.withColumn(s"h_$l", expr(s"size(filter(toks, t -> t IN ($in)))"))
    }
    withHits
      .withColumn("predicted",
        when(col("h_en") >= greatest(col("h_de"), col("h_es"), col("h_fr")), "en")
          .when(col("h_de") >= greatest(col("h_es"), col("h_fr")), "de")
          .when(col("h_es") >= col("h_fr"), "es")
          .otherwise("fr"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "predicted")
  }

  /** Document fingerprint: min/max hash over sliding character 8-grams
    * (winnowing-style). The lateral position explode is a generator —
    * at scale this is shuffle-free (explode + partial min/max re-group
    * on the same doc key).
    */
  val t04 = OpQuery.oracled("t04_char_ngram_fingerprint",
    """SELECT doc_id,
      |       min(md5(substr(text, i, 8))) AS fp_min,
      |       max(md5(substr(text, i, 8))) AS fp_max,
      |       count(*) AS n_windows
      |FROM read_parquet('{SFDIR}/documents.parquet'), unnest(generate_series(1, greatest(length(text) - 7, 1))) AS u(i)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin,
    doc = "rolling-window document fingerprint (min-hash of char 8-grams)") { (spark, dir) =>
    // zero-shuffle codegen'd expression; the relational
    // explode-per-position twin lives in ExprSpec as its executable spec
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.expr.RollingFingerprint.rolling_fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), col("fp.fp_min").as("fp_min"),
        col("fp.fp_max").as("fp_max"), col("fp.n_windows").as("n_windows"))
      .orderBy("doc_id")
  }

  /** BPE-ish regex token counting: words, digit runs, and single
    * non-space symbols as separate tokens (the GPT-2-style pre-tokenizer
    * shape), plus a chars-per-token ratio — the cheap proxy for "how
    * many BPE tokens will this doc cost".
    */
  val t05 = OpQuery.oracled("t05_regex_token_count",
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      |       CAST(length(text) AS DOUBLE)
      |         / greatest(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')), 1) AS chars_per_token
      |FROM read_parquet('{SFDIR}/documents.parquet')
      |ORDER BY doc_id""".stripMargin,
    doc = "BPE-ish regex tokenizer counting (training-cost proxy)") { (spark, dir) =>
    Sources.table(spark, dir, "documents")
      .withColumn("bpe", expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
      .select(
        col("doc_id"),
        size(col("bpe")).as("n_bpe_tokens"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        (length(col("text")).cast("double") /
          greatest(size(col("bpe")), lit(1))).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified train/test split: assignment is a pure
    * hash of doc_id ([[graft.api.Sampling]]), so membership is
    * reproducible across runs, engines, and partial re-processing —
    * `rand()`-based splits are none of those. Verified per language
    * stratum so a skewed split would show up as a per-lang imbalance.
    */
  val t06 = OpQuery.oracled("t06_train_test_split",
    """WITH s AS (
      |  SELECT lang, n_chars,
      |         CASE WHEN (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |                 + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 205
      |              THEN 'train' ELSE 'test' END AS split
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT lang, split, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
      |FROM s GROUP BY 1, 2
      |ORDER BY lang, split""".stripMargin,
    doc = "deterministic hash-bucketed train/test split, verified per language stratum") { (spark, dir) =>
    graft.api.Sampling.withTrainTestSplit(
      Sources.table(spark, dir, "documents"), "doc_id", trainFraction = 0.8)
      .groupBy("lang", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "split")
  }

  /** Salient terms per document: tf x (N/df) — the linear-idf variant
    * of tf-idf, chosen because it needs no transcendental function
    * (ln differs in the last ulp across libm implementations, which
    * would break cross-engine hash parity; the RANKING is what the
    * operator is for). Shapes: one shuffle for tf (doc_id, term), one
    * for df (term), corpus count broadcast as a 1-row frame — no
    * driver collect.
    */
  val t07 = OpQuery.oracled("t07_salient_terms",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM read_parquet('{SFDIR}/documents.parquet')
      |), tf AS (
      |  SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2
      |), df AS (
      |  SELECT t, count(*) AS df FROM (SELECT DISTINCT doc_id, t FROM tok) GROUP BY 1
      |), nd AS (
      |  SELECT count(*) AS n FROM read_parquet('{SFDIR}/documents.parquet')
      |), scored AS (
      |  SELECT tf.doc_id, tf.t AS term,
      |         CAST(tf.tf AS DOUBLE) * (SELECT n FROM nd) / df.df AS score,
      |         CAST(row_number() OVER (
      |           PARTITION BY tf.doc_id
      |           ORDER BY CAST(tf.tf AS DOUBLE) * (SELECT n FROM nd) / df.df DESC, tf.t ASC)
      |         AS INT) AS rank
      |  FROM tf JOIN df ON df.t = tf.t
      |)
      |SELECT doc_id, rank, term, score
      |FROM scored WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin,
    doc = "salient terms per doc (tf x N/df, top-3) — keyword extraction for corpus curation") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Sources.table(spark, dir, "documents")
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tok.select("doc_id", "t").distinct()
      .groupBy("t").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("t").asc)
    tf.join(dfreq, "t")
      .crossJoin(broadcast(nd))
      .withColumn("score", col("tf").cast("double") * col("n") / col("df"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("t").as("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Train/test contamination check: a test document is contaminated
    * when any of its word 5-grams also appears in ANY train document —
    * the standard n-gram-overlap decontamination test run before
    * training on a scraped corpus (test-set leakage inflates evals).
    *
    * Scale shape: shingling is the codegen'd [[graft.expr.WordShingles]]
    * expression (one map stage, no per-position explode of the text);
    * both sides are reduced to DISTINCT shingle keys BEFORE the join,
    * so even a shingle occurring in millions of train docs is ONE row
    * on the build side — the join key distribution is uniform by
    * construction and no frequency cap is needed. The train set
    * collapses to its distinct-shingle set (the only thing the
    * semantics need), the test side stays (doc, shingle).
    */
  val t08 = OpQuery.oracled("t08_contamination_check",
    """WITH s AS (
      |  SELECT doc_id, text,
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
      |), tr AS (
      |  SELECT DISTINCT g FROM sh WHERE split = 'train'
      |), te AS (
      |  SELECT DISTINCT doc_id, g FROM sh WHERE split = 'test'
      |), shared AS (
      |  SELECT te.doc_id, count(*) AS n_shared
      |  FROM te JOIN tr USING (g) GROUP BY 1
      |)
      |SELECT s.doc_id,
      |       CAST(coalesce(shared.n_shared, 0) AS BIGINT) AS n_shared_shingles,
      |       CAST(CASE WHEN coalesce(shared.n_shared, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
      |FROM s LEFT JOIN shared USING (doc_id)
      |WHERE s.split = 'test'
      |ORDER BY doc_id""".stripMargin,
    doc = "train/test n-gram contamination check (5-gram overlap, distinct-key join)") { (spark, dir) =>
    val docs = graft.api.Sampling.withTrainTestSplit(
      Sources.table(spark, dir, "documents"), "doc_id", trainFraction = 0.8)
    val sh = docs
      .select(col("doc_id"), col("split"),
        explode(graft.expr.WordShingles.word_shingles(col("text"), 5)).as("g"))
    val tr = sh.filter(col("split") === "train").select("g").distinct()
    val te = sh.filter(col("split") === "test").select("doc_id", "g").distinct()
    val shared = te.join(tr, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.filter(col("split") === "test").select("doc_id")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_shingles"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, 1).otherwise(0)
          .cast("int").as("contaminated"))
      .orderBy("doc_id")
  }

  // Redaction patterns: chosen to be identical under Java regex (Spark)
  // and RE2 (DuckDB) — ASCII classes, \b word boundaries, no lookaround.
  // The email pattern matches nothing in the synthetic corpus (the
  // zero-match path is still verified end-to-end); the term pattern
  // stands in for a deny-list scrub and matches heavily.
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val termPat = "\\b(key|hash|value)[a-z]*"

  /** PII-style regex redaction profile: per-document match counts for
    * each pattern plus the post-redaction length. At 100 TB this is a
    * pure map stage (regexp_count / regexp_replace are codegen'd); the
    * patterns are the knob, the plumbing is the operator.
    */
  val t09 = OpQuery.oracled("t09_regex_redaction",
    s"""SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '$emailPat')) AS INT) AS n_email,
      |       CAST(len(regexp_extract_all(text, '$termPat')) AS INT) AS n_term,
      |       CAST(length(regexp_replace(text, '$termPat', '<T>', 'g')) AS INT) AS redacted_len
      |FROM read_parquet('{SFDIR}/documents.parquet')
      |ORDER BY doc_id""".stripMargin,
    doc = "regex redaction stats (PII scrub shape): match counts + redacted length, one map stage") { (spark, dir) =>
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(emailPat)).cast("int").as("n_email"),
        regexp_count(col("text"), lit(termPat)).cast("int").as("n_term"),
        length(regexp_replace(col("text"), termPat, "<T>")).cast("int")
          .as("redacted_len"))
      .orderBy("doc_id")
  }

  /** Vocabulary coverage: the top-100 token types by corpus frequency
    * and the cumulative fraction of all tokens they cover — the Zipf
    * curve a tokenizer/vocab decision is based on.
    *
    * Scale shape: explode + groupBy(token) with map-side partial
    * aggregation (token frequencies collapse per partition before the
    * shuffle — Zipf skew is absorbed there, not at the reducer); top-100
    * via TakeOrdered; ONLY the 100 survivors hit the single-partition
    * cumulative window.
    */
  val t10 = OpQuery.oracled("t10_vocab_coverage",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM read_parquet('{SFDIR}/documents.parquet')
      |), freq AS (
      |  SELECT t, count(*) AS cnt FROM tok GROUP BY 1
      |), total AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM freq
      |), top AS (
      |  SELECT t, cnt FROM freq ORDER BY cnt DESC, t ASC LIMIT 100
      |)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, t ASC) AS INT) AS rank,
      |       t AS token, cnt,
      |       CAST(sum(cnt) OVER (ORDER BY cnt DESC, t ASC) AS DOUBLE)
      |         / (SELECT n FROM total) AS cum_frac
      |FROM top
      |ORDER BY rank""".stripMargin,
    doc = "vocabulary coverage: top-100 token types + cumulative corpus fraction (Zipf curve)") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tok = Sources.table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
    // total tokens = sum over the (small) type-frequency frame — NOT a
    // second explode of the corpus
    val total = freq.agg(sum("cnt").cast("bigint").as("n"))
    val top = freq.orderBy(col("cnt").desc, col("t").asc).limit(100)
    // single-partition window is fine: exactly 100 rows reach it
    val w = Window.orderBy(col("cnt").desc, col("t").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("cum_frac",
        sum(col("cnt")).over(w).cast("double") / col("n"))
      .select("rank", "t", "cnt", "cum_frac")
      .withColumnRenamed("t", "token")
      .orderBy("rank")
  }

  // Per-language sampling rates for the stratified sample: the shape of
  // a language-rebalancing pass over a multilingual crawl (downsample
  // the dominant language, keep the rare ones).
  private[ops] val strataRates: Seq[(String, Double)] =
    Seq("en" -> 0.10, "de" -> 0.50, "es" -> 0.05, "fr" -> 1.00, "zh" -> 0.25)

  /** Deterministic stratified sample: per-language keep rates applied
    * through the same md5 hash bucket as the train/test split — pure
    * map-side filter, reproducible across engines and reruns, no rand().
    */
  val t11 = OpQuery.oracled("t11_stratified_sample", {
    val rateCase = strataRates.map { case (l, r) =>
      s"WHEN lang = '$l' THEN ${math.round(r * 256)}"
    }.mkString(" ")
    s"""WITH b AS (
      |  SELECT lang,
      |         (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket,
      |         CASE $rateCase ELSE 0 END AS threshold
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT lang, count(*) AS n_total,
      |       CAST(sum(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM b GROUP BY 1
      |ORDER BY lang""".stripMargin
  },
    doc = "deterministic stratified (per-language) sampling via hash buckets") { (spark, dir) =>
    val threshold = strataRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(math.round(r * 256).toInt)).otherwise(acc)
    }
    Sources.table(spark, dir, "documents")
      .withColumn("bucket", graft.api.Sampling.hashBucket(col("doc_id")))
      .withColumn("threshold", threshold)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("bucket") < col("threshold"), 1).otherwise(0))
          .cast("bigint").as("n_sampled"))
      .orderBy("lang")
  }

  // Count-min sketch geometry: d hash rows x w buckets. w deliberately
  // tiny (8) against this corpus's ~30-type vocabulary so collisions —
  // the thing the sketch trades space for — actually happen and the
  // overcount column demonstrates the one-sided error (cms >= exact).
  private val cmsRows = 4
  private val cmsWidth = 8

  // seeded bucket: two md5 nibbles of "<row>:<token>" mod w — the same
  // instr/substr construction as Sampling.hashBucket, so any ANSI-ish
  // engine lands every (row, token) in the identical cell
  private def duckCmsBucket(i: String, t: String): String =
    s"""((instr('0123456789abcdef', substr(md5($i || ':' || $t), 1, 1)) - 1) * 16
       | + (instr('0123456789abcdef', substr(md5($i || ':' || $t), 2, 1)) - 1)) % $cmsWidth""".stripMargin

  /** Count-min-sketch heavy hitters with an EXACTLY reproducible
    * sketch: md5-seeded buckets make the sketch — and therefore the
    * estimates and their overcounts — deterministic and cross-engine
    * oracled, unlike the usual rows-only fate of approximate operators
    * (r09/r16). Output: top-20 exact tokens with exact count, CMS
    * estimate (min over d=4 rows of the bucket sums), and the
    * guaranteed-non-negative overcount.
    *
    * Scale shape: the sketch is built from the ALREADY-AGGREGATED
    * type-frequency frame (types x d rows, collapsing to d x w
    * integers), not from the raw token stream — CMS cell updates are
    * associative, so summing per-type counts into cells is equivalent
    * to streaming every token, and the sketch stays d x w integers at
    * any corpus size. That constant size is the whole point: frequency
    * queries against a 100 TB corpus from a few hundred bytes of state.
    */
  val t12 = OpQuery.oracled("t12_cms_heavy_hitters",
    s"""WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM read_parquet('{SFDIR}/documents.parquet')
      |), freq AS (
      |  SELECT t, count(*) AS cnt FROM tok GROUP BY 1
      |), rows_ AS (
      |  SELECT unnest(generate_series(0, ${cmsRows - 1})) AS i
      |), cells AS (
      |  SELECT i, ${duckCmsBucket("i", "t")} AS b,
      |         CAST(sum(cnt) AS BIGINT) AS cell
      |  FROM freq, rows_ GROUP BY 1, 2
      |), top AS (
      |  SELECT t, cnt FROM freq ORDER BY cnt DESC, t LIMIT 20
      |), est AS (
      |  SELECT top.t, top.cnt, min(cells.cell) AS cms
      |  FROM top JOIN rows_ ON true
      |  JOIN cells ON cells.i = rows_.i
      |   AND cells.b = ${duckCmsBucket("rows_.i", "top.t")}
      |  GROUP BY 1, 2
      |)
      |SELECT t AS token, cnt, CAST(cms AS BIGINT) AS cms,
      |       CAST(cms - cnt AS BIGINT) AS overcount
      |FROM est
      |ORDER BY cnt DESC, token""".stripMargin,
    doc = "count-min-sketch heavy hitters with deterministic md5 buckets (oracled approximation)") { (spark, dir) =>
    def bucket(i: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) = {
      val h = md5(concat(i.cast("string"), lit(":"), t))
      def nib(pos: Int) = instr(lit("0123456789abcdef"), substring(h, pos, 1)) - 1
      (nib(1) * 16 + nib(2)) % cmsWidth
    }
    val tok = Sources.table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
    val hashRows = spark.range(cmsRows).select(col("id").cast("int").as("i"))
    val cells = freq.crossJoin(broadcast(hashRows))
      .withColumn("b", bucket(col("i"), col("t")))
      .groupBy("i", "b").agg(sum("cnt").as("cell"))
    val top = freq.orderBy(col("cnt").desc, col("t").asc).limit(20)
    top.crossJoin(broadcast(hashRows))
      .withColumn("b", bucket(col("i"), col("t")))
      .join(cells, Seq("i", "b"))
      .groupBy("t", "cnt").agg(min("cell").as("cms"))
      .select(col("t").as("token"), col("cnt"),
        col("cms").cast("bigint").as("cms"),
        (col("cms") - col("cnt")).cast("bigint").as("overcount"))
      .orderBy(col("cnt").desc, col("token").asc)
  }

  /** Gopher-style repetition profile: how much of a document is repeated
    * n-grams — after length filters, the most effective crawl-quality
    * rule family (boilerplate and machine-generated spam score high).
    * `top_bigram_frac` = share of all bigram occurrences taken by the
    * most frequent bigram; `dup_*_frac` = share of occurrences whose
    * gram appears more than once. Thresholding these is the filter; the
    * profile is the operator.
    *
    * Scale shape: grams explode from a position sequence (a generator —
    * no quadratic intermediate), then shuffle on (doc_id, gram) and
    * reduce to doc_id. Per-document keys, so group sizes are bounded by
    * document length — no corpus-wide hot key is possible, unlike a
    * gram-keyed global count. Two gram sizes = two such pipelines joined
    * on doc_id.
    */
  val t13 = OpQuery.oracled("t13_repetition_profile",
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM read_parquet('{SFDIR}/documents.parquet')
      |), bi AS (
      |  SELECT doc_id, concat_ws(' ', ts[i], ts[i+1]) AS g
      |  FROM tok, unnest(generate_series(1, len(ts) - 1)) AS u(i)
      |  WHERE len(ts) >= 2
      |), bc AS (
      |  SELECT doc_id, g, count(*) AS cnt FROM bi GROUP BY 1, 2
      |), bstat AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
      |         CAST(max(cnt) AS BIGINT) AS top_bigram_cnt,
      |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_bigram
      |  FROM bc GROUP BY 1
      |), tri AS (
      |  SELECT doc_id, concat_ws(' ', ts[i], ts[i+1], ts[i+2]) AS g
      |  FROM tok, unnest(generate_series(1, len(ts) - 2)) AS u(i)
      |  WHERE len(ts) >= 3
      |), tc AS (
      |  SELECT doc_id, g, count(*) AS cnt FROM tri GROUP BY 1, 2
      |), tstat AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_trigrams,
      |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_trigram
      |  FROM tc GROUP BY 1
      |)
      |SELECT b.doc_id, n_bigrams, top_bigram_cnt,
      |       CAST(top_bigram_cnt AS DOUBLE) / n_bigrams AS top_bigram_frac,
      |       CAST(dup_bigram AS DOUBLE) / n_bigrams AS dup_bigram_frac,
      |       CAST(dup_trigram AS DOUBLE) / n_trigrams AS dup_trigram_frac
      |FROM bstat b JOIN tstat t ON t.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin,
    doc = "Gopher-style n-gram repetition profile (top-bigram + duplicate-gram fractions)") { (spark, dir) =>
    // zero-shuffle codegen'd expression (WordShinglesExpr dedups — right
    // for MinHash, wrong here: repetition is exactly what dedup erases);
    // the relational explode-per-gram twin is its executable spec in
    // ExprSpec. The n_trigrams > 0 filter mirrors the oracle's inner
    // join (docs need at least one trigram to appear).
    Sources.table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.expr.RepetitionProfile.repetition_profile(col("text")).as("rp"))
      .filter(col("rp.n_trigrams") > 0)
      .select(col("doc_id"),
        col("rp.n_bigrams").as("n_bigrams"),
        col("rp.top_bigram_cnt").as("top_bigram_cnt"),
        (col("rp.top_bigram_cnt").cast("double") / col("rp.n_bigrams")).as("top_bigram_frac"),
        (col("rp.dup_bigram").cast("double") / col("rp.n_bigrams")).as("dup_bigram_frac"),
        (col("rp.dup_trigram").cast("double") / col("rp.n_trigrams")).as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  // Context-window token budget for sequence packing. Documents pack in
  // doc_id order; a doc is assigned to the bin its starting offset falls
  // in (linear packing — the deterministic, single-pass strategy; bins
  // can overflow by at most one document, they never under-fill).
  private val packBudget = 1000L

  /** Sequence packing: group documents into fixed token-budget bins
    * (context windows) per source shard — the step that turns a cleaned
    * corpus into training sequences. Emits per-bin document count,
    * token total, and fill ratio.
    *
    * Scale shape: one running-total window PER SOURCE SHARD (never a
    * global sort) — at 100 TB the partition key becomes (source, file
    * split) so every window partition stays executor-sized; packing is
    * embarrassingly parallel across shards by construction, and the
    * final per-bin aggregate shares the window's partitioning prefix.
    */
  val t14 = OpQuery.oracled("t14_sequence_packing",
    s"""WITH d AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), c AS (
      |  SELECT source, doc_id, n_tok,
      |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d
      |), b AS (
      |  SELECT source, CAST(floor((cum - n_tok) / $packBudget.0) AS INT) AS bin, n_tok
      |  FROM c
      |)
      |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
      |       CAST(sum(n_tok) AS DOUBLE) / $packBudget.0 AS fill_ratio
      |FROM b GROUP BY 1, 2
      |ORDER BY source, bin""".stripMargin,
    doc = "sequence packing: per-shard token-budget bins (context-window assembly)") { (spark, dir) =>
    graft.api.Corpus.packBins(
        Sources.table(spark, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("bigint").as("n_tok")),
        group = "source", order = "doc_id", nTokens = "n_tok",
        budget = packBudget)
      .groupBy("source", "bin")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tok").cast("bigint").as("bin_tokens"),
        (sum("n_tok").cast("double") / packBudget.toDouble).as("fill_ratio"))
      .orderBy("source", "bin")
  }

  /** Domain-mixture rebalance: deterministic per-source downsampling
    * toward target mixture weights — the "30% web, 20% code, ..." knob
    * of a training-data recipe. Target weight 3 for even-numbered
    * sources, 1 for odd (standing in for a weights table); the keep
    * rate for source s is min(1, N_total * w_s / (W_total * n_s)),
    * applied through the same md5 hash bucket as the train/test split,
    * so the sample is reproducible across engines and reruns.
    *
    * Scale shape: phase 1 aggregates per-source counts (|sources| rows);
    * phase 2 broadcasts the thresholds back and filters map-side — the
    * corpus is never shuffled, only scanned twice (or once, if phase 1
    * reads a catalog statistic instead).
    */
  val t15 = OpQuery.oracled("t15_mixture_rebalance",
    """WITH pc AS (
      |  SELECT source, count(*) AS n_src FROM read_parquet('{SFDIR}/documents.parquet') GROUP BY 1
      |), w AS (
      |  SELECT source, n_src,
      |         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 3.0 ELSE 1.0 END AS wt
      |  FROM pc
      |), tot AS (
      |  SELECT CAST(sum(n_src) AS DOUBLE) AS n_total, sum(wt) AS w_total FROM w
      |), th AS (
      |  SELECT source,
      |         CAST(least(256.0, floor(256.0 * (SELECT n_total FROM tot) * wt
      |              / ((SELECT w_total FROM tot) * n_src))) AS INT) AS threshold
      |  FROM w
      |), j AS (
      |  SELECT d.source, th.threshold,
      |         (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM read_parquet('{SFDIR}/documents.parquet') d JOIN th ON th.source = d.source
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(max(threshold) AS INT) AS threshold,
      |       CAST(sum(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM j GROUP BY 1
      |ORDER BY source""".stripMargin,
    doc = "domain-mixture rebalance: data-derived per-source keep rates via hash buckets") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
    val pc = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
      .withColumn("wt",
        when(expr("CAST(substring(source, 4) AS INT) % 2 = 0"), lit(3.0))
          .otherwise(lit(1.0)))
    val tot = pc.agg(sum(col("n_src")).cast("double").as("n_total"),
      sum("wt").as("w_total"))
    val th = pc.crossJoin(broadcast(tot))
      .select(col("source"),
        least(lit(256.0), floor(lit(256.0) * col("n_total") * col("wt")
          / (col("w_total") * col("n_src")))).cast("int").as("threshold"))
    docs.select(col("source"),
        graft.api.Sampling.hashBucket(col("doc_id")).as("bucket"))
      .join(broadcast(th), "source")
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        max("threshold").cast("int").as("threshold"),
        sum(when(col("bucket") < col("threshold"), 1).otherwise(0))
          .cast("bigint").as("n_sampled"))
      .orderBy("source")
  }

  /** Novelty / boilerplate share: the fraction of a document's distinct
    * 3-shingles found in NO other document. Boilerplate and template
    * text scores near 0 (its shingles recur corpus-wide), original
    * prose near 1 — the inverse signal of the repetition profile, and a
    * standard crawl-curation feature next to d04's near-dup machinery.
    *
    * Scale shape: shingling is the codegen'd (deduping) WordShingles
    * expression; document frequency aggregates one row per distinct
    * (doc, shingle) with map-side partials; the df join's build side is
    * one row per shingle TYPE, so a viral boilerplate shingle is one
    * build row, not a hot key (the same distinct-key discipline as
    * t08).
    */
  val t16 = OpQuery.oracled("t16_novelty_share",
    s"""WITH shs AS (
      |  SELECT doc_id, unnest(shingles) AS g FROM (${DedupOps.duckShingles})
      |), df AS (
      |  SELECT g, count(*) AS df FROM shs GROUP BY 1
      |), per AS (
      |  SELECT shs.doc_id, count(*) AS n_shingles,
      |         CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
      |  FROM shs JOIN df ON df.g = shs.g GROUP BY 1
      |)
      |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles, n_unique,
      |       CAST(n_unique AS DOUBLE) / n_shingles AS novelty
      |FROM per
      |ORDER BY doc_id""".stripMargin,
    doc = "novelty share: fraction of a doc's distinct shingles unique to it (boilerplate inverse)") { (spark, dir) =>
    val sh = Sources.table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.expr.WordShingles.word_shingles(col("text"), 3)).as("g"))
    val dfreq = sh.groupBy("g").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_shingles"),
        sum(when(col("df") === 1, 1).otherwise(0)).cast("bigint").as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        (col("n_unique").cast("double") / col("n_shingles")).as("novelty"))
      .orderBy("doc_id")
  }

  /** Sliding-window chunking with overlap: cut each document into
    * 50-token windows advancing by 25 (RAG / context-window chunking,
    * the complement of t14's packing — packing concatenates SHORT docs
    * up to a budget, chunking splits LONG docs down to one). The last
    * window is clipped to the document end; a window whose content is
    * fully covered by its predecessor is not emitted (standard HF
    * chunker rule), which the chunk-count formula
    * `1 + ceil((n - W) / S)` encodes exactly.
    *
    * Scale shape: a single map stage — tokenize, explode the chunk
    * index sequence (fan-out W/S ≈ 2×), slice, hash; all codegen'd
    * builtins, no shuffle anywhere (the ORDER BY is presentation
    * only). Chunk rows inherit the scan's partitioning, so a
    * downstream embed/index stage starts co-located with the source
    * document bytes.
    */
  val t17 = OpQuery.oracled("t17_overlap_chunking",
    """WITH d AS (
      |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
      |         1 + CASE WHEN len(t) > 50 THEN (len(t) - 50 + 24)//25 ELSE 0 END AS nch
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t
      |        FROM read_parquet('{SFDIR}/documents.parquet'))
      |), c AS (
      |  SELECT doc_id, n,
      |         unnest(generate_series(0, nch - 1)) AS chunk_idx,
      |         unnest(list_transform(generate_series(0, nch - 1),
      |                i -> array_to_string(list_slice(t, i*25 + 1, least(i*25 + 50, n)), ' '))) AS chunk
      |  FROM d
      |)
      |SELECT doc_id, chunk_idx,
      |       CAST(least(50, n - chunk_idx*25) AS BIGINT) AS n_tokens,
      |       md5(chunk) AS chunk_md5
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin,
    doc = "sliding-window chunking: 50-token windows, stride 25, clipped tail (RAG chunker)") { (spark, dir) =>
    graft.api.Corpus.chunk(
        Sources.table(spark, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks")),
        id = "doc_id", tokens = "toks", window = 50, stride = 25)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Cross-source duplicate overlap matrix: for every pair of corpus
    * sources, how many distinct 10-token SPANS they share — the
    * source-provenance audit run before mixing crawls (which sources
    * re-crawl each other; where dedup will bite hardest). Span-level
    * (d10's fixed windows) rather than whole-text because real crawl
    * overlap is partial. Distinct (span-hash, source) FIRST, then the
    * self-join on the hash: a span repeated k times inside one source
    * costs one row, and the pair fan-out per hash is bounded by the
    * number of SOURCES (~dozens), never by the duplicate count — that
    * bound is what makes the self-join safe on a 100 TB corpus with
    * million-copy boilerplate spans.
    */
  val t18 = OpQuery.oracled("t18_source_overlap",
    """WITH s AS (
      |  SELECT source,
      |         unnest(list_transform(generate_series(1, nsp),
      |                i -> array_to_string(list_slice(t, (i-1)*10+1, i*10), ' '))) AS span
      |  FROM (SELECT source, t, len(t)//10 AS nsp
      |        FROM (SELECT source, string_split(text, ' ') AS t
      |              FROM read_parquet('{SFDIR}/documents.parquet')))
      |  WHERE nsp >= 1
      |), h AS (
      |  SELECT DISTINCT md5(span) AS h, source FROM s
      |)
      |SELECT a.source AS source_a, b.source AS source_b,
      |       count(*) AS n_shared
      |FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2
      |ORDER BY source_a, source_b""".stripMargin,
    doc = "cross-source span-overlap matrix (provenance audit; per-hash fan-out bounded by source count)") { (spark, dir) =>
    val spanTokens = 10
    val toks = split(col("text"), " ")
    val h = Sources.table(spark, dir, "documents")
      .select(col("source"), toks.as("_t"),
        floor(size(toks) / spanTokens).cast("long").as("_nsp"))
      .filter(col("_nsp") >= 1)
      .select(col("source"), col("_t"),
        explode(sequence(lit(1L), col("_nsp"))).as("pos"))
      .select(col("source"),
        md5(concat_ws(" ", slice(col("_t"),
          ((col("pos") - 1) * spanTokens + 1).cast("int"),
          lit(spanTokens)))).as("h"))
      .distinct()
    val a = h.select(col("h"), col("source").as("source_a"))
    val b = h.select(col("h").as("h2"), col("source").as("source_b"))
    a.join(b, col("h") === col("h2") && col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("source_a", "source_b")
  }

  /** Bloom-pruned contamination screen — t08's semantics at t08-can't
    * scale: there, BOTH gram sets enter the join; here the corpus is
    * the 100 TB side and never shuffles. The (small) eval set's 5-grams
    * build a Bloom filter; the corpus scan keeps only grams the sketch
    * might contain (~a few % at fpp=0.01), and the exact join on the
    * survivors removes the false positives — so, like r18, the sketch
    * must be invisible in the result, and the oracle is the plain
    * unpruned join. Eval membership is doc_id % 20 = 0 (deterministic,
    * dialect-shared).
    *
    * Output per eval doc: how many of its distinct grams leak from the
    * corpus, and how many corpus docs share at least one gram.
    */
  val t19 = OpQuery.oracled("t19_bloom_contamination",
    """WITH sh AS (
      |  SELECT doc_id,
      |         concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4]) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
      |        FROM read_parquet('{SFDIR}/documents.parquet')) tok,
      |       unnest(generate_series(1, len(ts) - 4)) AS u(i)
      |  WHERE len(ts) >= 5
      |), ev AS (
      |  SELECT DISTINCT doc_id, g FROM sh WHERE doc_id % 20 = 0
      |), co AS (
      |  SELECT DISTINCT doc_id, g FROM sh WHERE doc_id % 20 <> 0
      |), hit AS (
      |  SELECT ev.doc_id,
      |         count(DISTINCT ev.g) AS n_leaked_grams,
      |         count(DISTINCT co.doc_id) AS n_corpus_docs
      |  FROM ev JOIN co ON co.g = ev.g
      |  GROUP BY 1
      |)
      |SELECT e.doc_id,
      |       CAST(coalesce(h.n_leaked_grams, 0) AS BIGINT) AS n_leaked_grams,
      |       CAST(coalesce(h.n_corpus_docs, 0) AS BIGINT) AS n_corpus_docs
      |FROM (SELECT DISTINCT doc_id FROM ev) e
      |LEFT JOIN hit h USING (doc_id)
      |ORDER BY doc_id""".stripMargin,
    doc = "Bloom-pruned contamination screen: eval-gram sketch prunes the corpus scan; exact join removes false positives") { (spark, dir) =>
    val grams = Sources.table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.expr.WordShingles.word_shingles(col("text"), 5)).as("g"))
    val ev = grams.filter(col("doc_id") % 20 === 0).distinct().persist()
    // sketch over the SMALL side, sized by its actual distinct-gram
    // count (one cheap count over the persisted eval grams; a fixed
    // capacity would silently saturate — fpp -> 1 — once the eval set
    // outgrew it, degrading the prune to a no-op with no error)
    val bloom = ev.stat.bloomFilter("g", math.max(ev.count(), 1000L), 0.01)
    val bloomBc = grams.sparkSession.sparkContext.broadcast(bloom)
    grams.sparkSession.udf.register("t19_bloom_has_gram",
      (g: String) => bloomBc.value.mightContain(g))
    val co = grams.filter(col("doc_id") % 20 =!= 0)
      .filter(expr("t19_bloom_has_gram(g)")) // sketch prune AT THE SCAN
      .select(col("doc_id").as("c_id"), col("g")).distinct()
    val hit = ev.join(co, "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_leaked"),
        countDistinct(col("c_id")).as("n_docs"))
    ev.select("doc_id").distinct()
      .join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked_grams"),
        coalesce(col("n_docs"), lit(0L)).as("n_corpus_docs"))
      .orderBy("doc_id")
  }

  /** Exact proportional sample allocation (largest-remainder method):
    * distribute EXACTLY 1000 eval slots across (lang, source) cells in
    * proportion to their document counts — floor shares first, then
    * one leftover slot each to the cells with the largest remainders
    * (count tie-break, then cell id). Pure integer arithmetic, so the
    * invariant sum(alloc) == 1000 holds by construction, which is the
    * property fractional keep-rates (t15) cannot give an eval-set
    * builder. Two tiny aggregates + a rank over CELLS (hundreds of
    * rows at any corpus size) — the data-sized work is one group-by.
    */
  val t20 = OpQuery.oracled("t20_exact_allocation",
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS cnt
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT sum(cnt) AS total, 1000 - sum((1000 * cnt) // (SELECT sum(cnt) FROM cells)) AS leftover
      |  FROM cells
      |), shares AS (
      |  SELECT lang, source, cnt,
      |         (1000 * cnt) // tot.total AS base,
      |         (1000 * cnt) % tot.total AS rem,
      |         tot.leftover AS leftover
      |  FROM cells, tot
      |), ranked AS (
      |  SELECT *, row_number() OVER (ORDER BY rem DESC, cnt DESC, lang, source) AS rk
      |  FROM shares
      |)
      |SELECT lang, source, cnt,
      |       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM ranked
      |ORDER BY lang, source""".stripMargin,
    doc = "largest-remainder exact sample allocation across (lang, source) cells — sum(alloc) == K by construction") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val k = 1000L
    val cells = Sources.table(spark, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("cnt"))
    // cross-join the one-row total back (cells is small — hundreds of
    // rows — but the shape stays distributed: no collect)
    val withTot = cells.crossJoin(
      broadcast(cells.agg(sum("cnt").as("total"))))
      .withColumn("base", expr(s"($k * cnt) div total"))
      .withColumn("rem", expr(s"($k * cnt) % total"))
    val leftover = lit(k) - sum(col("base")).over(
      Window.partitionBy(lit(1)))
    val rk = row_number().over(
      Window.orderBy(col("rem").desc, col("cnt").desc, col("lang"), col("source")))
    withTot
      .withColumn("leftover", leftover)
      .withColumn("rk", rk)
      .select(col("lang"), col("source"), col("cnt"),
        (col("base") + when(col("rk") <= col("leftover"), 1).otherwise(0))
          .cast("bigint").as("alloc"))
      .orderBy("lang", "source")
  }

  /** Per-domain document cap — keep at most K documents per source,
    * preferring the longest (a standard web-corpus curation step: one
    * crawler-friendly domain must not dominate the training mix). The
    * selection runs through the custom [[graft.plans.GroupTopK]]
    * operator: a window row_number would fully sort every domain's
    * documents to discard all but K, while GroupTopK keeps a bounded
    * K-heap per domain on the map side — at 100 TB the shuffle carries
    * at most parts x K rows per domain instead of the whole corpus.
    */
  val t21 = OpQuery.oracled("t21_per_domain_cap",
    """SELECT source, doc_id, n_chars
      |FROM read_parquet('{SFDIR}/documents.parquet')
      |QUALIFY row_number() OVER (PARTITION BY source
      |                           ORDER BY n_chars DESC, doc_id) <= 10
      |ORDER BY source, doc_id""".stripMargin,
    doc = "per-domain document cap (keep 10 longest per source) via the bounded-heap GroupTopK operator") { (spark, dir) =>
    graft.api.Windows.topKPerGroup(
      Sources.table(spark, dir, "documents").select("source", "doc_id", "n_chars"),
      group = Seq("source"),
      order = Seq(("n_chars", true), ("doc_id", false)),
      k = 10)
      .orderBy("source", "doc_id")
  }

  /** Per-language quality gate: keep the top 30% of each language by
    * the t02 quality score (the CCNet shape — quality cutoffs must be
    * computed WITHIN a language; a global cutoff would silently drop
    * whole low-resource languages whose score distribution sits lower).
    * The cutoff is integer rank arithmetic (rank*10 <= 3*count), not a
    * float percentile compare, so the kept set is bit-stable across
    * engines. One window shuffle on lang — at scale, lang is a
    * bounded-cardinality partition key with skew toward head languages;
    * the window only ranks (no per-group materialization), and a skewed
    * deployment would sub-shard head languages by a hash salt and merge
    * ranks, which this formulation permits because the score is rankable
    * per shard.
    */
  val t22 = OpQuery.oracled("t22_quality_gate",
    s"""WITH f AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |         len(list_filter(string_split(text, ' '), t -> t IN ($stopList))) AS n_stop
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), q AS (
      |  SELECT doc_id, lang,
      |         (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5
      |           + (CAST(least(n_tokens, 200) AS DOUBLE) / 200.0) * 0.5 AS quality_score
      |  FROM f
      |)
      |SELECT doc_id, lang, quality_score,
      |       CAST(row_number() OVER (PARTITION BY lang
      |                               ORDER BY quality_score DESC, doc_id) AS INT) AS lang_rank
      |FROM q
      |QUALIFY lang_rank * 10 <= 3 * count(*) OVER (PARTITION BY lang)
      |ORDER BY lang, lang_rank""".stripMargin,
    doc = "per-language quality percentile gate (keep top 30% per lang); integer rank cutoff, no float compare") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val scored = Sources.table(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN ($stopList)))"))
      .select(col("doc_id"), col("lang"),
        ((col("n_stop").cast("double") / col("n_tokens")) * 0.5
          + (least(col("n_tokens"), lit(200)).cast("double") / 200.0) * 0.5)
          .as("quality_score"))
    graft.api.Corpus.qualityGate(scored, group = "lang",
        score = "quality_score", tiebreak = "doc_id",
        keepNum = 3, keepDen = 10)
      .withColumnRenamed("rank_in_group", "lang_rank")
      .select("doc_id", "lang", "quality_score", "lang_rank")
      .orderBy("lang", "lang_rank")
  }

  /** One merge-selection round of BPE vocabulary induction: adjacent
    * character-pair frequencies over every word occurrence (weighted by
    * occurrence, not distinct — that IS the BPE statistic), top-50 by
    * count with a total tie-break. Production tokenizer training
    * iterates exactly this aggregation, applying the winning merge to a
    * cached symbol-sequence frame between rounds; the per-round cost is
    * what matters at corpus scale, and its shape here is one explode
    * (bounded by text length) feeding a group-by whose key space is the
    * symbol alphabet squared — a few thousand keys, so map-side partial
    * aggregation collapses the shuffle to KBs per task regardless of
    * corpus size.
    */
  val t23 = OpQuery.oracled("t23_bpe_pair_counts",
    """WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS w
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), p AS (
      |  SELECT substr(w, CAST(i AS INT), 2) AS pair
      |  FROM w, LATERAL unnest(range(1, length(w))) AS t(i)
      |  WHERE length(w) >= 2
      |)
      |SELECT pair, count(*) AS cnt
      |FROM p GROUP BY 1
      |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,
    doc = "BPE merge-selection round: adjacent symbol-pair counts over all word occurrences; alphabet^2-bounded group-by") { (spark, dir) =>
    Sources.table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
  }

  /** Soft dedup: instead of DROPPING near-duplicates (d08's decision),
    * down-weight every member of a near-dup cluster by 1/cluster_size
    * so the family contributes one document's worth of training signal
    * in aggregate — the repetition-control alternative when recall
    * matters more than corpus size. Riding on the d04 pair generation
    * and the label-propagation clusters, the only new work is a left
    * join of the (tiny) cluster frame back to the corpus — singleton
    * docs never enter a shuffle wider than that join.
    */
  val t24 = OpQuery.oracled("t24_soft_dedup_weights", {
    s"""WITH RECURSIVE pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |${graft.ops.DedupOps.d04.oracle.get}
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
      |), sz AS (
      |  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1
      |), cl AS (
      |  SELECT doc_id, cluster_size FROM lab JOIN sz USING (cluster_id)
      |)
      |SELECT d.doc_id,
      |       CAST(coalesce(cl.cluster_size, 1) AS BIGINT) AS cluster_size,
      |       CAST(1 AS DOUBLE) / coalesce(cl.cluster_size, 1) AS weight
      |FROM read_parquet('{SFDIR}/documents.parquet') d
      |LEFT JOIN cl ON cl.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin
  },
    doc = "near-dup down-weighting (1/cluster_size): the soft alternative to dropping duplicates") { (spark, dir) =>
    val clusters = graft.api.Dedup.nearDupClusters(
      graft.ops.DedupOps.d04.fn(spark, dir))
      .select(col("doc_id"), col("cluster_size"))
    Sources.table(spark, dir, "documents").select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_size"), lit(1L)).cast("bigint").as("cluster_size"),
        (lit(1).cast("double") / coalesce(col("cluster_size"), lit(1L)))
          .as("weight"))
      .orderBy("doc_id")
  }

  /** Unigram familiarity: per document, the average corpus frequency of
    * its token occurrences plus its hapax count — the log-free stand-in
    * for unigram perplexity (boilerplate scores high, novel/noisy text
    * scores low), kept in exact integer sums so both engines agree
    * bit-for-bit (no transcendental functions cross the oracle
    * boundary). Two shuffles: the corpus count (one row per distinct
    * token — the famous "the" key carries ONE row on the build side,
    * so the join fans out only by the probe side's own occurrences)
    * and the per-doc re-aggregation on doc_id.
    */
  val t25 = OpQuery.oracled("t25_unigram_familiarity",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), cnt AS (
      |  SELECT t, count(*) AS c FROM tok GROUP BY 1
      |)
      |SELECT tok.doc_id,
      |       count(*) AS n_tokens,
      |       CAST(sum(cnt.c) AS DOUBLE) / count(*) AS avg_token_freq,
      |       CAST(sum(CASE WHEN cnt.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |FROM tok JOIN cnt USING (t)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    doc = "per-doc average token corpus frequency + hapax count (log-free unigram familiarity score)") { (spark, dir) =>
    val tok = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val cnt = tok.groupBy("t").agg(count(lit(1)).as("c"))
    tok.join(cnt, "t")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("c")).cast("double") / count(lit(1))).as("avg_token_freq"),
        sum(when(col("c") === 1, 1).otherwise(0)).cast("bigint").as("n_hapax"))
      .orderBy("doc_id")
  }

  /** Token-budgeted corpus assembly: each source gets a fixed token
    * quota and admits its documents in deterministic (doc_id) order
    * until the running token total would stay within budget — how a
    * training mix is actually drawn when the recipe says "N tokens of
    * source X", complementing t15 (doc-count keep rates), t20 (exact
    * doc allocation) and t21 (per-source doc cap). One running-sum
    * window per source; at 100 TB the per-source partitions are the
    * unit of parallelism and nothing else shuffles.
    */
  val t26 = OpQuery.oracled("t26_token_budget_mixture",
    """WITH t AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), c AS (
      |  SELECT source, doc_id, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_tokens
      |  FROM t
      |)
      |SELECT source, doc_id, n_tokens, cum_tokens
      |FROM c WHERE cum_tokens <= 1000
      |ORDER BY source, doc_id""".stripMargin,
    doc = "per-source token-budget admission (running-sum window; the 'N tokens of source X' mixture draw)") { (spark, dir) =>
    graft.api.Corpus.tokenBudget(
        Sources.table(spark, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("bigint").as("n_tokens")),
        group = "source", order = "doc_id", nTokens = "n_tokens",
        budget = 1000L)
      .orderBy("source", "doc_id")
  }

  /** Bigram continuation score — t25's unigram familiarity lifted to
    * second order: per document, how often its adjacent token pairs
    * recur across the corpus, normalized by how often their prefix
    * tokens do (a pooled corpus-backed conditional-probability
    * estimate, the log-free second-order perplexity stand-in). The
    * numerator and denominator are exact BIGINT count sums — the only
    * float op is ONE division per output row, so the score is
    * deterministic cross-engine. Bigrams come from a zero-shuffle
    * array transform (no per-doc lead window: the oracle keeps that
    * canonical form and hash parity proves the rewrite); the two count
    * joins shuffle on token keys exactly like t25.
    */
  val t27 = OpQuery.oracled("t27_bigram_continuation",
    """WITH tok AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS t,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), uni AS (
      |  SELECT t, count(*) AS c1 FROM tok GROUP BY 1
      |), big AS (
      |  SELECT doc_id, t AS w1,
      |         lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tok
      |), bc AS (
      |  SELECT w1, w2, count(*) AS c2 FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT b.doc_id,
      |       CAST(count(*) AS BIGINT) AS n_bigrams,
      |       CAST(sum(bc.c2) AS BIGINT) AS sum_bigram_freq,
      |       CAST(sum(uni.c1) AS BIGINT) AS sum_prefix_freq,
      |       CAST(sum(bc.c2) AS DOUBLE) / sum(uni.c1) AS continuation_ratio
      |FROM big b
      |JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
      |JOIN uni ON uni.t = b.w1
      |WHERE b.w2 IS NOT NULL
      |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    doc = "per-doc bigram continuation ratio (pooled corpus bigram/prefix count ratio; log-free 2nd-order perplexity stand-in)") { (spark, dir) =>
    val toks = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val big = toks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = toks
      .select(explode(col("toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c1"))
    // Skew shape: every per-occurrence statistic here is a function of
    // (doc, bigram, within-doc count), so the raw occurrence table is
    // reduced to that grain FIRST — on the uniform (doc, w1, w2) key —
    // and never shuffles on a vocabulary key. The corpus bigram counts
    // re-aggregate the reduced table (map-side partials collapse a
    // viral bigram to one row per task before the exchange), and the
    // one unavoidable vocabulary-keyed join carries the reduced rows
    // under AQE's skew-split. The unigram table is vocabulary-grain —
    // broadcast material at any corpus size (the d06 allow-list
    // argument) — so the prefix-count join is map-side.
    // persisted because the reduced table feeds two consumers (corpus
    // re-aggregation + the final join); the blocks outlive this frame's
    // laziness, so the harness sweeps them between queries
    // (Bench/Verify clearCache + getPersistentRDDs unpersist) — library
    // callers embedding this in a long-lived session own that sweep
    val docBig = big.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("n"))
      .persist()
    val bc = docBig.groupBy("w1", "w2").agg(sum("n").as("c2"))
    docBig.join(bc, Seq("w1", "w2"))
      .join(broadcast(uni), col("w1") === col("t"))
      .groupBy("doc_id")
      .agg(
        sum(col("n")).as("n_bigrams"),
        sum(col("n") * col("c2")).cast("bigint").as("sum_bigram_freq"),
        sum(col("n") * col("c1")).cast("bigint").as("sum_prefix_freq"),
        (sum(col("n") * col("c2")).cast("double")
          / sum(col("n") * col("c1"))).as("continuation_ratio"))
      .orderBy("doc_id")
  }

  /** Top-3 corpus continuations per prefix token — the n-gram language
    * model's next-token table, built with the custom
    * [[graft.plans.GroupTopK]] operator (bounded heaps, map-side
    * partials) instead of a per-prefix full sort. With a natural-text
    * vocabulary the prefix key count is millions and the window
    * formulation sorts every bigram row; GroupTopK keeps 3 per prefix
    * on the map side, so the shuffle carries at most 3 x |prefixes|
    * rows. Same bigram derivation as t27 (zero-shuffle array
    * transform vs the oracle's lead window).
    */
  val t28 = OpQuery.oracled("t28_bigram_topk_continuations",
    """WITH tok AS (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS t,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), big AS (
      |  SELECT doc_id, t AS w1,
      |         lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tok
      |), bc AS (
      |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      |  FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT w1, w2, c2 FROM bc
      |QUALIFY row_number() OVER (PARTITION BY w1 ORDER BY c2 DESC, w2) <= 3
      |ORDER BY w1, w2""".stripMargin,
    doc = "top-3 next-token continuations per prefix (bigram LM table) via the bounded-heap GroupTopK operator") { (spark, dir) =>
    val bc = Sources.table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("bigint").as("c2"))
    graft.api.Windows.topKPerGroup(bc,
        group = Seq("w1"),
        order = Seq(("c2", true), ("w2", false)),
        k = 3)
      .orderBy("w1", "w2")
  }

  /** Per-source token-distribution drift: the 5 most over-represented
    * tokens of each source relative to the whole corpus. The
    * over-representation score is the cross-multiplied share difference
    * `c_st * N - C_t * n_s` (sign of `c_st/n_s - C_t/N`) — pure BIGINT,
    * no division anywhere, so ranking ties are exact cross-engine. The
    * per-source top-5 runs through the bounded-heap GroupTopK operator.
    * At this corpus's magnitudes the products stay far inside int64;
    * a 100 TB deployment with trillion-token counts would lift the
    * score to DECIMAL(38,0) — same plan, wider type.
    */
  val t29 = OpQuery.oracled("t29_source_token_drift",
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS t
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), st AS (
      |  SELECT source, t, CAST(count(*) AS BIGINT) AS c_st FROM tok GROUP BY 1, 2
      |), s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM tok GROUP BY 1
      |), ct AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS c_t FROM tok GROUP BY 1
      |), tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n FROM tok
      |), sc AS (
      |  SELECT st.source, st.t, st.c_st,
      |         st.c_st * tot.n - ct.c_t * s.n_s AS score
      |  FROM st
      |  JOIN ct USING (t)
      |  JOIN s USING (source)
      |  CROSS JOIN tot
      |)
      |SELECT source, t, c_st, score FROM sc
      |QUALIFY row_number() OVER (PARTITION BY source ORDER BY score DESC, t) <= 5
      |ORDER BY source, t""".stripMargin,
    doc = "top-5 over-represented tokens per source (integer cross-multiplied share drift; GroupTopK per source)") { (spark, dir) =>
    val tok = Sources.table(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
    val st = tok.groupBy("source", "t").agg(count(lit(1)).as("c_st"))
    val s = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
    val ct = tok.groupBy("t").agg(count(lit(1)).as("c_t"))
    val tot = tok.agg(count(lit(1)).as("n"))
    val sc = st
      .join(ct, "t")
      .join(broadcast(s), "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("t"), col("c_st").cast("bigint").as("c_st"),
        (col("c_st") * col("n") - col("c_t") * col("n_s")).cast("bigint")
          .as("score"))
    graft.api.Windows.topKPerGroup(sc,
        group = Seq("source"),
        order = Seq(("score", true), ("t", false)),
        k = 5)
      .orderBy("source", "t")
  }

  /** UniMax allocation (Chung et al. 2023's budget-capped-uniform
    * language sampling, public): split a document budget across
    * sources as EVENLY as possible, capped by each source's supply —
    * the mixture rule multilingual corpora use so high-resource
    * sources don't drown low-resource ones (t20's largest-remainder
    * rule is proportional; this is its egalitarian dual). Exact
    * integer water-filling, closed-form via windows:
    * sort sources ascending by supply; source i is fully taken iff
    * `supply_i * (n - i + 1) <= budget - prefix_{i-1}` (the integer
    * form of "its supply sits below the remaining water level" — full
    * sources form a prefix, provable by induction); everyone else
    * gets `(budget - used) div (n - m)` with the remainder going +1
    * to the largest capped sources. sum(alloc) == budget by
    * construction, alloc <= supply always. The per-source frame is
    * |sources| rows, so the windows are trivially bounded; the only
    * corpus-scale work is the initial count.
    */
  val t30 = OpQuery.oracled("t30_unimax_allocation",
    """WITH cells AS (
      |  SELECT source, count(*) AS cnt
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |  GROUP BY 1
      |), b AS (
      |  SELECT sum(cnt) // 2 AS budget, count(*) AS n FROM cells
      |), sorted AS (
      |  SELECT source, cnt,
      |         row_number() OVER (ORDER BY cnt, source) AS i,
      |         coalesce(sum(cnt) OVER (ORDER BY cnt, source
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
      |  FROM cells
      |), flagged AS (
      |  SELECT s.source, s.cnt, s.i, b.budget, b.n,
      |         CASE WHEN s.cnt * (b.n - s.i + 1) <= b.budget - s.pre
      |              THEN 1 ELSE 0 END AS is_full
      |  FROM sorted s, b
      |), agg AS (
      |  SELECT sum(CASE WHEN is_full = 1 THEN cnt ELSE 0 END) AS used,
      |         sum(is_full) AS m
      |  FROM flagged
      |), rest AS (
      |  SELECT f.*, a.used, a.m,
      |         CASE WHEN f.n > a.m
      |              THEN (f.budget - a.used) // (f.n - a.m) ELSE 0 END AS q,
      |         CASE WHEN f.n > a.m
      |              THEN (f.budget - a.used) % (f.n - a.m) ELSE 0 END AS r,
      |         row_number() OVER (ORDER BY f.is_full ASC, f.cnt DESC, f.source)
      |           AS rk
      |  FROM flagged f, agg a
      |)
      |SELECT source, CAST(cnt AS BIGINT) AS cnt,
      |       CAST(CASE WHEN is_full = 1 THEN cnt
      |                 ELSE q + CASE WHEN rk <= r THEN 1 ELSE 0 END END
      |            AS BIGINT) AS alloc
      |FROM rest
      |ORDER BY source""".stripMargin,
    doc = "UniMax budget-capped-uniform source allocation: integer water-filling via windows; sum(alloc) == budget, alloc <= supply") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val cells = Sources.table(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("cnt"))
    val b = cells.agg(
      expr("sum(cnt) div 2").as("budget"), count(lit(1)).as("n"))
    val wAsc = Window.orderBy(col("cnt"), col("source"))
    val sorted = cells.crossJoin(broadcast(b))
      .withColumn("i", row_number().over(wAsc))
      .withColumn("pre", coalesce(
        sum(col("cnt")).over(wAsc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("is_full",
        when(col("cnt") * (col("n") - col("i") + 1) <= col("budget") - col("pre"),
          1L).otherwise(0L))
    val a = sorted.agg(
      sum(when(col("is_full") === 1, col("cnt")).otherwise(0L)).as("used"),
      sum(col("is_full")).as("m"))
    sorted.crossJoin(broadcast(a))
      .withColumn("q", when(col("n") > col("m"),
        expr("(budget - used) div (n - m)")).otherwise(0L))
      .withColumn("r", when(col("n") > col("m"),
        expr("(budget - used) % (n - m)")).otherwise(0L))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("is_full").asc, col("cnt").desc, col("source"))))
      .select(col("source"), col("cnt").cast("bigint").as("cnt"),
        when(col("is_full") === 1, col("cnt"))
          .otherwise(col("q") + when(col("rk") <= col("r"), 1L).otherwise(0L))
          .cast("bigint").as("alloc"))
      .orderBy("source")
  }

  /** Wilson lower-bound quality gate: keep documents whose 95% Wilson
    * lower confidence bound on the good-token proportion clears the
    * threshold — the statistically honest form of a ratio filter
    * (t02/t22 rank by the raw ratio, which lets a 3-token doc at 3/3
    * outrank a 100-token doc at 95/100; the Wilson bound prices in the
    * sample size). "Good" here = token length in [3, 8], a
    * deterministic integer proxy; the 0.9 threshold is set where the
    * sample-size effect bites on this corpus — a 10-token document at
    * a PERFECT 10/10 ratio still fails (its lower bound is ~0.72)
    * while long documents at 0.97 pass.
    *
    * Cross-engine determinism note: this is the repo's first oracled
    * use of sqrt — safe because IEEE 754 REQUIRES sqrt correctly
    * rounded (unlike ln/exp, which the recipe bans), so identical
    * expression trees produce identical doubles. Both sides write the
    * Wilson formula with explicit parentheses in the same association
    * order; z² is the same folded literal product.
    */
  val t31 = OpQuery.oracled("t31_wilson_quality_gate",
    """WITH f AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(string_split(text, ' '),
      |                  t -> length(t) BETWEEN 3 AND 8)) AS BIGINT) AS n_good
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), w AS (
      |  SELECT doc_id, n_tokens, n_good,
      |         (CAST(n_good AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS phat,
      |         (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) AS z2,
      |         CAST(n_tokens AS DOUBLE) AS nn
      |  FROM f
      |)
      |SELECT doc_id, n_tokens, n_good,
      |       CAST(phat AS DOUBLE) AS good_ratio,
      |       CAST(((phat + (z2 / (2.0 * nn)))
      |              - (CAST(1.96 AS DOUBLE)
      |                 * sqrt(((phat * (1.0 - phat)) + (z2 / (4.0 * nn))) / nn)))
      |            / (1.0 + (z2 / nn)) AS DOUBLE) AS wilson_lb
      |FROM w
      |WHERE ((phat + (z2 / (2.0 * nn)))
      |        - (CAST(1.96 AS DOUBLE)
      |           * sqrt(((phat * (1.0 - phat)) + (z2 / (4.0 * nn))) / nn)))
      |      / (1.0 + (z2 / nn)) >= 0.9
      |ORDER BY doc_id""".stripMargin,
    doc = "Wilson 95% lower-bound quality gate (sample-size-aware ratio filter; first oracled sqrt — IEEE-correctly-rounded in both engines)") { (spark, dir) =>
    val f = Sources.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        expr("CAST(size(filter(split(text, ' '), " +
          "t -> length(t) >= 3 AND length(t) <= 8)) AS BIGINT)").as("n_good"))
    val w = f
      .withColumn("phat",
        col("n_good").cast("double") / col("n_tokens").cast("double"))
      .withColumn("z2",
        expr("CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)"))
      .withColumn("nn", col("n_tokens").cast("double"))
    val wlb =
      ((col("phat") + (col("z2") / (lit(2.0) * col("nn")))) -
        (expr("CAST(1.96 AS DOUBLE)") *
          sqrt(((col("phat") * (lit(1.0) - col("phat"))) +
            (col("z2") / (lit(4.0) * col("nn")))) / col("nn")))) /
        (lit(1.0) + (col("z2") / col("nn")))
    w.withColumn("wilson_lb", wlb.cast("double"))
      .filter(col("wilson_lb") >= 0.9)
      .select(col("doc_id"), col("n_tokens"), col("n_good"),
        col("phat").cast("double").as("good_ratio"), col("wilson_lb"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination by span scrubbing
    * ([[graft.api.Dedup.spanScrub]]): every 10-token span of a
    * training document found anywhere in the eval slice (every 50th
    * doc plays the benchmark) is REMOVED and the document reassembled
    * — the action t08/t19 only flag. The eval span set broadcasts; the
    * kept-text md5 pins the reassembly byte-for-byte against the
    * oracle's string_agg.
    */
  val t32 = OpQuery.oracled("t32_span_scrub_decontamination",
    """WITH tr AS (
      |  SELECT doc_id, string_split(text, ' ') AS t
      |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 50 <> 0
      |), ev AS (
      |  SELECT string_split(text, ' ') AS t
      |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 50 = 0
      |), evs AS (
      |  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) // 10),
      |           i -> array_to_string(list_slice(t, (i-1)*10+1, i*10), ' '))) AS span
      |  FROM ev WHERE len(t) // 10 >= 1
      |), trs AS (
      |  SELECT doc_id,
      |         unnest(generate_series(1, len(t) // 10)) AS pos,
      |         unnest(list_transform(generate_series(1, len(t) // 10),
      |                i -> array_to_string(list_slice(t, (i-1)*10+1, i*10), ' '))) AS span
      |  FROM tr WHERE len(t) // 10 >= 1
      |), kept AS (
      |  SELECT doc_id, pos, span FROM trs
      |  WHERE span NOT IN (SELECT span FROM evs)
      |), r AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |         md5(string_agg(span, ' ' ORDER BY pos)) AS kept_md5
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT b.doc_id, CAST(len(b.t) // 10 AS BIGINT) AS n_spans,
      |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(len(b.t) // 10 - coalesce(r.n_kept, 0) AS BIGINT) AS n_scrubbed,
      |       coalesce(r.kept_md5, md5('')) AS kept_md5
      |FROM tr b LEFT JOIN r ON r.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin,
    doc = "benchmark decontamination: eval-set 10-token spans scrubbed from training docs, reassembly md5-pinned (the action t08/t19 only detect)") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
    graft.api.Dedup.spanScrub(
        train = docs.filter(col("doc_id") % 50 =!= 0),
        evalDocs = docs.filter(col("doc_id") % 50 === 0))
      .orderBy("doc_id")
  }

  /** BPE tokenizer TRAINING — the iterative loop t23 computes one round
    * of. Three greedy merge rounds: count adjacent symbol pairs over
    * every word occurrence, pick the most frequent pair (count desc,
    * pair asc tie-break), splice it into the symbol sequences, repeat.
    * This is the Sennrich BPE algorithm (learn_bpe's get_stats /
    * replace_pair) as a dataflow.
    *
    * Scale shape: word occurrences collapse to DISTINCT words with
    * occurrence weights first (the word-frequency dict every real BPE
    * trainer builds), so each round's explode runs over the distinct
    * vocabulary — bounded by vocabulary size, not corpus size — and
    * the pair count is an alphabet²-keyed aggregate whose map-side
    * partials collapse the shuffle to KBs. The winning merge is a
    * 1-row broadcast applied in a map stage. Per-round cost is
    * O(vocab), with the corpus touched exactly once up front.
    *
    * Symbol sequences ride in a '|'-delimited string ('|a|b|c|') and a
    * merge is `replace(s, '|x|y|', '|xy|')` — non-overlapping
    * left-to-right in both Spark (UTF8String.replace) and DuckDB, so
    * the greedy merge semantics (aaa + merge(a,a) -> [aa, a]) agree
    * bit-for-bit, and the pair statistic counts overlapping pairs
    * naively exactly as reference BPE's get_stats does.
    */
  val t33 = OpQuery.oracled("t33_bpe_merge_train", {
    def pairsOf(src: String, p: String) =
      s"""$p AS (
        |  SELECT syms[CAST(i AS INT)] AS lhs, syms[CAST(i AS INT)+1] AS rhs,
        |         sum(freq) AS cnt
        |  FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms,
        |               freq FROM $src),
        |       LATERAL unnest(range(1, len(syms))) AS t(i)
        |  GROUP BY 1, 2
        |)""".stripMargin
    def mergedOf(src: String, m: String, w: String) =
      s"""$w AS (
        |  SELECT CASE WHEN $m.lhs IS NULL THEN s
        |         ELSE replace(s, '|'||$m.lhs||'|'||$m.rhs||'|',
        |                      '|'||$m.lhs||$m.rhs||'|') END AS s, freq
        |  FROM $src LEFT JOIN $m ON true
        |)""".stripMargin
    s"""WITH w0 AS (
      |  SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
      |         count(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM read_parquet('{SFDIR}/documents.parquet'))
      |  GROUP BY 1
      |),
      |${pairsOf("w0", "p1")},
      |m1 AS (SELECT lhs, rhs, cnt FROM p1 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      |${mergedOf("w0", "m1", "w1")},
      |${pairsOf("w1", "p2")},
      |m2 AS (SELECT lhs, rhs, cnt FROM p2 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      |${mergedOf("w1", "m2", "w2")},
      |${pairsOf("w2", "p3")},
      |m3 AS (SELECT lhs, rhs, cnt FROM p3 ORDER BY cnt DESC, lhs, rhs LIMIT 1)
      |SELECT * FROM (
      |  SELECT 1 AS round, lhs, rhs, lhs||rhs AS merged,
      |         CAST(cnt AS BIGINT) AS cnt FROM m1
      |  UNION ALL
      |  SELECT 2, lhs, rhs, lhs||rhs, CAST(cnt AS BIGINT) FROM m2
      |  UNION ALL
      |  SELECT 3, lhs, rhs, lhs||rhs, CAST(cnt AS BIGINT) FROM m3
      |) ORDER BY round""".stripMargin
  },
    doc = "BPE tokenizer training: 3 greedy merge rounds over the weighted distinct-word vocabulary; per-round cost O(vocab), 1-row broadcast merge apply") { (spark, dir) =>
    bpeTrain(spark, dir, rounds = 3)._1.orderBy("round")
  }

  /** The shared BPE machinery behind t33 (training trace) and t34
    * (encode-side stats): builds the weighted distinct-word vocabulary
    * in '|'-delimited symbol form, runs `rounds` greedy merge rounds,
    * and returns (one row per chosen merge, the vocabulary with each
    * word's post-merge symbol sequence).
    */
  private def bpeTrain(spark: org.apache.spark.sql.SparkSession,
      dir: String, rounds: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    bpeTrainOn(bpeWords(Sources.table(spark, dir, "documents")), rounds)

  /** The weighted distinct-word vocabulary in '|'-delimited symbol
    * form — the frame every BPE trainer starts from. Factored from
    * [[bpeTrain]] so t44 can train a twin on a SHIFTED corpus.
    */
  private[graft] def bpeWords(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"),
        concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|")).as("s"),
        col("freq"))

  private[graft] def bpeTrainOn(words0: org.apache.spark.sql.DataFrame, rounds: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.DataFrame
    def pairCounts(words: DataFrame): DataFrame =
      words
        .select(col("freq"),
          expr("filter(split(s, '\\\\|'), x -> x != '')").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS lhs, element_at(syms, i + 1) AS rhs))"))
          .as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("cnt"))
    var words = words0
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val m = pairCounts(words)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
      val row = m.select(lit(r).as("round"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
      out = if (out == null) row else out.unionAll(row)
      // LEFT join on true, not a cross join: once the pair space is
      // exhausted (every word a single symbol) the winner frame is
      // EMPTY, and a cross join would silently wipe the vocabulary —
      // the merge must be a no-op instead
      words = words
        .join(broadcast(m.select(col("lhs").as("_ml"), col("rhs").as("_mr"))),
          lit(true), "left")
        .select(col("w"),
          when(col("_ml").isNull, col("s"))
            .otherwise(expr(
              "replace(s, '|' || _ml || '|' || _mr || '|', '|' || _ml || _mr || '|')"))
            .as("s"),
          col("freq"))
    }
    (out, words)
  }

  /** BPE ENCODE — the apply side of t33's training: the vocabulary's
    * post-merge symbol sequences score the whole corpus, reporting
    * per-source fertility (tokens per word) and compression
    * (chars per token) — the numbers a tokenizer bake-off compares.
    * The encoded vocabulary is tiny (distinct words), so the corpus
    * join is a broadcast; everything else is one per-source aggregate
    * of exact integer sums, with the only division in the final
    * projection (the house float-determinism rule).
    */
  val t34 = OpQuery.oracled("t34_bpe_encode", {
    def pairsOf(src: String, p: String) =
      s"""$p AS (
        |  SELECT syms[CAST(i AS INT)] AS lhs, syms[CAST(i AS INT)+1] AS rhs,
        |         sum(freq) AS cnt
        |  FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms,
        |               freq FROM $src),
        |       LATERAL unnest(range(1, len(syms))) AS t(i)
        |  GROUP BY 1, 2
        |)""".stripMargin
    def mergedOf(src: String, m: String, w: String) =
      s"""$w AS (
        |  SELECT w, CASE WHEN $m.lhs IS NULL THEN s
        |            ELSE replace(s, '|'||$m.lhs||'|'||$m.rhs||'|',
        |                         '|'||$m.lhs||$m.rhs||'|') END AS s, freq
        |  FROM $src LEFT JOIN $m ON true
        |)""".stripMargin
    s"""WITH w0 AS (
      |  SELECT w, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
      |         count(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM read_parquet('{SFDIR}/documents.parquet'))
      |  GROUP BY 1
      |),
      |${pairsOf("w0", "p1")},
      |m1 AS (SELECT lhs, rhs, cnt FROM p1 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      |${mergedOf("w0", "m1", "w1")},
      |${pairsOf("w1", "p2")},
      |m2 AS (SELECT lhs, rhs, cnt FROM p2 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      |${mergedOf("w1", "m2", "w2")},
      |${pairsOf("w2", "p3")},
      |m3 AS (SELECT lhs, rhs, cnt FROM p3 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      |${mergedOf("w2", "m3", "w3")},
      |enc AS (
      |  SELECT w, len(list_filter(string_split(s, '|'), x -> x <> '')) AS n_syms
      |  FROM w3
      |),
      |docw AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(length(w)) AS BIGINT) AS n_chars,
      |       CAST(sum(n_syms) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_syms) AS DOUBLE) / count(*) AS fertility,
      |       CAST(sum(length(w)) AS DOUBLE) / sum(n_syms) AS chars_per_token
      |FROM docw JOIN enc USING (w)
      |GROUP BY source
      |ORDER BY source""".stripMargin
  },
    doc = "BPE encode-side stats: learned merges applied to the corpus via a broadcast vocabulary join; per-source fertility + compression from exact integer sums") { (spark, dir) =>
    val enc = bpeTrain(spark, dir, rounds = 3)._2
      .select(col("w"),
        size(expr("filter(split(s, '\\\\|'), x -> x != '')")).as("n_syms"))
    Sources.table(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(enc), "w")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(col("n_syms")).as("n_tokens"),
        (sum(col("n_syms")).cast("double") / count(lit(1))).as("fertility"),
        (sum(length(col("w"))).cast("double") / sum(col("n_syms")))
          .as("chars_per_token"))
      .orderBy("source")
  }

  /** Weighted priority sampling (Duffield/Lund/Thorup): per source, the
    * 5 documents with the smallest `u / w` keys — `u` a 32-bit md5
    * uniform of the doc id, `w = n_chars` — form a deterministic
    * weighted-without-replacement sample that favors long documents
    * (the "sample by token mass, not by row count" draw a corpus audit
    * wants). The engine takes the k smallest through the bounded-heap
    * GroupTopK operator; the oracle evaluates the IDENTICAL key
    * expression but ranks with a window — so the custom operator is
    * value-checked against the canonical formulation, and the
    * hash-derived randomness itself is bit-compared across engines.
    */
  val t35 = OpQuery.oracled("t35_weighted_priority_sample", {
    val key = graft.api.Sampling.priorityKeySql("doc_id", "n_chars")
    s"""WITH keyed AS (
      |  SELECT source, doc_id, n_chars, $key AS priority
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rn
      |  FROM keyed
      |)
      |SELECT source, doc_id, n_chars, priority
      |FROM ranked WHERE rn <= 5
      |ORDER BY source, priority, doc_id""".stripMargin
  },
    doc = "weighted priority sampling per source (u/w keys, k smallest via bounded-heap GroupTopK; favors heavy docs, fully deterministic)") { (spark, dir) =>
    graft.api.Sampling.prioritySample(
      Sources.table(spark, dir, "documents")
        .select("source", "doc_id", "n_chars"),
      idCol = "doc_id", weightCol = "n_chars", strataCol = "source", k = 5)
      .select("source", "doc_id", "n_chars", "priority")
      .orderBy("source", "priority", "doc_id")
  }

  /** Sparse TF-vector cosine top-3 per probe doc via an INVERTED-INDEX
    * join — the classic sparse-text similarity scale path, and the
    * weighted complement of d06's set-Jaccard: term frequencies weight
    * the overlap, so a doc that repeats a query's salient terms ranks
    * above one that merely mentions them. Postings are df-capped (the
    * d06 fractional cap): a term in >90% of docs contributes nothing to
    * discrimination but dominates the join fan-out — dropping it is
    * what bounds every posting list, the same guard production sparse
    * retrieval (prefix filtering / impact-ordered indexes) relies on.
    * The probe batch is FIXED-SIZE ([[probeIdBound]]): at deployment a
    * retrieval system serves a bounded query batch against a growing
    * corpus, so the benchmark's probe set must not grow with the
    * corpus either — a corpus-fraction probe set makes the scored-pair
    * count quadratic in data by workload construction, not by
    * operator design (the same argument that excludes the brute-force
    * similarity baselines from the big bench rung).
    * All dot products and squared norms are exact integer sums; the
    * only float ops are two correctly-rounded sqrts, one product and
    * one division, mirrored expression-for-expression in the oracle
    * (the t31 sqrt precedent), so the cosines are bit-identical and
    * the top-3 cut (bounded-heap [[graft.api.Windows.topKPerGroup]])
    * selects the same rows on both engines.
    *
    * Scale shape: tf build = one shuffle on (doc, term); the probe⋈
    * corpus join keys on term with bounded posting lists; top-k is the
    * two-phase bounded-heap operator, never a full sort per group.
    */
  val t36 = OpQuery.oracled("t36_sparse_cosine_topk", {
    s"""WITH tf AS (
      |  SELECT doc_id, t, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM read_parquet('{SFDIR}/documents.parquet'))
      |  GROUP BY 1, 2
      |), nd AS (
      |  SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) AS cap
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), ok AS (
      |  SELECT t FROM tf GROUP BY t HAVING count(*) <= (SELECT cap FROM nd)
      |), ptf AS (
      |  SELECT tf.doc_id, tf.t, tf.tf FROM tf JOIN ok USING (t)
      |), norms AS (
      |  SELECT doc_id, sum(tf * tf) AS n2 FROM ptf GROUP BY 1
      |), dot AS (
      |  SELECT a.doc_id AS query_doc, b.doc_id AS doc_id, sum(a.tf * b.tf) AS d
      |  FROM ptf a JOIN ptf b ON a.t = b.t AND a.doc_id <> b.doc_id
      |  WHERE a.doc_id % 50 = 0 AND a.doc_id < $probeIdBound
      |  GROUP BY 1, 2
      |), cos AS (
      |  SELECT d.query_doc, d.doc_id,
      |         CAST(d.d AS DOUBLE)
      |           / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine,
      |         row_number() OVER (PARTITION BY d.query_doc
      |                            ORDER BY CAST(d.d AS DOUBLE)
      |           / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC,
      |                            d.doc_id) AS rn
      |  FROM dot d
      |  JOIN norms na ON na.doc_id = d.query_doc
      |  JOIN norms nb ON nb.doc_id = d.doc_id
      |)
      |SELECT query_doc, doc_id, cosine FROM cos WHERE rn <= 3
      |ORDER BY query_doc, cosine DESC, doc_id""".stripMargin
  },
    doc = "sparse TF cosine top-3 per probe doc: df-capped inverted-index join, integer dot/norm sums, bounded-heap GroupTopK cut") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val nd = docs.agg(count(lit(1)).as("_nd"))
    val ok = tf.groupBy("t").agg(count(lit(1)).as("_df"))
      .crossJoin(broadcast(nd))
      .filter(col("_df") <= ceil(lit(0.9) * col("_nd")).cast("long"))
      .select("t")
    val ptf = tf.join(ok, "t").select("doc_id", "t", "tf").persist()
    val norms = ptf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    val dot = ptf.as("a")
      .filter(col("a.doc_id") % 50 === 0 && col("a.doc_id") < probeIdBound)
      .join(ptf.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("query_doc"), col("b.doc_id").as("doc_id"))
      .agg(sum(col("a.tf") * col("b.tf")).as("d"))
    val cos = dot
      .join(norms.select(col("doc_id").as("query_doc"), col("n2").as("na")),
        "query_doc")
      .join(norms.select(col("doc_id"), col("n2").as("nb")), "doc_id")
      .select(col("query_doc"), col("doc_id"),
        (col("d").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
    graft.api.Windows.topKPerGroup(cos, Seq("query_doc"),
        Seq(("cosine", true), ("doc_id", false)), 3)
      .select("query_doc", "doc_id", "cosine")
      .orderBy(col("query_doc"), col("cosine").desc, col("doc_id"))
  }

  /** BM25 top-3 retrieval per probe doc over the df-capped inverted
    * index — the canonical lexical ranking function, completing t36's
    * unweighted-cosine with the tf-saturating, length-normalized scorer
    * production search actually runs. Every BM25 ingredient is kept
    * rational until exactly one float step per term:
    *
    *  - idf is the LINEAR Robertson form `(N - df + ½)/(df + ½)` scaled
    *    to integers `(2N - 2df + 1)/(2df + 1)` (ln is banned from
    *    oracled outputs — the t07/t25 precedent);
    *  - the tf part `tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))` with
    *    k1 = 6/5, b = 3/4, avgdl = T/N is cross-multiplied through by
    *    10·T into `22·T·tf / (10·T·tf + 3·T + 9·dl·N)` — exact BIGINT
    *    numerator/denominator, well inside double's 2^53 mantissa;
    *  - each term's score = one division × one division × one product,
    *    then truncation-quantized to integer MICROS (`floor(x·1e6)`,
    *    the picounit-cosine recipe) so the cross-term SUM is an exact
    *    integer aggregate — immune to Spark's partial-aggregation
    *    order, which a double sum of per-term scores would not be.
    *
    * Scale shape mirrors t36: one (doc,term) shuffle for the index,
    * df-capped posting lists bound the probe⋈corpus join fan-out, the
    * probe batch is fixed-size ([[probeIdBound]] — the deployment
    * workload shape), and the top-3 cut is the bounded-heap GroupTopK
    * — never a per-query full sort. Honest caveat shared with t36/p07
    * at the DRIVER fixtures: their ~31-token vocabulary makes every
    * term near-universal, so the probe⋈corpus join degrades toward
    * all-pairs there — a corpus limitation, not an operator one; on
    * the Zipf-vocabulary sf1 rung (GenScale) the posting lists are
    * realistic and the cross-SF ratio is ~2× at 10× data.
    */
  /** BM25 scoring core shared by t37 and RetrievalSpec's scalar
    * re-derivation: per (probe, candidate) pair, the exact-integer
    * micro-quantized BM25 score sum over shared df-capped terms.
    * Returns (query_doc, doc_id, score_micro).
    */
  private[graft] def bm25ScoresMicro(docs: org.apache.spark.sql.DataFrame,
      probe: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val corp = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tt"))
    val nd = docs.agg(ceil(lit(0.9) * count(lit(1))).cast("long").as("cap"))
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd)).filter(col("df") <= col("cap"))
      .select("t", "df")
    tf.as("q").filter(probe)
      .join(dfT, "t")
      .join(tf.as("c"), col("c.t") === col("q.t") && col("c.doc_id") =!= col("q.doc_id"))
      .join(dl.select(col("doc_id").as("c_doc"), col("dl")), col("c_doc") === col("c.doc_id"))
      .crossJoin(broadcast(corp))
      .groupBy(col("q.doc_id").as("query_doc"), col("c.doc_id").as("doc_id"))
      .agg(sum(floor(
        ((lit(2) * col("n") - lit(2) * col("df") + lit(1)).cast("double")
          / (lit(2) * col("df") + lit(1)))
          * ((lit(22) * col("tt") * col("c.tf")).cast("double")
            / (lit(10) * col("tt") * col("c.tf") + lit(3) * col("tt")
              + lit(9) * col("dl") * col("n")))
          * lit(1000000.0))).as("score_micro"))
  }

  val t37 = OpQuery.oracled("t37_bm25_topk", {
    s"""WITH tf AS (
      |  SELECT doc_id, t, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |    FROM read_parquet('{SFDIR}/documents.parquet'))
      |  GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
      |), corp AS (
      |  SELECT count(*) AS n, sum(dl) AS tt FROM dl
      |), nd AS (
      |  SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) AS cap
      |  FROM read_parquet('{SFDIR}/documents.parquet')
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
      |  WHERE q.doc_id % 50 = 0 AND q.doc_id < $probeIdBound
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT query_doc, doc_id, score_micro,
      |         row_number() OVER (PARTITION BY query_doc
      |                            ORDER BY score_micro DESC, doc_id) AS rn
      |  FROM scored
      |)
      |SELECT query_doc, doc_id, CAST(score_micro AS DOUBLE) / 1000000.0 AS bm25
      |FROM ranked WHERE rn <= 3
      |ORDER BY query_doc, bm25 DESC, doc_id""".stripMargin
  },
    doc = "BM25 top-3 per probe doc: df-capped inverted index, linear idf, integer cross-multiplied tf part, micro-quantized order-free score sum, bounded-heap top-k") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
    val scored = bm25ScoresMicro(docs,
      col("doc_id") % 50 === 0 && col("doc_id") < probeIdBound)
    graft.api.Windows.topKPerGroup(scored, Seq("query_doc"),
        Seq(("score_micro", true), ("doc_id", false)), 3)
      .select(col("query_doc"), col("doc_id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("bm25"))
      .orderBy(col("query_doc"), col("bm25").desc, col("doc_id"))
  }

  /** Cross-source BIGRAM-vocabulary Jaccard matrix — the
    * distributional-similarity companion to t18's span-level provenance
    * overlap and t29's token drift: which sources write in the same
    * phrase patterns? Unigram vocabularies are too small to
    * discriminate (this corpus has ~31 distinct tokens, every pair
    * near 1.0), so the comparison runs at bigram grain, where the
    * vocabulary is quadratic in tokens and genuinely diverges across
    * sources. Set sizes and the intersection are exact integer counts
    * (the distinct (source, bigram) frame joined to itself on the
    * bigram — source-pairs bounded by the source dimension, never by
    * data volume), union by inclusion-exclusion, ONE double division.
    */
  val t38 = OpQuery.oracled("t38_source_bigram_jaccard",
    """WITH tok AS (
      |  SELECT source,
      |         unnest(string_split(text, ' ')) AS t,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         doc_id
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), sv AS (
      |  SELECT DISTINCT source, t AS w1,
      |         lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tok
      |), v AS (
      |  SELECT DISTINCT source, w1, w2 FROM sv WHERE w2 IS NOT NULL
      |), sizes AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1
      |), inter AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(count(*) AS BIGINT) AS n_shared
      |  FROM v a JOIN v b
      |    ON a.w1 = b.w1 AND a.w2 = b.w2 AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT i.source_a, i.source_b, sa.n AS vocab_a, sb.n AS vocab_b,
      |       i.n_shared,
      |       CAST(i.n_shared AS DOUBLE) / (sa.n + sb.n - i.n_shared) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON sa.source = i.source_a
      |JOIN sizes sb ON sb.source = i.source_b
      |ORDER BY source_a, source_b""".stripMargin,
    doc = "cross-source bigram-vocabulary Jaccard matrix: exact integer set sizes + intersection join on the bigram, inclusion-exclusion union, one division") { (spark, dir) =>
    val toks = Sources.table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("toks"))
    val v = toks.filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
        .as("b"))
      .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .distinct()
      .persist()
    val sizes = v.groupBy("source").agg(count(lit(1)).cast("bigint").as("n"))
    val inter = v.as("a")
      .join(v.as("b"),
        col("a.w1") === col("b.w1") && col("a.w2") === col("b.w2")
          && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).cast("bigint").as("n_shared"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("vocab_a"))),
        "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("vocab_b"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("vocab_a"), col("vocab_b"),
        col("n_shared"),
        (col("n_shared").cast("double")
          / (col("vocab_a") + col("vocab_b") - col("n_shared"))).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Per-source boilerplate screen — the C4-style "same header on
    * every page" detector: each document's LEADING trigram is its
    * template signature; a source whose modal signature covers a large
    * share of its documents is emitting boilerplate that span-level
    * dedup (d10) will then strip. Complements t13 (repetition WITHIN a
    * doc) and t18 (span provenance ACROSS sources): this is template
    * repetition across one source's documents. Counts are exact; the
    * modal pick is a bounded per-source argmax (ties to the
    * lexicographically first signature); share is one division.
    */
  val t39 = OpQuery.oracled("t39_boilerplate_prefix_share",
    """WITH sig AS (
      |  SELECT source,
      |         array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS prefix
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), counts AS (
      |  SELECT source, prefix, count(*) AS n FROM sig GROUP BY 1, 2
      |), tot AS (
      |  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM counts GROUP BY 1
      |), modal AS (
      |  SELECT source, prefix, n FROM (
      |    SELECT source, prefix, n,
      |           row_number() OVER (PARTITION BY source
      |                              ORDER BY n DESC, prefix) AS rn
      |    FROM counts) WHERE rn = 1
      |)
      |SELECT m.source, t.n_docs, m.prefix AS modal_prefix,
      |       CAST(m.n AS BIGINT) AS n_modal,
      |       CAST(m.n AS DOUBLE) / t.n_docs AS boilerplate_share
      |FROM modal m JOIN tot t ON t.source = m.source
      |ORDER BY m.source""".stripMargin,
    doc = "per-source boilerplate screen: modal leading trigram + its document share (exact counts, bounded argmax, one division)") { (spark, dir) =>
    val sig = Sources.table(spark, dir, "documents")
      .select(col("source"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("prefix"))
    val counts = sig.groupBy("source", "prefix").agg(count(lit(1)).as("n"))
    val tot = counts.groupBy("source")
      .agg(sum(col("n")).cast("bigint").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("n").desc, col("prefix"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(broadcast(tot), "source")
      .select(col("source"), col("n_docs"), col("prefix").as("modal_prefix"),
        col("n").cast("bigint").as("n_modal"),
        (col("n").cast("double") / col("n_docs")).as("boilerplate_share"))
      .orderBy("source")
  }

  /** Per-source power-law corpus diagnostics — the two statistics a
    * curation run reports to judge whether a source looks like natural
    * language or like templated/boilerplate output: the Zipf
    * rank-frequency slope (natural text ≈ −1; templated text is much
    * flatter) and the Heaps vocabulary-growth exponent (how fast new
    * types appear as tokens accumulate; near 0 for a closed
    * vocabulary). Every output is an exact integer: the fit POINTS
    * (rank 1 vs rank `least(V,16)` for Zipf; the doc_id-parity
    * half-corpus vs the full corpus for Heaps) plus their ratios
    * quantized to ppm by integer floor division — `decay_ppm` =
    * 1e6·f_k/f_1, `growth_ppm` = 1e6·V/V_half, `stretch_ppm` =
    * 1e6·N/N_half. The exponents are one `ln` ratio away
    * (zipf ≈ ln(decay_ppm/1e6)/ln k, heaps ≈ ln(growth)/ln(stretch))
    * but `ln` itself stays OFF the oracle-compared surface: unlike
    * sqrt and division it is not IEEE-correctly-rounded, and the
    * driver's regenerated sf0.001 fixtures exposed a real 1-ulp
    * engine divergence in the previous ln-based formulation (the
    * t31 doctrine, now applied here).
    *
    * Scale shape: one shuffle on (source, token) for the counts; the
    * rank picks go through the bounded-heap [[graft.api.Windows
    * .topKPerGroup]] (top-16 per source), NOT a full per-source sort —
    * at 100 TB a source's vocabulary is millions of rows and a
    * row_number window over it would sort a skewed partition per
    * source; the heap keeps 16. The oracle ranks the full vocabulary
    * (same result by construction).
    */
  val t40 = OpQuery.oracled("t40_power_law_profile",
    """WITH tok AS (
      |  SELECT source, doc_id % 2 = 0 AS in_half,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), counts AS (
      |  SELECT source, tok, count(*) AS cnt,
      |         sum(CASE WHEN in_half THEN 1 ELSE 0 END) AS cnt_a
      |  FROM tok GROUP BY 1, 2
      |), by_src AS (
      |  SELECT source, sum(cnt) AS n_tokens, count(*) AS n_types,
      |         sum(cnt_a) AS half_tokens,
      |         sum(CASE WHEN cnt_a > 0 THEN 1 ELSE 0 END) AS half_types
      |  FROM counts GROUP BY 1
      |), ranked AS (
      |  SELECT source, tok, cnt,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY cnt DESC, tok) AS rk
      |  FROM counts
      |), top1 AS (
      |  SELECT source, cnt AS top_freq FROM ranked WHERE rk = 1
      |), kth AS (
      |  SELECT r.source, CAST(r.rk AS BIGINT) AS k, r.cnt AS k_freq
      |  FROM ranked r JOIN by_src b ON b.source = r.source
      |  WHERE r.rk = least(b.n_types, 16)
      |)
      |SELECT b.source,
      |       CAST(b.n_tokens AS BIGINT) AS n_tokens,
      |       CAST(b.n_types AS BIGINT) AS n_types,
      |       CAST(t.top_freq AS BIGINT) AS top_freq,
      |       k.k AS k,
      |       CAST(k.k_freq AS BIGINT) AS k_freq,
      |       CAST((1000000 * k.k_freq) // t.top_freq AS BIGINT) AS decay_ppm,
      |       CAST(b.half_tokens AS BIGINT) AS half_tokens,
      |       CAST(b.half_types AS BIGINT) AS half_types,
      |       CAST(CASE WHEN b.half_types > 0
      |         THEN (1000000 * b.n_types) // b.half_types
      |         ELSE 0 END AS BIGINT) AS growth_ppm,
      |       CAST(CASE WHEN b.half_tokens > 0
      |         THEN (1000000 * b.n_tokens) // b.half_tokens
      |         ELSE 0 END AS BIGINT) AS stretch_ppm
      |FROM by_src b
      |JOIN top1 t ON t.source = b.source
      |JOIN kth k ON k.source = b.source
      |ORDER BY b.source""".stripMargin,
    doc = "per-source power-law profile: exact Zipf/Heaps fit points + log-free ppm decay/growth ratios (integer floor division only; heap-bounded rank picks)") { (spark, dir) =>
    powerLawProfile(Sources.table(spark, dir, "documents"))
  }

  /** t40's kernel over any documents-shaped frame (doc_id, source,
    * text) — split out so the spec can pin the statistics on a
    * hand-counted fixture. See [[t40]] for the contract.
    */
  private[graft] def powerLawProfile(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("source"),
        (col("doc_id") % 2 === 0).cast("long").as("in_half"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok")
      .agg(count(lit(1)).as("cnt"), sum(col("in_half")).as("cnt_a"))
    val bySrc = counts.groupBy("source").agg(
      sum("cnt").as("n_tokens"), count(lit(1)).as("n_types"),
      sum("cnt_a").as("half_tokens"),
      sum(when(col("cnt_a") > 0, 1L).otherwise(0L)).as("half_types"))
    // bounded-heap top-16 per source, then rank within the <=16 rows
    val top16 = graft.api.Windows.topKPerGroup(
      counts.select("source", "tok", "cnt"),
      Seq("source"), Seq(("cnt", true), ("tok", false)), 16)
    val ranked = top16.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(col("cnt").desc, col("tok").asc)))
    val top1 = ranked.filter(col("rk") === 1)
      .select(col("source"), col("cnt").as("top_freq"))
    val kth = ranked
      .join(bySrc.select(col("source"), col("n_types").as("v")), "source")
      .filter(col("rk").cast("bigint") === least(col("v"), lit(16L)))
      .select(col("source"), col("rk").cast("bigint").as("k"),
        col("cnt").as("k_freq"))
    bySrc.join(top1, "source").join(kth, "source")
      .select(col("source"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        col("n_types").cast("bigint").as("n_types"),
        col("top_freq").cast("bigint").as("top_freq"),
        col("k"),
        col("k_freq").cast("bigint").as("k_freq"),
        expr("(1000000 * k_freq) DIV top_freq").cast("bigint")
          .as("decay_ppm"),
        col("half_tokens").cast("bigint").as("half_tokens"),
        col("half_types").cast("bigint").as("half_types"),
        when(col("half_types") > 0,
          expr("(1000000 * n_types) DIV half_types"))
          .otherwise(lit(0L)).cast("bigint").as("growth_ppm"),
        when(col("half_tokens") > 0,
          expr("(1000000 * n_tokens) DIV half_tokens"))
          .otherwise(lit(0L)).cast("bigint").as("stretch_ppm"))
      .orderBy("source")
  }

  /** Vocabulary GROWTH CURVE — the Heaps-law curve t40's single
    * exponent summarizes, materialized at four ingest-prefix rungs:
    * how many distinct token types the corpus has after each quarter
    * of the id space (doc_id is the ingest sequence), and how many
    * are NEW in that quarter. This is the tokenizer-sizing /
    * dedup-health read: a healthy corpus adds types sublinearly
    * (Heaps); a rung whose `new_tokens` jumps marks an ingest wave
    * with novel vocabulary (new language, new domain — route it past
    * the language-ID gate), one that flatlines marks near-duplicate
    * re-ingestion.
    *
    * Scale shape: first occurrence is ONE min-aggregate per token
    * type (map-side combined — never a sort), rung thresholds are
    * id-SPACE quartiles from a single min/max aggregate (no global
    * row-ranking: an order-statistic rank would need a total sort of
    * the corpus, the id-space split is a broadcast 1-row compare),
    * bucketing is a ≤4-row broadcast join, and the running total
    * runs over exactly 4 rows. Integer thresholds use floor division
    * mirrored as `div`/`//`.
    */
  val t41 = OpQuery.oracled("t41_vocab_growth_curve",
    """WITH d AS (
      |  SELECT doc_id, text FROM documents
      |), b AS (
      |  SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM d
      |), th AS (
      |  SELECT v.r, b.lo + ((b.hi - b.lo + 1) * v.r) // 4 AS t
      |  FROM b, (VALUES (1), (2), (3), (4)) v(r)
      |), tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM d
      |), ft AS (
      |  SELECT tk, min(doc_id) AS fd FROM tok WHERE tk <> '' GROUP BY 1
      |), bucket AS (
      |  SELECT f.tk, min(th.r) AS r FROM ft f JOIN th ON f.fd < th.t
      |  GROUP BY 1
      |), hist AS (
      |  SELECT r, count(*) AS new_tokens FROM bucket GROUP BY 1
      |), nd AS (
      |  SELECT th.r, count(*) AS n_docs
      |  FROM th JOIN d ON d.doc_id < th.t GROUP BY 1
      |)
      |SELECT CAST(th.r AS INT) AS rung,
      |       CAST(th.t AS BIGINT) AS id_bound,
      |       CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs,
      |       CAST(coalesce(h.new_tokens, 0) AS BIGINT) AS new_tokens,
      |       CAST(sum(coalesce(h.new_tokens, 0))
      |              OVER (ORDER BY th.r) AS BIGINT) AS vocab_size
      |FROM th
      |LEFT JOIN hist h ON h.r = th.r
      |LEFT JOIN nd ON nd.r = th.r
      |ORDER BY rung""".stripMargin,
    doc = "Heaps vocabulary growth curve at four ingest-prefix rungs: " +
      "first-occurrence min-agg per token type, id-space quartile " +
      "thresholds (exact integer counts)") { (spark, dir) =>
    vocabGrowthCurve(Sources.table(spark, dir, "documents"))
  }

  /** t41's kernel over any (doc_id, text) frame — split out so the
    * spec can pin the curve on a hand-counted fixture. See [[t41]]
    * for the contract.
    */
  private[graft] def vocabGrowthCurve(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val d = docs.select(col("doc_id"), col("text"))
    val b = d.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    val th = spark.range(1, 5).select(col("id").cast("int").as("r"))
      .crossJoin(broadcast(b))
      .select(col("r"),
        (col("lo") + expr("((hi - lo + 1) * r) div 4")).as("t"))
    val ft = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      .filter(col("tk") =!= "")
      .groupBy("tk").agg(min("doc_id").as("fd"))
    val bucket = ft.join(broadcast(th), col("fd") < col("t"))
      .groupBy("tk").agg(min("r").as("r"))
    val hist = bucket.groupBy("r").agg(count(lit(1)).as("new_tokens"))
    val nd = d.crossJoin(broadcast(th)).filter(col("doc_id") < col("t"))
      .groupBy("r").agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("rung")
    th.join(hist, Seq("r"), "left").join(nd, Seq("r"), "left")
      .select(col("r").as("rung"),
        col("t").cast("bigint").as("id_bound"),
        coalesce(col("n_docs"), lit(0L)).cast("bigint").as("n_docs"),
        coalesce(col("new_tokens"), lit(0L)).cast("bigint")
          .as("new_tokens"))
      .withColumn("vocab_size",
        sum("new_tokens").over(w).cast("bigint"))
      .orderBy("rung")
  }

  /** Term BURSTINESS profile (Church & Gale 1995): for every vocabulary
    * type, total occurrences `tf`, document frequency `df`, and their
    * ratio — the mean occurrences per CONTAINING document. Content
    * words are bursty (when they appear at all, they appear in clumps:
    * tf/df ≫ 1); function words are even (tf/df ≈ tf/N). Corpus
    * curation reads this column to pick deny-list candidates
    * (boilerplate is maximally bursty) and to sanity-check tokenizer
    * spec changes — a re-tokenization that shifts burstiness shifted
    * word boundaries. Complements t10 (frequency coverage: tf alone)
    * and t07 (per-DOC salience): burstiness is the per-TERM dispersion
    * statistic neither surfaces.
    *
    * Scale shape: one explode to (doc, term), then ONE two-phase
    * aggregate shuffled on term — `count(*)` and `count(DISTINCT
    * doc_id)` share the shuffle (Spark plans distinct-on-key via
    * partial expand, still a single exchange on term); the corpus size
    * joins in as a broadcast 1-row frame (t07's precedent). Output is
    * vocabulary-grain — bounded by type count, not token count. The
    * ratio is ONE IEEE division of exact BIGINTs; df share is exact
    * floor-ppm.
    */
  /** t42 kernel on a (doc_id, text) frame — factored for the hand
    * fixture in TextStatsSpec; see [[t42]] for the full contract.
    */
  def termBurstiness(docs: DataFrame): DataFrame = {
    val nd = docs.agg(count(lit(1)).as("n"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).cast("bigint").as("tf"),
        countDistinct(col("doc_id")).cast("bigint").as("df"))
      .crossJoin(broadcast(nd))
      .select(col("term"), col("tf"), col("df"),
        (col("tf").cast("double") / col("df")).as("burstiness"),
        expr("(df * 1000000) div n").cast("bigint").as("df_ppm"))
      .orderBy("term")
  }

  val t42 = OpQuery.oracled("t42_term_burstiness",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), tf AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS tf,
      |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM tok GROUP BY 1
      |), nd AS (
      |  SELECT count(*) AS n FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT term, tf, df,
      |       CAST(tf AS DOUBLE) / df AS burstiness,
      |       CAST((df * 1000000) // (SELECT n FROM nd) AS BIGINT) AS df_ppm
      |FROM tf ORDER BY term""".stripMargin,
    doc = "per-term burstiness (Church-Gale tf/df) + exact-ppm doc frequency: the dispersion statistic for deny-list and tokenizer-drift review; one shuffle on term, vocabulary-grain output") { (spark, dir) =>
    termBurstiness(
      Sources.table(spark, dir, "documents").select("doc_id", "text"))
  }

  /** t43 kernel on a (source, text) frame — factored for the hand
    * fixture in TextStatsSpec; see [[t43]] for the full contract.
    */
  def lexicalRichness(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term")
      .agg(count(lit(1)).cast("bigint").as("k"))
      .groupBy("source")
      .agg(sum("k").cast("bigint").as("n_tokens"),
        count(lit(1)).cast("bigint").as("n_types"),
        sum(when(col("k") === 1L, 1L).otherwise(0L)).cast("bigint")
          .as("n_hapax"),
        sum(when(col("k") === 2L, 1L).otherwise(0L)).cast("bigint")
          .as("n_dis"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("n_dis"),
        expr("(n_types * 1000000) div n_tokens").cast("bigint")
          .as("type_token_ppm"),
        expr("(n_hapax * 1000000) div n_types").cast("bigint")
          .as("hapax_share_ppm"))
      .orderBy("source")

  /** Per-source LEXICAL RICHNESS — the corpus-linguistics vocabulary
    * profile (Baayen, "Word Frequency Distributions"): token count,
    * type count, hapax legomena (types seen once) and dis legomena
    * (types seen twice), plus exact floor-ppm type/token and
    * hapax-share ratios. Hapax share is the classic productivity
    * signal — a source whose hapax share collapses is templated or
    * machine-repeated text; a source where it explodes is OCR noise or
    * tokenizer drift. Complements t41 (vocab GROWTH over ingest order)
    * and t10 (coverage of a fixed global vocab) with the per-source
    * frequency-spectrum summary neither surfaces.
    *
    * Scale shape: one explode to (source, term), a two-phase aggregate
    * shuffled on (source, term) — map-side partial counts absorb
    * within-partition repeats — then a source-grain rollup of the
    * type-grain frame. Output is one row per source; no doc-grain or
    * token-grain rows survive the first aggregate. All-integer, so the
    * profile is bit-stable and diffable across releases.
    */
  val t43 = OpQuery.oracled("t43_lexical_richness",
    """WITH tk AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |), ty AS (
      |  SELECT source, term, CAST(count(*) AS BIGINT) AS k
      |  FROM tk GROUP BY 1, 2
      |), agg AS (
      |  SELECT source,
      |         CAST(sum(k) AS BIGINT) AS n_tokens,
      |         CAST(count(*) AS BIGINT) AS n_types,
      |         CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_hapax,
      |         CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_dis
      |  FROM ty GROUP BY 1
      |)
      |SELECT source, n_tokens, n_types, n_hapax, n_dis,
      |       CAST((n_types * 1000000) // n_tokens AS BIGINT)
      |         AS type_token_ppm,
      |       CAST((n_hapax * 1000000) // n_types AS BIGINT)
      |         AS hapax_share_ppm
      |FROM agg ORDER BY source""".stripMargin,
    doc = "per-source lexical richness: tokens, types, hapax/dis legomena + exact-ppm type-token and hapax-share ratios — the frequency-spectrum profile for OCR-noise and templating review") { (spark, dir) =>
    lexicalRichness(
      Sources.table(spark, dir, "documents").select("source", "text"))
  }

  /** Apply an already-trained merge table (round, lhs, rhs) to a
    * '|'-delimited symbol vocabulary, in round order — the honest BPE
    * ENCODE path for words the trainer never saw (t34's lookup only
    * covers the training vocabulary; transfer scoring needs to encode
    * ANY word by replaying the merges on its character split). Each
    * round is a 1-row broadcast LEFT-on-true join + one `replace`
    * (the bpeTrainOn no-op-on-empty contract), so the whole chain is
    * `rounds` map stages over the distinct-word frame.
    */
  private[graft] def bpeApplyMerges(vocab: org.apache.spark.sql.DataFrame,
      merges: org.apache.spark.sql.DataFrame, rounds: Int)
      : org.apache.spark.sql.DataFrame = {
    var v = vocab.select(col("w"), col("s"))
    for (r <- 1 to rounds) {
      val m = merges.filter(col("round") === r)
        .select(col("lhs").as("_ml"), col("rhs").as("_mr"))
      v = v.join(broadcast(m), lit(true), "left")
        .select(col("w"),
          when(col("_ml").isNull, col("s"))
            .otherwise(expr(
              "replace(s, '|' || _ml || '|' || _mr || '|', '|' || _ml || _mr || '|')"))
            .as("s"))
    }
    v.select(col("w"),
      size(expr("filter(split(s, '\\\\|'), x -> x != '')")).as("n_syms"))
  }

  /** t44: TOKENIZER TRANSFER DRIFT — the fidelity probe of the BPE
    * family (r15 verdict item 8's second candidate axis): t33 trains
    * and t34 scores ONE tokenizer on the corpus it was trained on,
    * but the production question is TRANSFER — a tokenizer trained on
    * last quarter's mixture scores this quarter's corpus, and the
    * drift in tokens-per-word is the retraining signal. The twin here
    * trains on a deterministically SHIFTED mixture (the md5
    * source-bucket lower half — a topic-mix shift, not a random
    * subsample), both merge tables replay over the FULL corpus
    * vocabulary via [[bpeApplyMerges]] (encoding unseen words by
    * merge replay, not vocabulary lookup), and the per-source report
    * carries exact token counts under both tokenizers, the signed
    * drift in ppm (both engines' integer division truncates toward
    * zero — probed), and how many of the 3 greedy merges the two
    * trainings share. Scale shape: two O(vocab)-per-round trainings,
    * six 1-row broadcast merge applications, one broadcast vocabulary
    * join onto the corpus word stream — nothing new touches corpus
    * grain twice.
    */
  val t44 = OpQuery.oracled("t44_tokenizer_transfer_drift", {
    def pairsOf(src: String, p: String) =
      s"""$p AS (
        |  SELECT syms[CAST(i AS INT)] AS lhs, syms[CAST(i AS INT)+1] AS rhs,
        |         sum(freq) AS cnt
        |  FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms,
        |               freq FROM $src),
        |       LATERAL unnest(range(1, len(syms))) AS t(i)
        |  GROUP BY 1, 2
        |)""".stripMargin
    def mergedOf(src: String, m: String, w: String) =
      s"""$w AS (
        |  SELECT w, CASE WHEN $m.lhs IS NULL THEN s
        |            ELSE replace(s, '|'||$m.lhs||'|'||$m.rhs||'|',
        |                         '|'||$m.lhs||$m.rhs||'|') END AS s, freq
        |  FROM $src LEFT JOIN $m ON true
        |)""".stripMargin
    def trainOf(w0: String, prefix: String): String = Seq(
      pairsOf(w0, s"${prefix}p1"),
      s"${prefix}m1 AS (SELECT lhs, rhs FROM ${prefix}p1 ORDER BY cnt DESC, lhs, rhs LIMIT 1)",
      mergedOf(w0, s"${prefix}m1", s"${prefix}w1"),
      pairsOf(s"${prefix}w1", s"${prefix}p2"),
      s"${prefix}m2 AS (SELECT lhs, rhs FROM ${prefix}p2 ORDER BY cnt DESC, lhs, rhs LIMIT 1)",
      mergedOf(s"${prefix}w1", s"${prefix}m2", s"${prefix}w2"),
      pairsOf(s"${prefix}w2", s"${prefix}p3"),
      s"${prefix}m3 AS (SELECT lhs, rhs FROM ${prefix}p3 ORDER BY cnt DESC, lhs, rhs LIMIT 1)")
      .mkString(",\n      |")
    val srcBucket =
      "(instr('0123456789abcdef', substr(md5(source), 1, 1)) - 1) * 16" +
        " + (instr('0123456789abcdef', substr(md5(source), 2, 1)) - 1)"
    s"""WITH w0 AS (
      |  SELECT w, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
      |         count(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM read_parquet('{SFDIR}/documents.parquet'))
      |  GROUP BY 1, 2
      |), v0 AS (
      |  SELECT w, '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s,
      |         count(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w
      |        FROM read_parquet('{SFDIR}/documents.parquet')
      |        WHERE $srcBucket < 128)
      |  GROUP BY 1, 2
      |),
      |${trainOf("w0", "b")},
      |${trainOf("v0", "s")},
      |voc AS (SELECT w, s, CAST(0 AS BIGINT) AS freq FROM w0),
      |${mergedOf("voc", "bm1", "eb1")},
      |${mergedOf("eb1", "bm2", "eb2")},
      |${mergedOf("eb2", "bm3", "eb3")},
      |${mergedOf("voc", "sm1", "es1")},
      |${mergedOf("es1", "sm2", "es2")},
      |${mergedOf("es2", "sm3", "es3")},
      |enc AS (
      |  SELECT b.w,
      |         len(list_filter(string_split(b.s, '|'), x -> x <> '')) AS nb,
      |         len(list_filter(string_split(t.s, '|'), x -> x <> '')) AS ns
      |  FROM eb3 b JOIN es3 t ON t.w = b.w
      |), shared AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_shared_merges FROM (
      |    SELECT lhs, rhs FROM bm1 UNION SELECT lhs, rhs FROM bm2
      |    UNION SELECT lhs, rhs FROM bm3) b
      |  JOIN (SELECT lhs, rhs FROM sm1 UNION SELECT lhs, rhs FROM sm2
      |        UNION SELECT lhs, rhs FROM sm3) t
      |    ON t.lhs = b.lhs AND t.rhs = b.rhs
      |), docw AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM read_parquet('{SFDIR}/documents.parquet')
      |)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(nb) AS BIGINT) AS n_tokens_base,
      |       CAST(sum(ns) AS BIGINT) AS n_tokens_shifted,
      |       CAST(((sum(ns) - sum(nb)) * 1000000) // sum(nb) AS BIGINT)
      |         AS drift_ppm,
      |       max(shared.n_shared_merges) AS n_shared_merges
      |FROM docw JOIN enc USING (w) CROSS JOIN shared
      |GROUP BY source
      |ORDER BY source""".stripMargin
  },
    doc = "tokenizer transfer drift: BPE merges trained on the full corpus vs a source-bucket-shifted mixture, both replayed over the full vocabulary; per-source exact token counts, signed drift ppm, shared-merge count") { (spark, dir) =>
    val docs = Sources.table(spark, dir, "documents")
    // the full-corpus vocabulary feeds base training AND the shifted
    // replay — one corpus pass, reused across the iterative rounds
    val vocab = bpeWords(docs).persist()
    val (mBase0, wBase0) = bpeTrainOn(vocab, 3)
    // persist (lazy) the training outputs: the merge table is
    // referenced per replay round + by the shared-merge count, the
    // merged vocabulary by the base encode — cache substitution at
    // planning time makes every reference a scan of the one
    // materialized result instead of replaying the whole iterative
    // training subtree inside a single 80-exchange DAG (measured 2×
    // on this query's wall clock; an EAGER cut here is wrong the
    // other way — it forces the shared base-training lineage to run
    // twice)
    val mBase = mBase0.persist()
    val wBase = wBase0.persist()
    val mShift = bpeTrainOn(
      bpeWords(docs.filter(
        graft.api.Sampling.hashBucket(col("source")) < 128)), 3)
      ._1.persist()
    // base encode = the training's own post-merge vocabulary — the
    // replay would recompute exactly wBase's symbol sequences
    val encB = wBase
      .select(col("w"),
        size(expr("filter(split(s, '\\\\|'), x -> x != '')")).as("nb"))
    val encS = bpeApplyMerges(vocab, mShift, 3)
      .select(col("w"), col("n_syms").as("ns"))
    val shared = mBase.select("lhs", "rhs").distinct()
      .join(mShift.select("lhs", "rhs").distinct(), Seq("lhs", "rhs"))
      .agg(count(lit(1)).cast("bigint").as("n_shared_merges"))
    docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(encB), "w")
      .join(broadcast(encS), "w")
      .crossJoin(broadcast(shared))
      .groupBy("source")
      .agg(
        count(lit(1)).cast("bigint").as("n_words"),
        sum(col("nb")).cast("bigint").as("n_tokens_base"),
        sum(col("ns")).cast("bigint").as("n_tokens_shifted"),
        expr("CAST(((sum(ns) - sum(nb)) * 1000000) div sum(nb) AS BIGINT)")
          .as("drift_ppm"),
        max(col("n_shared_merges")).cast("bigint").as("n_shared_merges"))
      .orderBy("source")
  }

  val all: Seq[OpQuery] =
    Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13,
      t14, t15, t16, t17, t18, t19, t20, t21, t22, t23, t24, t25, t26, t27,
      t28, t29, t30, t31, t32, t33, t34, t35, t36, t37, t38, t39, t40, t41,
      t42, t43, t44)
}
