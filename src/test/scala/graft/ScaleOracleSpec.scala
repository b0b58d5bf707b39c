package graft

import org.scalatest.funsuite.AnyFunSuite

/** Correctness-at-scale probe (round-14 VERDICT item 6): every routine
  * oracle compare runs at sf0.01/sf0.001, so a scale-dependent
  * divergence (partial-agg merge order, an overflow, a sampler whose
  * bound only binds at volume) would ship unseen. This spec
  * hash-matches a cheap, family-spanning subset of the registry
  * against DuckDB at sf0.1 — the bench rung, 10× the routine gate.
  *
  * Flag-gated (`SPARK_GRAFT_SF01_ORACLE=1`) so `sbt test` stays fast:
  * it is the weekly-style deep check, run before round-final gates
  * (committed run log: `tools/sf01_oracle_run.log`). Reuses
  * [[Verify.dump]] in-JVM and the driver-replica compare
  * `tools/check.py --only-present`.
  */
class ScaleOracleSpec extends AnyFunSuite {

  /** Cheap (≤ ~0.6 s each at sf0.1 in the r13 draw), deterministic,
    * and family-spanning: relational, reference q/qr, text, dedup,
    * multimodal, events, similarity, graph. Streaming stays out —
    * its oracles are exercised per-round by the driver and each costs
    * multi-second checkpoint drives — EXCEPT qs12/qs24 (r14 verdict
    * item 7): the two heaviest streaming drives are exactly the ones
    * whose performance is under watch, so their correctness at the
    * bench rung is worth the drive cost here. The r14-flagged batch
    * queries (g16/r19/t16/t38) are likewise pinned in: a query whose
    * scaling is being adjudicated must also be value-correct at the
    * adjudication scale.
    */
  private val subset: Set[String] = Set(
    "g16_link_candidate_build", "r19_bucketed_colocated_join",
    "t16_novelty_share", "t38_source_bigram_jaccard",
    "qs12_stream_dedup_gate", "qs24_stream_edge_view",
    "g25_dimsum_sampled_similarity", "e45_group_sequential_readout",
    "e46_stratified_did", "e30_bot_regularity", "e33_rate_change_points",
    "r01_semi_join_open_orders", "r02_anti_join_no_orders",
    "r05_explode_part_words", "r22_group_topk_parts",
    "r59_schema_evolved_scan", "r65_late_shipment_priority",
    "r66_quality_expectations",
    "e35_ab_experiment_readout",
    "q04_top_segment_per_balance_band",
    "qr3_top_poster_per_country", "qr6_users_joined_per_year",
    "qr7a_median_followers_per_join_year",
    "t06_train_test_split", "t10_vocab_coverage",
    "t11_stratified_sample", "t14_sequence_packing",
    "t21_per_domain_cap",
    "d04_lsh_near_dup_pairs", "d05_simhash",
    "d18_cross_source_dup_matrix",
    "m01_binary_payload_meta", "m05_modality_mix",
    "e05_latest_event_per_user", "e23_pareto_concentration",
    "e36_churn_hazard_table", "e37_engagement_depth_curve",
    "e38_gini_concentration", "e39_cuped_adjusted_readout",
    "r67_balance_decile_lift", "r68_orc_scan_parity",
    "r69_csv_ingest_parity",
    "t42_term_burstiness", "p12_eval_leakage_firewall",
    "s03_label_norm_stats", "s22_centroid_drift", "s23_knn_graph",
    "g08_link_prediction", "g21_hits_bipartite",
    "p09_dataset_card", "p10_k_anonymity_audit",
    "p11_anonymized_release",
    "t43_lexical_richness", "e40_did_readout", "e41_metric_correlation",
    "d19_edit_distance_verify", "p13_shard_packing_plan",
    "e42_seasonal_anomaly_flags", "e43_cohort_ltv_curve",
    "s26_ann_tombstone_health", "e44_experiment_power",
    "g24_pagerank_convergence", "m13_crossmodal_dedup_policy",
    // r15 verdict item 5: the two curve-rung-flagged queries carry
    // correctness-at-scale evidence beside their adjudication; plus
    // everything whose arithmetic changed or arrived in r16
    "g19_edge_support_histogram", "g14_item_cf_similarity",
    "e20_rfm_features", "e47_rfm_quintiles_sampled",
    "d20_lsh_index_compaction", "qs29_stream_sequential_monitor",
    // new in the r16 continuation: tokenizer transfer drift, the
    // skyline operator (5000-doc frontier — the first rung where the
    // frontier differs from the 500-doc fixture shared by sf0.001 and
    // sf0.01), and gap-subsequence mining
    "t44_tokenizer_transfer_drift", "p15_corpus_pareto_frontier",
    "e48_frequent_event_sequences", "e49_conformal_value_bound",
    "e50_jackknife_ratio_se", "p16_frontier_maintenance",
    "qs30_stream_asof_join", "r70_join_size_estimate",
    "s27_ivf_compaction",
    // r16 optimization round: the two queries whose verify/scoring
    // kernels were rewritten (xor-popcount hamming; codegen'd long_dot)
    // carry correctness-at-scale evidence beside their probes
    "d16_simhash_near_dup", "s21_int8_search_recall")

  test("sf0.1 DuckDB oracle parity on the cheap deterministic subset") {
    assume(sys.env.get("SPARK_GRAFT_SF01_ORACLE").contains("1"),
      "deep check: set SPARK_GRAFT_SF01_ORACLE=1 to run")
    val sfDir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists, s"no $sfDir")
    val missing = subset -- SparkEntry.registry.map(_.name).toSet
    assert(missing.isEmpty, s"subset names drifted from the registry: $missing")
    val out = java.nio.file.Files
      .createTempDirectory("sf01_oracle").toString
    Verify.dump(TestSpark.spark, sfDir, out, Some(subset))
    val dumped = Option(new java.io.File(out).listFiles()).get
      .map(_.getName).filter(subset.contains).toSet
    assert(dumped == subset,
      s"queries failed to dump at sf0.1: ${subset -- dumped}")
    val cmd = Seq("python3", "tools/check.py", out, sfDir, "--only-present")
    val logBuf = new StringBuilder
    val code = scala.sys.process.Process(cmd, new java.io.File(".")).!(
      scala.sys.process.ProcessLogger(l => { logBuf.append(l).append('\n'); () }))
    info(logBuf.toString)
    assert(code == 0, s"sf0.1 oracle compare failed:\n$logBuf")
  }
}
