package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of headline queries to
  * EXPLAIN.md (run manually; the commentary at the top of that file is
  * maintained by hand). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = Seq("q01_pricing_summary", "q05_zscore", "q08_regional_revenue",
      "q17_weighted_hierarchy", "q21_minhash_lsh_pairs", "q25_ann_cosine",
      "q28_gold_ratings", "q41_ann_ivf",
      "q42_decontamination", "q45_pack_sequences", "q48_tfidf_topk",
      "q50_repetition_stats", "q59_bloom_incremental_dedup",
      "q60_semantic_dedup", "q61_unigram_quality", "q62_quantized_topk",
      "q65_fuzzy_pairs", "q66_vocab_topk", "q69_heavy_hitters",
      "q71_state_islands", "q72_salted_segment_revenue",
      "q73_pagerank", "q76_moving_avg", "q77_incremental_agg",
      "q78_dq_report", "q80_corr_matrix", "q83_corpus_shuffle",
      "q85_entity_resolution", "q87_session_incident_overlap",
      "q88_multimodal_transforms", "q89_topk_custom",
      "q90_substring_dedup", "q92_bpe_encode", "q93_bm25_retrieval",
      "q94_quality_classifier", "q95_cdc_chunks", "q96_top_terms_per_source",
      "q97_triangle_counts", "q98_similarity_join", "q99_weighted_sample",
      "q100_curation_pipeline", "q101_substring_dedup_incremental",
      "q102_bucketed_index_dedup", "q103_bucketed_span_dedup",
      "q104_bronze_ingest", "q105_embedding_neardup_lsh",
      "q106_token_budget_select", "q107_shard_pack", "q108_epoch_upsample",
      "q109_boilerplate_removal", "q110_dedup_keep_best_quality",
      "q112_lifecycle_bronze_to_gold", "q113_hybrid_retrieval_rrf",
      "q114_perplexity_buckets", "q115_dsir_select",
      "q116_contamination_matrix", "q117_mixture_report",
      "q118_hll_rollup", "q119_ann_pq",
      "q121_cms_freq", "q122_kmv_overlap", "q123_merge_partitioned",
      "q124_robust_outliers", "q125_gap_fill_forward", "q126_pivot_revenue",
      "q127_histogram_quantile_incremental", "q128_bm25_index",
      "q129_touch_attribution", "q130_snapshot_diff", "q131_winsorize",
      "q132_rolling_anomaly", "q133_markov_transitions", "q134_pmi_pairs",
      "q135_local_supplier_volume", "q136_quota_sample", "q137_kcore",
      "q138_zipf_fit", "q139_partitioned_delete", "q140_ann_ivfpq",
      "q141_pit_lookup", "q142_waiting_supplier", "q143_rolling_active_users",
      "q144_growth_accounting", "q145_source_novelty",
      "q146_bloom_join_reduction", "q147_zonemap_skipping",
      "q148_interval_coverage", "q149_ab_ztest", "q150_rollup_routing",
      "q151_referential_audit", "q152_label_propagation", "q153_cv_folds",
      "q154_split_leakage", "q155_class_separation",
      "q156_decayed_engagement", "q157_large_orders", "q158_idle_customers",
      "q159_supplier_share", "q160_clamped_balance", "q161_basket_lift",
      "q162_bounce_report", "q163_mi_screen", "q164_benford_screen",
      "q165_time_travel", "q166_period_end_balance", "q167_feature_hashing",
      "q168_zonemap_append", "q169_theil_sen", "q170_windowed_funnel",
      "q171_time_to_convert", "q172_grouped_ols", "q173_cohort_ltv",
      "q174_ewma", "q175_session_paths", "q176_knn_accuracy",
      "q177_psi_drift", "q178_revenue_gini", "q179_peak_concurrency",
      "q180_adamic_adar", "q181_bfs_reachability", "q182_pca_pc1",
      "q183_target_encoding", "q184_skyline", "q185_compaction_fidelity",
      "q186_cdc_apply", "q187_phrase_search", "q188_holt_linear",
      "q189_sequence_conformance", "q190_largest_remainder",
      "q191_chi2_independence", "q192_small_qty_revenue",
      "q193_min_cost_supplier", "q194_fifo_cogs", "q195_cuped_readout",
      "q196_gains_table", "q197_calibration_bins", "q198_integrity_diff",
      "q199_quantization_recall", "q200_late_arriving_dim",
      "q201_ks_drift", "q202_lsh_dedup_eval", "q203_image_phash_neardup",
      "q204_kaplan_meier", "q205_markov_anomaly",
      "q206_codeswitch_audit", "q207_capped_sessions",
      "q208_sql_frontdoor", "q209_containment_pairs", "q210_json_props",
      "q211_asof_nearest", "q212_sql_minhash_pairs", "q213_sql_sessionize",
      "q214_sql_text_profile", "q215_sql_lsh_one_call",
      "q216_lsh_dedup_eval_sampled", "q217_margin_mining",
      "q218_sql_margin_one_call", "q219_sql_lsh_eval_one_call",
      "q220_media_feature_neardup", "q221_ann_centroid_drift",
      "q222_ann_ivf_append", "q223_sql_drift_one_call",
      "q224_audio_fingerprint_neardup", "q225_video_frame_sample",
      "q226_video_neardup", "q227_crossmodal_margin_align",
      "q228_video_dedup_keepbest", "q229_ivfpq_rerank", "q230_zorder_box",
      "q231_rerank_depth_recall", "q232_sql_zbox_one_call",
      "q233_targeted_delete", "q234_sql_ann_one_call",
      "q235_versioned_delete_travel", "q236_zorder_encoded",
      "q237_ivf_index_delete", "q238_versioned_compaction",
      "q239_streaming_zingest", "q240_sql_zbox_encoded_one_call",
      "q241_zorder_encoded_skewed_id", "q242_zorder_encoder_extension",
      "q243_versioned_zlayout", "q244_versioned_ann_forget",
      "q245_streaming_versioned_zlayout",
      "q246_versioned_vacuum_retention",
      "q247_versioned_stats_skipping", "q248_versioned_encoded_stats",
      "q249_versioned_schema_evolution", "q250_versioned_merge",
      "q251_streaming_cdc_merge", "q252_versioned_change_feed",
      "q253_versioned_check_constraints", "q254_versioned_zorder_optimize")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.DataFrame

    // q40's wall-time is per-ROUND work inside duplicateClusters, which the
    // final query plan hides behind a LogicalRDD leaf — so dump one round
    // exactly as the loop builds it: cached symmetric edges + cached labels
    // (both InMemoryTableScan leaves), neighbour-min + pointer jump on top.
    def q40Round(): DataFrame = {
      import org.apache.spark.sql.functions._
      import graft.operators.Dedup
      import spark.implicits._
      val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
      val p = pairs.select(col("id_a"), col("id_b"))
      val edges = Dedup.rebased(p.union(p.select(col("id_b"), col("id_a")))
        .toDF("src", "dst").distinct()).persist()
      val labels = Dedup.rebased(edges.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
        .select(col("src").as("id"), col("cluster_id"))).persist()
      edges.count(); labels.count() // materialize the caches like the loop does
      Dedup.propagationRound(edges, labels)
    }

    val frames: Seq[(String, () => DataFrame)] =
      names.map(n => n -> (() => SparkEntry.queries(n)(spark, sfDir))) :+
        ("q40_dup_clusters (one propagation round)" -> (() => q40Round()))
    val sb = new StringBuilder
    frames.foreach { case (n, mk) =>
      val plan = mk()
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $n\n\n```\n")
      // keep the operator tree + key scan details, drop the verbose footer
      sb.append(plan.split("\n").takeWhile(l => !l.startsWith("(1) Scan"))
        .mkString("\n"))
      sb.append("\n")
      sb.append(plan.split("\n").dropWhile(l => !l.startsWith("(1) Scan"))
        .filter(l => l.startsWith("(") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("Arguments: [broadcast"))
        .mkString("\n"))
      sb.append("\n```\n")
      // explain analysis can trigger operator-internal pins (the TVF
      // registrations, banded frames); release per query like the runners
      graft.PinnedFrames.release()
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get("EXPLAIN_PLANS.md"),
      "# Physical plans (auto-generated by graft.Explain)\n" + sb.toString)
    spark.stop()
    println("wrote EXPLAIN_PLANS.md")
  }
}
