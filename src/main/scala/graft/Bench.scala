package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line.
  *
  * Forces FULL evaluation via a noop-format write — every column is computed
  * and materialized on executors (unlike `count()`, which lets Catalyst prune
  * projections and collapse the plan). Failures are reported as -1 with a
  * stderr message, never silently timed.
  *
  * Reporting: the headline per-query number stays best-of-two (steady state,
  * damps scheduler noise), but BOTH raw runs are emitted (`cold` pays each
  * query's codegen compilation, `warm` is the re-run) so round-over-round
  * comparisons can't hide a codegen-compile regression behind the min.
  * Regression guard: queries whose best-of-two exceeds 1.5x (2x for
  * driver-loop-shaped queries) their driver-recorded floor (sf0.1,
  * local[32]) are self-reported in `regressed`.
  */
object Bench {

  /** Per-query floors (sf0.1, local[32], best-of-two). Round-15 re-seed:
    * the r14 driver bench (BENCH_r14.json, calibration 1.2169, 207/207 ran)
    * tightens 4 existing floors where the raw clean-run best beat the prior
    * floor even on the ~22 % slower session box (q49, q107, q185, q199) and
    * seeds the round-14 additions q201-q207, previously floorless, at
    * best-of-two DIVIDED by the 1.2169 canary calibration — the same
    * reference-machine normalization as the q188-q200 seeds below.
    *
    * q69_strata_sample RE-SEEDED 0.114 -> 0.328 (r15 measured 0.431 /
    * calibration 1.312, the q150/q100 structural-change precedent):
    * round 15 replaced the global-ntile SinglePartition sort with the
    * bucket-decomposed exact rank — the bucket exchange + offsets
    * broadcast + count() are fixed overhead at toy SF that buy the 100x
    * path (the old plan funneled the corpus through ONE task); the old
    * floor measured a plan that deliberately no longer exists. q69's
    * oracle is unchanged, so the semantics stay pinned.
    *
    * Round-14 re-seed (kept for the audit trail):
    * every floor is min(prior floor, r13 driver run) — the r13 driver bench
    * (via BENCH_LAST.json, calibration 1.2125, 200/200 ran) tightens 3
    * existing floors where the raw clean-run best beat the prior floor
    * even on the ~21 % slower session box (q50, q131, q144), and seeds
    * the round-13 additions q188-q200, previously floorless, at
    * best-of-two DIVIDED by the 1.2125 canary calibration so the new
    * floors land on the same reference-machine scale as every earlier
    * seed (raw slow-box values would quietly loosen the guard for
    * exactly the newest queries); the guard is never loosened EXCEPT by
    * adjudication: q150_bpe_train was RE-SEEDED 0.717 -> 1.157 in r13
    * because the graded plan structurally changed in r12 from naive full
    * recount to the DELTA-recount path (per-round maintenance of a
    * persisted pair-count table) whose fixed per-round overhead exceeds
    * a toy-scale full recount by design — the old floor measured a plan
    * that no longer exists; q159 grades delta ≡ full-recount equivalence
    * so the semantics stay pinned.
    * Queries added THIS round have no floor and are never flagged; their
    * floor lands next round from this round's driver bench.
    *
    * q96_semantic_dedup watch RE-CLOSED (r13): two targeted sf0.1
    * re-measurements on this session's (loaded) box gave best-of-two
    * 2.02 at calibration 1.347 (1.21x calibrated) and 2.15 at 1.620
    * (1.07x) — the query's elevation tracks the canary calibration
    * 1:1 across both runs, which is the load-noise signature, not a
    * plan regression; the r12 elevated reading (1.31x at cal 1.312)
    * fits the same line. Plan unchanged since r5.
    *
    * q100_token_budget RE-SEEDED 0.279 -> 0.641 (r14 best 0.828 /
    * calibration 1.292, the q150 structural-change precedent): round 14
    * routed the per-source running sum through the keyedRunningSum
    * bucket decomposition — the (source, bucket) exchange + broadcast
    * offsets join is fixed overhead at toy SF that buys the 100x path
    * (a plain per-source window single-tasks a 10 TB source); the old
    * floor measured a plan that deliberately no longer exists.
    * q185_training_windows RE-SEEDED 0.511 -> 0.875 on the same
    * grounds (r14 close best 1.120 / calibration 1.279): its cumsum
    * additionally runs the aggOffsets variant — an independent
    * partial-aggregated offsets scan, because the token-array payload
    * breaks exchange-subtree identity — so the toy-SF cost is a second
    * narrow scan that buys the one-heavy-exchange 100x shape.
    * q102/q192 absorbed the same change inside their existing slack
    * and keep their floors.
    *
    * q46_novel_docs / q140_bm25_topk flags ADJUDICATED CLOSED (r14):
    * the r13 driver run flagged both calibrated (1.74x / 1.77x at cal
    * 1.21) on code paths round 13 did not touch. Two targeted sf0.1
    * re-measurements this session: q46 1.585 at cal 1.474 (0.79x) and
    * 2.179 at cal 1.705 (0.94x) — decisively under floor; q140 2.336
    * at 1.474 (1.33x) and 2.517 at 1.705 (1.23x) — under the 1.5x
    * flag on both runs, tracking calibration (the q96 load-noise
    * signature). Floors unchanged; if the r14 driver run re-flags
    * either on a quiet box, the next suspects are the novelAgainst
    * band-index probe and the postings broadcast probe under
    * 200-query-JVM heap pressure (the verdict's adjudication note). */
  private val Floor: Map[String, Double] = Map(
    "q01_project_scan" -> 0.417, "q02_watermark_ts" -> 0.169,
    "q03_watermark_id_null" -> 0.17, "q04_incr_ts" -> 0.292,
    "q05_incr_id" -> 0.671, "q06_coerce_int" -> 0.602,
    "q07_coerce_trim" -> 0.188, "q08_upsert" -> 0.388,
    "q09_anti_join" -> 0.392, "q10_semi_join" -> 0.51,
    "q11_ordered_listing" -> 0.109, "q12_group_fold" -> 0.215,
    "q13_sync_stats" -> 0.094, "q14_decimal_cast" -> 0.618,
    "q15_watermark_roundtrip" -> 0.147, "q16_dedup_exact" -> 0.169,
    "q17_token_stats" -> 0.233, "q18_text_quality" -> 0.357,
    "q19_lang_id" -> 0.488, "q20_fingerprint" -> 0.2,
    "q21_dedup_minhash" -> 2.364, "q22_dedup_ngram" -> 0.705,
    "q23_simhash_invariant" -> 0.346, "q24_embed_topk" -> 0.127,
    "q25_embed_neardup" -> 1.405, "q26_ann_topk" -> 0.42,
    "q27_multimodal_decode" -> 0.121, "q28_json_extract" -> 0.69,
    "q29_running_sum" -> 0.435, "q30_rollup_stats" -> 0.162,
    "q31_approx_distinct" -> 0.183, "q32_sessionize" -> 0.363,
    "q33_dedup_canonical" -> 1.183, "q34_funnel" -> 0.275,
    "q35_frame_sample" -> 0.153, "q36_ivf_recall" -> 0.813,
    "q37_lsh_pair_recall" -> 1.348, "q38_simhash_neardup" -> 0.959,
    "q39_corpus_clean" -> 0.627, "q40_vocab_topk" -> 0.167,
    "q41_asof_join" -> 0.337, "q42_percentile_sketch" -> 0.222,
    "q43_range_pairs" -> 0.377, "q44_hash_split" -> 0.088,
    "q45_cap_per_source" -> 0.135, "q46_novel_docs" -> 1.365,
    "q47_chunking" -> 0.444, "q48_repetition" -> 0.37,
    "q49_decontaminate" -> 0.38, "q50_pivot_counts" -> 0.239,
    "q51_event_lag" -> 0.402, "q52_histogram" -> 0.14,
    "q53_bloom_filter" -> 0.206, "q54_stream_windows" -> 1.246,
    "q55_pq_recall" -> 0.365, "q56_skew_salted_agg" -> 0.193,
    "q57_ivfpq_recall" -> 1.013, "q58_rare_terms" -> 0.48,
    "q59_mixture_sample" -> 0.139, "q60_freq_spectrum" -> 0.207,
    "q61_stream_dedup" -> 1.398, "q62_cms_heavy_hitters" -> 0.33,
    "q63_source_quality" -> 0.32, "q64_dedup_keep_best" -> 1.516,
    "q65_sql_parity" -> 0.229, "q66_packing" -> 0.232,
    "q67_cube_counts" -> 0.172, "q68_star_revenue" -> 0.321,
    "q69_strata_sample" -> 0.328, "q70_scrub" -> 0.471,
    "q71_bigram_lm" -> 0.429, "q72_incr_dedup" -> 0.558,
    "q73_stream_sessions" -> 1.778, "q74_sync_checksum" -> 0.514,
    "q75_bloom_pruned_join" -> 0.4, "q76_rollup_geo" -> 0.446,
    "q77_stream_join" -> 5.233, "q78_session_window" -> 0.394,
    "q79_group_percentiles" -> 0.462, "q80_gap_fill" -> 1.621,
    "q81_lsh_shuffle_parity" -> 0.987, "q82_salted_join" -> 0.293,
    "q83_typed_agg" -> 0.232, "q84_format_roundtrip" -> 1.118,
    "q85_bucketed_join" -> 0.932, "q86_srp_twin" -> 0.248,
    "q87_image_decode" -> 0.22, "q88_compaction" -> 1.387,
    "q89_cc_deep_chain" -> 1.391, "q90_sync_deletes" -> 0.246,
    "q91_hash_file_sync" -> 0.651, "q92_stream_enrich" -> 1.098,
    "q93_stream_upsert_sync" -> 1.807, "q94_passage_dedup" -> 1.067,
    "q95_dup_gram_share" -> 0.848, "q96_semantic_dedup" -> 1.235,
    "q97_zorder_layout" -> 0.708, "q98_trailing_window" -> 0.44,
    "q99_topk_per_group" -> 0.13, "q100_token_budget" -> 0.641,
    "q101_audio_decode" -> 0.161, "q102_curation_pipeline" -> 1.47,
    "q103_wav_decode" -> 0.17, "q104_pruned_read" -> 1.073,
    "q105_snapshot_diff" -> 0.486, "q106_shard_shuffle" -> 0.549,
    "q107_avi_decode" -> 0.172, "q108_nfc_normalize" -> 0.29,
    "q109_fuzzy_join" -> 0.501, "q110_box_join" -> 1.252,
    "q111_entity_resolution" -> 1.523, "q112_knn_join" -> 0.38,
    "q113_ivf_knn_parity" -> 1.241, "q114_incr_stats" -> 0.378,
    "q115_image_neardup" -> 0.871, "q116_schema_evolution" -> 1.122,
    "q117_pq_knn_parity" -> 1.68, "q118_ivfpq_knn_parity" -> 3.535,
    "q119_stream_decontaminate" -> 1.806, "q120_image_resize" -> 0.935,
    "q121_stream_ingest_dedup" -> 4.139, "q122_stream_knn_serve" -> 1.182,
    "q123_stream_maintained_view" -> 1.964, "q124_stream_index_ingest" -> 2.043,
    "q125_lm_quality_buckets" -> 0.705, "q126_stream_quality_gate" -> 1.83,
    "q127_audio_resample" -> 0.21, "q128_stream_embed_dedup" -> 1.084,
    "q129_decontaminate_spans" -> 1.0, "q130_stream_scrub_spans" -> 2.531,
    "q131_sq_knn_parity" -> 1.804, "q132_leakage_safe_split" -> 1.521,
    "q133_hard_negatives" -> 0.334, "q134_centroid_audit" -> 0.4,
    "q135_bpe_pair_counts" -> 0.23, "q136_triplet_mining" -> 0.345,
    "q137_temperature_mix" -> 0.184, "q138_epoch_expand" -> 0.128,
    "q139_stream_distinct_view" -> 2.021, "q140_bm25_topk" -> 1.196,
    "q141_winnow_fingerprints" -> 2.537, "q142_winnow_overlap" -> 2.758,
    "q143_stream_bm25_serve" -> 3.077, "q144_self_scrub_spans" -> 1.348,
    "q145_vocab_encode" -> 0.833, "q146_stream_encode_gate" -> 1.55,
    "q147_hybrid_rrf" -> 2.13, "q148_stream_overlap_gate" -> 3.188,
    "q149_vocab_encode_join" -> 0.775, "q150_bpe_train" -> 1.157,
    "q151_overlap_index_ingest" -> 6.421, "q152_ivf_reassign" -> 1.79,
    "q153_global_running_sum" -> 0.448, "q154_bpe_encode" -> 1.036,
    "q155_stream_encode_join_gate" -> 1.835, "q156_weighted_sample" -> 0.148,
    "q157_bpe_piece_ids" -> 2.374, "q158_dedup_index_ingest" -> 3.301,
    "q159_bpe_delta_train" -> 1.617, "q160_video_frame_decode" -> 0.939,
    "q161_overlap_snapshot" -> 5.229, "q162_global_weighted_sample" -> 0.145,
    "q163_fuzzy_join_d2" -> 0.321, "q164_unicode_strip" -> 0.295,
    "q165_unigram_train" -> 0.545, "q166_unigram_encode" -> 0.914,
    "q167_svm_train" -> 0.813, "q168_svm_score" -> 1.043,
    "q169_stream_classify_gate" -> 1.765, "q170_stream_unigram_gate" -> 1.562,
    "q171_gopher_rules" -> 1.171, "q172_compression_signal" -> 0.407,
    "q173_stream_gopher_gate" -> 1.429, "q174_strip_accents" -> 0.159,
    "q175_data_expectations" -> 1.026, "q176_textrank_keywords" -> 0.643,
    "q177_stream_expectations" -> 0.834, "q178_column_profile" -> 0.976,
    "q179_line_dedup" -> 0.329, "q180_wordpiece_encode" -> 0.689,
    "q181_wordpiece_train" -> 2.743, "q182_stream_wordpiece_gate" -> 1.408,
    "q183_stream_line_index" -> 1.299, "q184_tokenizer_fertility" -> 0.713,
    "q185_training_windows" -> 0.819, "q186_stream_line_gate" -> 1.15,
    "q187_langid_profiles" -> 4.715, "q188_dup_span_stats" -> 1.281,
    "q189_svm_join_parity" -> 1.571, "q190_stream_dup_span_gate" -> 2.764,
    "q191_langid_unicode" -> 0.504, "q192_budget_mixture" -> 0.509,
    "q193_span_index_serve" -> 2.033, "q194_takedown_line_index" -> 0.753,
    "q195_drift_histogram" -> 0.262, "q196_drift_category" -> 0.216,
    "q197_stream_drift_monitor" -> 1.39, "q198_token_shards" -> 0.445,
    "q199_data_card" -> 0.378, "q200_source_overlap" -> 0.943,
    "q201_online_takedown" -> 1.71, "q202_byte_bpe_train" -> 1.233,
    "q203_byte_bpe_encode" -> 0.95, "q204_span_gate_loss" -> 0.649,
    "q205_takedown_span_index" -> 2.246, "q206_audio_neardup" -> 0.818,
    "q207_fix_mojibake" -> 0.14,
    // Round-16 seed: the r15 driver bench (BENCH_r15.json via
    // BENCH_LAST.json, calibration 1.000 — the first QUIET-BOX driver
    // run, so raw best-of-two IS the reference-machine scale; no
    // division needed, unlike the 1.21-1.29-calibrated r13/r14 seeds)
    // lands the previously-floorless round-15 cohort q208-q238.
    "q208_stream_bpe_gate" -> 1.957, "q209_stream_image_dedup" -> 4.177,
    "q210_stream_audio_dedup" -> 4.255, "q211_takedown_band_index" -> 7.116,
    "q212_takedown_ann_serve" -> 5.163, "q213_stream_simhash_dedup" -> 6.113,
    "q214_takedown_overlap_index" -> 7.766, "q215_classifier_sweep" -> 2.299,
    "q216_dup_cluster_sizes" -> 1.37, "q217_exact_quantiles" -> 0.239,
    "q218_source_quantiles" -> 0.35, "q219_mmr_rerank" -> 0.637,
    "q220_stream_mmr_serve" -> 1.3, "q221_novel_ngram_rate" -> 0.348,
    "q222_scd2_history" -> 0.609, "q223_asof_snapshot" -> 0.537,
    "q224_html_extract" -> 0.546, "q225_pit_join" -> 1.539,
    "q226_url_canonical" -> 0.116, "q227_stream_topk_view" -> 1.044,
    "q228_scene_cuts" -> 1.053, "q229_scd2_upserts" -> 0.759,
    "q230_curriculum_order" -> 0.45, "q231_keyframes" -> 0.972,
    "q232_line_dedup_within" -> 0.176, "q233_version_diff" -> 0.756,
    "q234_url_frontier" -> 1.57, "q235_schema_drift" -> 0.075,
    "q236_k_anonymity" -> 0.117, "q237_stream_pit_enrich" -> 5.234,
    "q238_sentences" -> 0.174,
    // Round-17 seed: best-of-two over the r16 driver run (BENCH_r16.json,
    // calibration 1.232) and the builder's definitive close bench
    // (commit d1fe055's BENCH_LAST.json, calibration 1.149), each value
    // DIVIDED by its own run's calibration per the seeding convention,
    // landing the previously-floorless round-16 cohort q239-q250.
    "q239_main_content" -> 3.258, "q240_stream_scd2" -> 2.706,
    "q241_video_neardup" -> 0.649, "q242_stream_video_dedup" -> 3.398,
    "q243_host_frontier_budget" -> 2.475,
    "q244_compaction_under_serving" -> 3.029,
    "q245_stream_scd2_cdc" -> 4.129, "q246_stream_main_content" -> 1.795,
    "q247_takedown_media_index" -> 2.634, "q248_history_retention" -> 1.064,
    "q249_stream_pit_maintained" -> 9.905, "q250_web_curation" -> 0.563,
    // Round-18 seed: best-of-two over the builder's r17 close bench
    // (commit b289b7c's BENCH_LAST.json, calibration 1.370) and the r17
    // DRIVER run (commit 0ec9d68's BENCH_LAST.json, calibration 1.572 —
    // the driver-side BENCH_r17.json was tail-truncated, but the full
    // run survives in that commit's BENCH_LAST.json), each value DIVIDED
    // by its own run's calibration per the seeding convention, landing
    // the previously-floorless round-17 cohort q251-q259. q254/q256
    // HighVariance tags were pre-placed in round 17 (the q132
    // precedent).
    "q251_warc_records" -> 1.108, "q252_warc_curation" -> 1.408,
    "q253_embed_decontaminate" -> 0.272,
    "q254_stream_embed_decon_gate" -> 1.318,
    "q255_cluster_balance" -> 0.235, "q256_history_erasure" -> 5.749,
    "q257_cluster_temperature" -> 0.165, "q258_robots_gate" -> 0.154,
    "q259_stream_robots_frontier" -> 0.745,
    // Round-19 seed: best-of-two over the r18 DRIVER run (BENCH_r18.json,
    // calibration 1.196) and the builder's r18 close bench (commit
    // 54792e7's BENCH_LAST.json, calibration 1.282), each value DIVIDED
    // by its own run's calibration per the seeding convention, landing
    // the previously-floorless round-18 cohort q260-q278. q262/q263/
    // q267/q274/q276 HighVariance tags were pre-placed in round 18 (the
    // q132 precedent).
    "q260_warc_http_responses" -> 0.447, "q261_robots_gate_join" -> 0.266,
    "q262_embed_decon_ivf" -> 0.953, "q263_stream_warc_ingest" -> 3.479,
    "q264_warc_export_roundtrip" -> 1.251, "q265_outlink_edges" -> 0.39,
    "q266_robots_sitemaps" -> 0.039, "q267_stream_crawl_loop" -> 1.36,
    "q268_chat_render" -> 0.167, "q269_chat_loss_spans" -> 0.378,
    "q270_chat_fit_budget" -> 0.354, "q271_preference_pairs" -> 0.374,
    "q272_chat_lint" -> 0.322, "q273_sitemap_entries" -> 0.35,
    "q274_stream_preference_pairs" -> 0.855, "q275_group_advantage" -> 0.354,
    "q276_stream_sitemap_frontier" -> 0.9, "q277_token_loss_mask" -> 0.373,
    "q278_bitext_mine" -> 1.259)

  /** Fixed-seconds slack added to the 1.5x bound: sub-second floors are
    * scheduler-noise-dominated (a 0.13 s query measured at 0.25 s is noise,
    * not a regression). */
  private val NoiseFloorSec = 0.35

  /** Queries that are a driver-side LOOP of many short jobs (the connected
    * components rounds): per-round scheduling noise compounds, measured
    * spread 3.5-5.6 s across runs of an identical plan — these use a 2x
    * bound so the guard still catches a real blow-up (the round-3
    * pointer-jump bug was 4.6x) without flagging load noise. q64 runs the
    * IDENTICAL mining+CC machinery plus one window: measured 1.4-3.5 s
    * across r4-r7 runs of an unchanged plan, with the q33+q64 pair-sum
    * roughly constant while the split swings (JIT/checkpoint timing
    * allocates the shared cost between them). q89 is the deep-chain CC
    * loop — more rounds, same compounding. q132 runs the same CC loop to
    * build leakage-safe groups (r10 measured 3.07 best-of-two with a
    * 5.80 s warm on the same plan — the documented 3.5-5.6 s sibling
    * spread applies), tagged BEFORE its floor activates so the first
    * floored round can't flag scheduling noise. q151/q158 are the
    * streaming-harness index-ingest parity queries (three real micro-batch
    * rounds each, plus from-scratch rebuild + full-outer audit): micro-batch
    * scheduling noise compounds across rounds exactly like the CC loops
    * (r11 measured q158 at 4.04/5.07 on an identical plan) — tagged on the
    * q132 precedent, BEFORE their newly-seeded floors activate. q150 is
    * the BPE merge-training DRIVER LOOP (7 rounds of count → argmax →
    * merge, each with a localCheckpoint) — the same per-round compounding
    * as the CC loops: r12 measured 1.09 and 1.53 best-of-two on an
    * identical plan (floor 0.717), the 1.5x bound flags the loaded tail
    * of that spread while 2x still catches a real blow-up. The round-12
    * newcomers tagged BEFORE their newly-seeded floors activate (the q132
    * precedent), all on the same structural grounds: q161 is the overlap
    * SNAPSHOT harness (four streaming appends + snapshot + full rebuild +
    * full-outer parity — micro-batch compounding like q151), q181 is the
    * WordPiece merge-training DRIVER LOOP (per-round delta maintenance +
    * checkpoint, the q150 shape), q183/q186 are streaming line-index
    * ingest/serving parity harnesses (multi-micro-batch rounds, the
    * q151/q158 shape), and q187 trains AND classifies in one lambda
    * (two corpus-wide explodes + a checkpoint between them — its r12
    * cold/warm spread was 7.40/6.18 on one plan). */
  /** q113/q165 r14 calibrated flags ADJUDICATED (r15, the two-re-measure
    * protocol): q113_ivf_knn_parity measured 1.02x and 1.09x CALIBRATED
    * across two targeted sf0.1 re-measures (2.02/2.01 raw at canary
    * calibrations 1.60/1.49) — elevation tracks calibration 1:1, the
    * q46/q96 load-noise signature; floor kept, flag closed.
    * q165_unigram_train does NOT track calibration: 1.37/1.37 raw
    * (1.57x/1.68x calibrated) on the same runs, 1.25 SOLO on a quiet box
    * (load 0.99), vs 0.805 at the r14 close bench HOURS earlier on the
    * SAME code, data, and machine — bimodal 0.80<->1.37 on an identical
    * plan, exactly the q150 precedent ("1.09 and 1.53 best-of-two on an
    * identical plan"). Cause: unigramTrain is a driver-side hard-EM LOOP
    * (per-round jobs over a localCheckpoint'd word table,
    * text/Unigram.scala:97) whose toy-SF cost is dominated by per-round
    * scheduling + checkpoint latency — fixed costs the single-job
    * canaries cannot calibrate. Tagged HighVariance on the q150/q181
    * driver-loop precedent WITH this measured cause; the 2x bound still
    * catches a real blow-up (the observed spread tops out at 1.7x of
    * floor before calibration). */
  /** q113_ivf_knn_parity r15-driver quiet-box elevation ADJUDICATED
    * (r16): the r15 driver bench measured 2.15 s at calibration 1.00
    * (1.73x of floor with no load to blame), contradicting the r15
    * calibration-tracking closure. This round's targeted quiet-box
    * re-measure (load 0.14): 2.30 s raw at SUBSET calibration 1.76 —
    * ALL eight canaries ran 1.5-2.2x their floors in the 10-query
    * subset JVM (a subset run pays the JIT/codegen warmup a 238-query
    * run amortizes away), and q113 tracks that subset calibration at
    * 1.06x. The cross-round raw record on UNCHANGED code (r14 driver
    * 1.50 @ cal 1.378, r15 driver 2.15 @ cal 1.00, today 2.30 quiet) is
    * the q165 bimodal signature, and the CAUSE is structural:
    * Similarity.ivfCentroids is a DRIVER-SIDE Lloyd loop — one seed
    * collect + 3 iteration jobs each ending in a collect — ahead of the
    * parity arm's two corpus-wide joins (full-probe knnJoinIvf re-runs
    * the q112 brute-force comparator BY DESIGN: nprobe = numCells is
    * the graded degeneracy claim). Four sequential short jobs whose
    * scheduling + collect latency compounds is exactly the
    * q150/q165/q181 HighVariance shape; tagged with this measured
    * cause, floor kept — the 2x bound (2.83 s) still catches a real
    * blow-up while the observed spread (2.02-2.30) passes. */
  /** q184/q192/q96 r16-close flags ADJUDICATED (same round, the
    * two-re-measure protocol): the second r16 full bench flagged
    * q184_tokenizer_fertility and q192_budget_mixture calibrated (and
    * q96 raw-only) at calibration 1.078 — none of their code paths
    * changed this round. Targeted re-measures with canaries: q184
    * cleared immediately (1.25x calibrated at cal 1.817 — the
    * q36/q170/q171 single-run-skew signature), q96 likewise (1.08x,
    * its thrice-adjudicated load-noise pattern). q192 flagged once
    * more (1.99 raw at cal 1.817) then cleared (1.29 at cal 1.425);
    * the four-run record 0.96/1.25/1.99/1.29 on an identical untouched
    * plan is the q150/q165 bimodal signature, and the cause is
    * structural: budgetMixture runs a per-source-totals COLLECT + a
    * driver-side water-filling allocation loop AHEAD of the
    * bucket-decomposed keyedRunningSum (exchange + offsets broadcast —
    * the same multi-job fixed overhead that re-seeded q100/q185).
    * Sequential driver-coordinated jobs whose scheduling noise
    * compounds — tagged HighVariance with this measured cause, floor
    * kept; the 2x bound still catches a real blow-up (observed spread
    * tops at 1.08x calibrated of floor under the 2x+noise bound). */
  /** q36/q170/q171 r15-close calibrated flags ADJUDICATED (same round,
    * the two-re-measure protocol): one full-bench run flagged
    * q36_ivf_recall (2.17x), q170_stream_unigram_gate (2.07x) and
    * q171_gopher_rules (1.85x) calibrated — on an anomalously FAST
    * canary set (calibration 1.02 while those three ran slow; none of
    * their code paths changed this round). Two targeted
    * calibration-tracking re-measures (canaries included in the subset):
    * zero flags, 1.10x/0.91x/1.15x calibrated at calibrations
    * 1.31/1.38 — elevation tracks calibration, the q46/q113 load-noise
    * signature. A second FULL 230-query bench the same session: zero
    * raw and zero calibrated flags (q36 0.897, q170 2.265, q171 1.402
    * at calibration 1.055). Floors kept, no tags added — the flags were
    * a single-run canary/load skew, not a regression. */
  /** q48/q88 r16-driver calibrated flags ADJUDICATED (r17, the
    * two-re-measure protocol): the r16 DRIVER bench flagged
    * q48_repetition and q88_compaction calibrated (3.24x/3.29x at
    * calibration 1.232) — neither code path changed in round 16, and
    * the builder's same-code close bench had both AT FLOOR (0.61/1.60
    * at cal 1.149). Two targeted quiet-box re-measures (load < 0.6,
    * canaries in-subset): q48 0.649 @ cal 1.762 and 0.508 @ cal 1.437
    * (0.37x/0.35x calibrated of its 0.407 floor — AT floor both
    * times); q88 2.17/2.07 raw (1.23x/1.44x calibrated of its 0.98
    * floor — inside the 1.5x+noise bound both times); Bench's own
    * flag lists empty on both runs. The early-band hypothesis from
    * the r16 verdict also tested: all six OTHER raw-flagged early-band
    * queries (q42/q46/q47/q49/q60/q96 — bench positions 42-96 of the
    * driver's 250-query single-JVM run) ran in the same subsets and
    * produced ZERO calibrated flags — the whole band is at floor in
    * isolation, so the driver-run elevation was position/load noise in
    * a growing single-JVM run, not per-query regressions. Floors kept,
    * no new tags, both flags closed (the q113-r15 calibration-tracking
    * closure shape). */
  private val HighVariance = Set("q33_dedup_canonical",
    "q64_dedup_keep_best", "q89_cc_deep_chain", "q111_entity_resolution",
    "q132_leakage_safe_split", "q150_bpe_train",
    "q151_overlap_index_ingest", "q158_dedup_index_ingest",
    "q161_overlap_snapshot", "q181_wordpiece_train",
    "q183_stream_line_index", "q186_stream_line_gate",
    "q187_langid_profiles",
    // r15 adjudication (see the scaladoc above): the unigram hard-EM
    // driver loop, bimodal on an identical plan, non-calibration-tracking
    "q165_unigram_train",
    // round-13 newcomers, tagged BEFORE their floors land next round
    // (the q132 precedent), all micro-batch/multi-job harnesses:
    // q190 two-batch streaming scrub gate, q193 two-batch index ingest
    // + accumulated serve, q194 store-write + atomic purge + serve
    // (three separate write jobs), q197 two-batch maintained counts +
    // report — the same scheduling-noise compounding as q151/q158/q186
    "q190_stream_dup_span_gate", "q193_span_index_serve",
    "q194_takedown_line_index", "q197_stream_drift_monitor",
    // round-14 newcomers, tagged BEFORE their floors land (q132
    // precedent): q201 runs TWO streaming ingest rounds (separate
    // awaitTermination each) + tombstone + serve — the q183/q186
    // multi-job compounding shape; q202/q203 are BPE merge-training
    // DRIVER LOOPS with per-round checkpoints plus a driver-side
    // brute-force/parity gate — the q150/q181 shape; q205 is the q201
    // two-ingest-round tombstone harness on the span index
    "q201_online_takedown", "q202_byte_bpe_train", "q203_byte_bpe_encode",
    "q205_takedown_span_index",
    // round-15 newcomers, tagged BEFORE their floors land (q132
    // precedent), all multi-micro-batch/multi-job harnesses: q208 is a
    // two-batch tokenizer gate (the q170/q182 shape), q209/q210 run
    // probe-then-append dedup ingest across two batches plus two
    // full-outer parity arms, q211 is the q201 two-ingest-round
    // tombstone harness plus a second arrival-serving stream
    "q208_stream_bpe_gate", "q209_stream_image_dedup",
    "q210_stream_audio_dedup", "q211_takedown_band_index",
    // q212 runs TWO ingest rounds (separate awaitTermination each) +
    // tombstone + three IVF knn joins — the q201/q205 multi-job shape;
    // q213 is the two-batch probe-then-append harness (q209 shape)
    "q212_takedown_ann_serve", "q213_stream_simhash_dedup",
    // q214 is the q201-shape two-ingest-round tombstone harness plus a
    // second arrival-serving stream (the q211 shape on the overlap index)
    "q214_takedown_overlap_index",
    // q216 runs the q33 CC driver loop (the founding HighVariance shape)
    "q216_dup_cluster_sizes",
    // q220 is a two-micro-batch serving harness (the q122/q151 shape)
    "q220_stream_mmr_serve",
    // r16 adjudication (see the q113 scaladoc above): driver-side Lloyd
    // training loop + dual corpus-wide parity joins, bimodal raw record
    // on unchanged code across three quiet/loaded contexts
    "q113_ivf_knn_parity",
    // q227 is a two-micro-batch maintained-view harness + report — the
    // q197 shape with a composite key, tagged as its floor activates
    // (the q132 precedent)
    "q227_stream_topk_view",
    // round-16 newcomers, tagged BEFORE their floors land (q132
    // precedent): q240 is a two-round lineage-continuous maintained-
    // history harness (the q197/q227 shape), q242 is the two-batch
    // probe-then-append video ingest harness (the q209/q210 shape),
    // q244 runs THREE ingest rounds + tombstone + compaction + three
    // serve arms (the q201 shape, one lifecycle step further)
    "q240_stream_scd2", "q242_stream_video_dedup",
    "q244_compaction_under_serving",
    // q245 is the q240 two-round maintained-history harness, CDC form
    "q245_stream_scd2_cdc",
    // q247 is the q211-shape two-ingest-round tombstone harness on the
    // fingerprint family; q246 is the two-micro-batch extraction-gate
    // harness (the q208 shape)
    "q247_takedown_media_index", "q246_stream_main_content",
    // q249 runs the q245 two-round maintained-history harness PLUS a
    // serving stream (the q201 multi-job shape)
    "q249_stream_pit_maintained",
    // r16 adjudication (see the q184/q192/q96 scaladoc above): driver
    // collect + water-filling loop ahead of the multi-job bucket
    // decomposition, bimodal across four runs of unchanged code
    "q192_budget_mixture",
    // round-17 newcomers, tagged BEFORE their floors land (the q132
    // precedent): q254 is the two-micro-batch gate harness (the
    // q128/q208 shape), q256 runs TWO scd2Ingest rounds + tombstone +
    // compaction + per-version asOf serve arms (the q244 multi-job
    // lifecycle shape, temporal form)
    "q254_stream_embed_decon_gate", "q256_history_erasure",
    // r17 adjudication: q159 measured 1.52/2.05/1.99/2.33 calibrated of
    // its 1.617 floor across FOUR same-day full benches and 2.90/2.70 on
    // two targeted subset re-measures — all on unchanged code and an
    // identical plan, the q150/q165/q202 bimodal driver-loop signature.
    // The cause is structural and was simply never tagged when its floor
    // landed on a quiet run: bpeTrainDelta is a per-round DRIVER LOOP
    // (merge selection collect + delta-recount job per round, checkpoints
    // between) whose scheduling/collect latency compounds — its full
    // trainer siblings q150/q202/q203 carry the tag already. The 2x
    // bound still catches a real blow-up (observed spread tops at 1.8x
    // of floor)
    "q159_bpe_delta_train",
    // round-18 newcomers, tagged BEFORE their floors land (the q132
    // precedent): q262 runs ivfIndex's driver-side Lloyd loop (seed
    // collect + per-iteration collect jobs — the MEASURED q113
    // HighVariance cause) ahead of THREE probe arms; q263 and q267 are
    // two-micro-batch ingest harnesses (the q246/q208 shape)
    "q262_embed_decon_ivf", "q263_stream_warc_ingest",
    "q267_stream_crawl_loop",
    // q274 is a two-micro-batch maintained-view harness (the q197
    // shape: per-batch state read + atomic rewrite + checkpointed
    // scheduling between batches) and q276 a two-micro-batch frontier
    // ingest (the q246/q208 shape) — both tagged before their floors
    // land
    "q274_stream_preference_pairs", "q276_stream_sitemap_frontier")

  /** Machine calibration canaries: stable, mid-weight queries spanning the
    * engine's plan shapes (pushed scan, window, LSH join, stream, fill).
    * Floors are absolute numbers from a SPECIFIC driver VM; a fresh VM of
    * the same spec measured a uniform ~1.4x shift across queries whose
    * plans had not changed since their floor round — absolute floors
    * cannot tell that apart from a real across-the-board regression, so
    * the calibrated list scales every floor by the MEDIAN canary ratio
    * (clamped >= 1: a faster box must not loosen the guard). The median
    * keeps one genuinely-regressed canary from dragging the whole scale
    * (its own entry still flags); both lists are emitted so environment
    * drift is visible instead of silently absorbed. */
  private val Canaries = Seq("q05_incr_id", "q09_anti_join", "q14_decimal_cast",
    "q21_dedup_minhash", "q29_running_sum", "q41_asof_join",
    "q54_stream_windows", "q80_gap_fill")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build()
    // JVM/codegen warmup on the smallest SF so first-query compile cost
    // doesn't pollute the measured numbers.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
      }
    // SPARK_GRAFT_ONLY=q33_dedup_canonical,q64_dedup_keep_best runs just
    // those lambdas — the targeted-measurement loop for variance hunting;
    // calibration degrades gracefully (no canaries in the subset -> 1.0).
    // Unknown names fail fast: a typo would otherwise "succeed" measuring
    // zero queries (the same vacuous-pass guard Verify's subset arg has)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Double = run(name, fn)
      // per-run failures fall back to the other run's measurement — a
      // transient second-run hiccup must not discard a valid first timing
      val (cold, warm) = (once(), once())
      // Isolation between measured queries: drop any persisted blocks a
      // query's lifetime left behind (localCheckpoint leftovers — the CC
      // loop releases its own intermediates, but each invocation's FINAL
      // label table is referenced by the returned plan and lives until
      // driver GC). Without this, a query's timing depends on how much
      // unreclaimed block-manager state earlier queries happened to
      // leave — measured as q33's 1.6 s vs 4 s bimodality on an
      // identical plan. No query legitimately persists across lambdas.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val best = if (cold < 0) warm else if (warm < 0) cold else math.min(cold, warm)
      (name, best, cold, warm)
    }
    def jmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def bound(name: String, f: Double): Double =
      f * (if (HighVariance(name)) 2.0 else 1.5) + NoiseFloorSec
    // retry-on-flag: best-of-two is flimsy for sub-second queries on a
    // noisy box (an unchanged 0.4 s query measured 0.57 s one run and
    // 1.5 s the next) — a query over its bound gets ONE more measurement
    // and keeps the min. A real regression re-measures high and stays
    // flagged; a scheduler spike clears. The retry time updates the
    // reported per-query number but not cold/warm (those stay the raw
    // first-pass runs).
    val byFn = SparkEntry.queries
    val rechecked = results.map { case r @ (name, best, cold, warm) =>
      if (best >= 0 && Floor.get(name).exists(f => best > bound(name, f))) {
        val retry = run(name, byFn(name))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        if (retry >= 0 && retry < best) (name, retry, cold, warm) else r
      } else r
    }
    val regressed = rechecked.collect {
      case (name, best, _, _)
        if best >= 0 && Floor.get(name).exists(f => best > bound(name, f)) => name
    }
    // machine calibration: median measured/floor over the canaries, >= 1
    val byName = rechecked.map(r => r._1 -> r._2).toMap
    val canaryRatios = Canaries.flatMap(c =>
      for (t <- byName.get(c).filter(_ >= 0); f <- Floor.get(c)) yield t / f).sorted
    // TRUE median (mean of the middle pair when even-sized): the upper
    // median would let exactly half the canaries regress together and
    // scale every bound up with them
    val calibration = math.max(1.0,
      if (canaryRatios.isEmpty) 1.0
      else if (canaryRatios.size % 2 == 1) canaryRatios(canaryRatios.size / 2)
      else (canaryRatios(canaryRatios.size / 2 - 1) + canaryRatios(canaryRatios.size / 2)) / 2.0)
    val regressedCal = rechecked.collect {
      case (name, best, _, _)
        if best >= 0 && Floor.get(name).exists(f => best > bound(name, f * calibration)) => name
    }
    regressed.foreach(n => System.err.println(
      s"[bench] REGRESSION: $n exceeded its recorded floor (${Floor(n)} s) " +
        s"bound (${bound(n, Floor(n))} s)" +
        (if (regressedCal.contains(n)) "" else
          f" [within bound after x$calibration%.2f machine calibration]")))
    val failed = rechecked.count(_._2 < 0)
    // a failed query must never make the total LOOK faster: surface the
    // failure count so totals across rounds stay comparable
    val total = rechecked.map(_._2).filter(_ >= 0).sum
    val regressedJson = regressed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val regressedCalJson = regressedCal.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed""" +
      s""","queries":${jmap(rechecked.map(r => r._1 -> r._2))}""" +
      s""","cold":${jmap(rechecked.map(r => r._1 -> r._3))}""" +
      s""","warm":${jmap(rechecked.map(r => r._1 -> r._4))}""" +
      s""","regressed":$regressedJson,"calibration":$calibration""" +
      s""","regressed_calibrated":$regressedCalJson,"sf":"$sfDir"}"""
    println(json)
    // stdout of driver rounds has been captured with only the TAIL surviving
    // (BENCH_r07/r08 both carry "parsed": null), which starves next-round
    // floor re-seeding — so the full JSON also lands in a file. Default is
    // relative to the working directory (the repo root under sbt), so the
    // artifact is committed with the round on any checkout location.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file emit failed: $e") }
    spark.stop()
  }
}
