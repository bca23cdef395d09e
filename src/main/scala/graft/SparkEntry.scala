package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational analytics core
    "q1_pricing" -> ((s, d) => Tpch.q1Pricing(s, d)),
    "q3_shipping" -> ((s, d) => Tpch.q3Shipping(s, d)),
    "q5_local_supplier" -> ((s, d) => Tpch.q5LocalSupplier(s, d)),
    "q6_forecast" -> ((s, d) => Tpch.q6Forecast(s, d)),
    "q10_returned" -> ((s, d) => Tpch.q10Returned(s, d)),
    "q18_large_orders" -> ((s, d) => Tpch.q18LargeOrders(s, d)),
    "q_revenue_by_month" -> ((s, d) => Tpch.qRevenueByMonth(s, d)),
    "q7_nation_trade" -> ((s, d) => Tpch.q7NationTrade(s, d)),
    "q9_profit" -> ((s, d) => Tpch.q9Profit(s, d)),
    "q14_promo_share" -> ((s, d) => Tpch.q14PromoShare(s, d)),
    "q16_part_suppliers" -> ((s, d) => Tpch.q16PartSuppliers(s, d)),
    "q19_disjunct" -> ((s, d) => Tpch.q19Disjunct(s, d)),
    "q22_idle_customers" -> ((s, d) => Tpch.q22IdleCustomers(s, d)),
    "q2_first_supplier" -> ((s, d) => Tpch.q2FirstSupplier(s, d)),
    "q8_market_share" -> ((s, d) => Tpch.q8MarketShare(s, d)),
    "q20_dominant_suppliers" -> ((s, d) => Tpch.q20DominantSuppliers(s, d)),
    "q21_late_suppliers" -> ((s, d) => Tpch.q21LateSuppliers(s, d)),
    "q11_important_parts" -> ((s, d) => Tpch.q11ImportantParts(s, d)),
    "q4_order_priority" -> ((s, d) => Tpch.q4OrderPriority(s, d)),
    "q12_priority" -> ((s, d) => Tpch.q12Priority(s, d)),
    "q13_custdist" -> ((s, d) => Tpch.q13CustDist(s, d)),
    "q15_top_supplier" -> ((s, d) => Tpch.q15TopSupplier(s, d)),
    "q17_small_qty" -> ((s, d) => Tpch.q17SmallQty(s, d)),
    "q_running_totals" -> ((s, d) => Tpch.qRunningTotals(s, d)),
    "q_rollup_revenue" -> ((s, d) => Tpch.qRollupRevenue(s, d)),
    "q_cube_revenue" -> ((s, d) => Tpch.qCubeRevenue(s, d)),
    "q_grouping_sets" -> ((s, d) => Tpch.qGroupingSets(s, d)),
    "q_spend_deciles" -> ((s, d) => Tpch.qSpendDeciles(s, d)),
    "q_zorder_layout" -> ((s, d) => Bucketing.zorderLayout(s, d)),
    "q_incremental_agg" -> ((s, d) => Tpch.qIncrementalAgg(s, d)),
    "q_mom_delta" -> ((s, d) => Tpch.qMomDelta(s, d)),
    "q_bloom_join" -> ((s, d) => Tpch.qBloomJoin(s, d)),
    "q_delta_join" -> ((s, d) => Tpch.qDeltaJoin(s, d)),
    "q_integrity_audit" -> ((s, d) => Tpch.qIntegrityAudit(s, d)),
    "q_data_profile" -> ((s, d) => Tpch.qDataProfile(s, d)),
    "q_market_basket" -> ((s, d) => Tpch.marketBasket(s, d)),
    "q_basket_stats" -> ((s, d) => Tpch.basketStats(s, d)),
    "q_triangle_count" -> ((s, d) => Joins.triangleCount(s, d)),
    "q_pareto_bands" -> ((s, d) => Tpch.paretoBands(s, d)),
    "q_segment_migration" -> ((s, d) => Tpch.segmentMigration(s, d)),
    "q_join_card_est" -> ((s, d) => Tpch.joinCardEst(s, d)),
    "q_delta_distinct" -> ((s, d) => Tpch.deltaDistinct(s, d)),
    "q_partition_advisor" -> ((s, d) => Tpch.partitionAdvisor(s, d)),
    "q_broadcast_audit" -> ((s, d) => Tpch.broadcastAudit(s, d)),
    "q_file_skipping" -> ((s, d) => Bucketing.fileSkipping(s, d)),
    // §2.1 SSE / event-stream surface (batch form)
    "sse_parse" -> ((s, d) => Events.sseParse(s, d)),
    "sse_parse_full" -> ((s, d) => Events.sseParseFull(s, d)),
    "sse_normalize" -> ((s, d) => Events.sseNormalize(s, d)),
    "sse_route" -> ((s, d) => Events.sseRoute(s, d)),
    "sse_project" -> ((s, d) => Events.sseProject(s, d)),
    "sse_extract_field" -> ((s, d) => Events.sseExtractField(s, d)),
    "sse_xml_extract" -> ((s, d) => Events.xmlExtract(s, d)),
    "sse_csv_extract" -> ((s, d) => Events.csvExtract(s, d)),
    "sse_schema_infer" -> ((s, d) => Events.schemaInfer(s, d)),
    "ev_type_counts" -> ((s, d) => Events.typeCounts(s, d)),
    "ev_metrics" -> ((s, d) => Events.metrics(s, d)),
    "ev_window_counts" -> ((s, d) => Events.windowCounts(s, d)),
    "ev_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "ev_json_extract" -> ((s, d) => Events.jsonExtract(s, d)),
    "ev_topn_users" -> ((s, d) => Events.topNUsers(s, d)),
    "ev_dedup_latest" -> ((s, d) => Events.dedupLatest(s, d)),
    "ev_scd2" -> ((s, d) => Events.scd2(s, d)),
    "ev_count_min" -> ((s, d) => Events.countMin(s, d)),
    "ev_ewma_hourly" -> ((s, d) => Events.ewmaHourly(s, d)),
    "ev_attribution" -> ((s, d) => Events.attribution(s, d)),
    "ev_ab_test" -> ((s, d) => Events.abTest(s, d)),
    "ev_transition_matrix" -> ((s, d) => Events.transitionMatrix(s, d)),
    "ev_markov_stationary" -> ((s, d) => Events.markovStationary(s, d)),
    "ev_seasonality" -> ((s, d) => Events.seasonality(s, d)),
    "ev_sliding_counts" -> ((s, d) => Events.slidingCounts(s, d)),
    "ev_changepoint" -> ((s, d) => Events.changepoint(s, d)),
    "ev_top_paths" -> ((s, d) => Events.topPaths(s, d)),
    "ev_transition_entropy" -> ((s, d) => Events.transitionEntropy(s, d)),
    "ev_bitmap_distinct" -> ((s, d) => Events.bitmapDistinct(s, d)),
    "ev_missing_hours" -> ((s, d) => Events.missingHours(s, d)),
    "ev_watermark_curve" -> ((s, d) => Events.watermarkCurve(s, d)),
    "ev_user_lifetime" -> ((s, d) => Events.userLifetime(s, d)),
    "ev_profile_drift" -> ((s, d) => Events.profileDrift(s, d)),
    "ev_stickiness" -> ((s, d) => Events.stickiness(s, d)),
    "q_ship_latency" -> ((s, d) => Events.shipLatency(s, d)),
    "ev_gap_histogram" -> ((s, d) => Events.gapHistogram(s, d)),
    "ev_key_skew" -> ((s, d) => Events.keySkew(s, d)),
    "q_cdc_merge" -> ((s, d) => Events.cdcMerge(s, d)),
    "ev_agg_salted" -> ((s, d) => Events.aggSalted(s, d)),
    "ev_asof_join" -> ((s, d) => Joins.asofJoin(s, d)),
    "ev_forward_asof" -> ((s, d) => Joins.forwardAsofJoin(s, d)),
    "ev_ohlc_hourly" -> ((s, d) => Events.ohlcHourly(s, d)),
    "ev_rfm" -> ((s, d) => Events.rfm(s, d)),
    "ev_hourly_hll" -> ((s, d) => Events.hourlyHll(s, d)),
    "ev_error_burst" -> ((s, d) => Events.errorBurst(s, d)),
    "ev_dq_rules" -> ((s, d) => Events.dqRules(s, d)),
    "ev_autocorr" -> ((s, d) => Events.autocorr(s, d)),
    "ev_range_join" -> ((s, d) => Joins.rangeJoin(s, d)),
    "ev_skew_join_salted" -> ((s, d) => Joins.skewJoinSalted(s, d)),
    "ev_funnel" -> ((s, d) => Events.funnel(s, d)),
    "ev_funnel_steps" -> ((s, d) => Events.funnelSteps(s, d)),
    "ev_retention" -> ((s, d) => Events.retention(s, d)),
    "ev_anomalies" -> ((s, d) => Events.anomalies(s, d)),
    "ev_user_paths" -> ((s, d) => Events.userPaths(s, d)),
    "ev_distinct_sketch" -> ((s, d) => Events.distinctSketch(s, d)),
    "ev_hll_distinct" -> ((s, d) => Events.hllDistinct(s, d)),
    "ev_value_quantiles" -> ((s, d) => Events.valueQuantiles(s, d)),
    "ev_lateness" -> ((s, d) => Events.lateness(s, d)),
    "ev_quantile_sketch" -> ((s, d) => Events.quantileSketch(s, d)),
    "ev_burstiness" -> ((s, d) => Events.burstiness(s, d)),
    "ev_watermark_recommend" -> ((s, d) => Events.watermarkRecommend(s, d)),
    "ev_pivot_hour" -> ((s, d) => Events.pivotHour(s, d)),
    // §2.3 deduplication
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_exact_norm" -> ((s, d) => Dedup.exactNorm(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_band_stats" -> ((s, d) => Dedup.bandStats(s, d)),
    "dedup_minhash_band_stats" -> ((s, d) => Dedup.minhashBandStats(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_threshold_curve" -> ((s, d) => Dedup.thresholdCurve(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "dedup_embedding_bucket_stats" -> ((s, d) => Dedup.embeddingBucketStats(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "dedup_cc_star" -> ((s, d) => Dedup.clustersStar(s, d)),
    "dedup_cluster_stats" -> ((s, d) => Dedup.clusterStats(s, d)),
    "docs_softdedup_neardup" -> ((s, d) => Dedup.softDedupNearDup(s, d)),
    "dedup_winnow_pairs" -> ((s, d) => Dedup.winnowPairs(s, d)),
    "dedup_winnow_stats" -> ((s, d) => Dedup.winnowStats(s, d)),
    "dedup_apply" -> ((s, d) => Dedup.dedupApply(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containment(s, d)),
    "shingle_stats" -> ((s, d) => Dedup.shingleStats(s, d)),
    "shingle_stats_containment" -> ((s, d) => Dedup.shingleStatsContainment(s, d)),
    "docs_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "docs_decontaminate_bloom" -> ((s, d) => Dedup.decontaminateBloom(s, d)),
    "dedup_minhash_recall" -> ((s, d) => Dedup.minhashRecall(s, d)),
    "dedup_cross_source" -> ((s, d) => Dedup.crossSource(s, d)),
    "dedup_lines" -> ((s, d) => Dedup.lineDedup(s, d)),
    "dedup_lines_apply" -> ((s, d) => Dedup.lineDedupApply(s, d)),
    "dedup_semantic" -> ((s, d) => Dedup.semantic(s, d)),
    "dedup_semantic_cell_stats" -> ((s, d) => Dedup.semanticCellStats(s, d)),
    // §2.4 similarity search
    "ann_bruteforce" -> ((s, d) => Similarity.bruteforceTopK(s, d)),
    "ann_mips" -> ((s, d) => Similarity.mipsTopK(s, d)),
    "ann_mips_ivfpq" -> ((s, d) => Similarity.mipsIvfPqTopK(s, d)),
    "ann_mips_recall" -> ((s, d) => Similarity.mipsIvfPqRecall(s, d)),
    "ann_mips_refine" -> ((s, d) => Similarity.mipsRefineTopK(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.lshTopK(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "vec_centroids" -> ((s, d) => Similarity.centroids(s, d)),
    "vec_quantize" -> ((s, d) => Similarity.vecQuantize(s, d)),
    "vec_pq" -> ((s, d) => Similarity.vecPq(s, d)),
    "ann_ivf_probe2" -> ((s, d) => Similarity.ivfProbeTopK(s, d)),
    "ann_ivf_recall" -> ((s, d) => Similarity.ivfRecall(s, d)),
    "ann_ivf_nprobe_curve" -> ((s, d) => Similarity.ivfNprobeCurve(s, d)),
    "ann_hybrid_rrf" -> ((s, d) => Similarity.hybridRrf(s, d)),
    "ann_ivfpq_tune_grid" -> ((s, d) => Similarity.ivfPqTuneGrid(s, d)),
    "ann_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q_pagerank" -> ((s, d) => Joins.pagerank(s, d)),
    "ann_hybrid_rrf_eval" -> ((s, d) => Similarity.hybridRrfEval(s, d)),
    "ann_pq_search" -> ((s, d) => Similarity.pqSearchTopK(s, d)),
    "ann_refine" -> ((s, d) => Similarity.refineTopK(s, d)),
    "ann_mrl_recall" -> ((s, d) => Similarity.mrlRecall(s, d)),
    "ann_ivfpq" -> ((s, d) => Similarity.ivfPqSearchTopK(s, d)),
    "ann_ivfpq_recall" -> ((s, d) => Similarity.ivfPqRecall(s, d)),
    "vec_pq_residual" -> ((s, d) => Similarity.vecPqResidual(s, d)),
    "vec_kmeans_train" -> ((s, d) => Similarity.kmeansTrain(s, d)),
    "vec_kmeans_centroids" -> ((s, d) => Similarity.kmeansCentroids(s, d)),
    "ann_ivf_trained_recall" -> ((s, d) => Similarity.ivfTrainedRecall(s, d)),
    "ann_ivfpq_residual" -> ((s, d) => Similarity.ivfPqResidualSearchTopK(s, d)),
    "ann_ivfpq_residual_recall" -> ((s, d) => Similarity.ivfPqResidualRecall(s, d)),
    "ann_pq_recall" -> ((s, d) => Similarity.pqRecall(s, d)),
    "vec_kmeans_step" -> ((s, d) => Similarity.kmeansStep(s, d)),
    "vec_drift" -> ((s, d) => Similarity.drift(s, d)),
    "vec_norm_audit" -> ((s, d) => Similarity.normAudit(s, d)),
    "knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    "knn_bucket_stats" -> ((s, d) => Similarity.knnBucketStats(s, d)),
    "ann_sq_search" -> ((s, d) => Similarity.sqTopK(s, d)),
    "ann_sq_recall" -> ((s, d) => Similarity.sqRecall(s, d)),
    "vec_power_iter" -> ((s, d) => Similarity.powerIter(s, d)),
    "vec_silhouette" -> ((s, d) => Similarity.silhouette(s, d)),
    "vec_dim_variance" -> ((s, d) => Similarity.dimVariance(s, d)),
    "vec_ivf_balance" -> ((s, d) => Similarity.ivfBalance(s, d)),
    // §2.4a multi-probe ANN
    "ann_multiprobe" -> ((s, d) => Similarity.multiprobeTopK(s, d)),
    "ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    "vec_kcenter" -> ((s, d) => Similarity.kCenter(s, d)),
    "ann_ivf_kcenter_recall" -> ((s, d) => Similarity.ivfKcenterRecall(s, d)),
    "vec_rp" -> ((s, d) => Similarity.vecRp(s, d)),
    "vec_rp_distortion" -> ((s, d) => Similarity.vecRpDistortion(s, d)),
    "vec_rp_curve" -> ((s, d) => Similarity.vecRpCurve(s, d)),
    "ann_rp_recall" -> ((s, d) => Similarity.annRpRecall(s, d)),
    "ev_windowed_topk" -> ((s, d) => Events.windowedTopK(s, d)),
    // §2.7 corpus-pipeline operators
    "docs_sample_stratified" -> ((s, d) => Pipeline.sampleStratified(s, d)),
    "docs_filter_clean" -> ((s, d) => Pipeline.filterClean(s, d)),
    "dedup_prefix" -> ((s, d) => Pipeline.prefixDups(s, d)),
    "text_token_hist" -> ((s, d) => Pipeline.tokenHist(s, d)),
    "docs_pack" -> ((s, d) => Pipeline.pack(s, d)),
    "docs_pack_greedy" -> ((s, d) => Pipeline.packGreedy(s, d)),
    "docs_mix_uniform" -> ((s, d) => Pipeline.mixUniform(s, d)),
    "docs_mix_temperature" -> ((s, d) => Pipeline.mixTemperature(s, d)),
    "docs_gopher_audit" -> ((s, d) => Pipeline.gopherAudit(s, d)),
    "docs_token_budget" -> ((s, d) => Pipeline.tokenBudget(s, d)),
    "docs_pipeline_e2e" -> ((s, d) => Pipeline.pipelineE2e(s, d)),
    "docs_pipeline_full" -> ((s, d) => Pipeline.pipelineFull(s, d)),
    "text_bpe_step" -> ((s, d) => TextAnalysis.bpeStep(s, d)),
    "text_bpe_train" -> ((s, d) => TextAnalysis.bpeTrain(s, d)),
    "text_bpe_apply" -> ((s, d) => TextAnalysis.bpeApply(s, d)),
    "text_wordpiece_train" -> ((s, d) => TextAnalysis.wordpieceTrain(s, d)),
    "text_wordpiece_apply" -> ((s, d) => TextAnalysis.wordpieceApply(s, d)),
    "text_wordpiece_curve" -> ((s, d) => TextAnalysis.wordpieceCurve(s, d)),
    "docs_shard_skew" -> ((s, d) => Pipeline.shardSkew(s, d)),
    "docs_dsir_weights" -> ((s, d) => Pipeline.dsirWeights(s, d)),
    "docs_ccnet_buckets" -> ((s, d) => Pipeline.ccnetBuckets(s, d)),
    "docs_anneal_schedule" -> ((s, d) => Pipeline.annealSchedule(s, d)),
    "docs_reservoir" -> ((s, d) => Pipeline.reservoir(s, d)),
    "docs_mad_outliers" -> ((s, d) => Pipeline.madOutliers(s, d)),
    "docs_quality_classifier" -> ((s, d) => Pipeline.qualityClassifier(s, d)),
    "docs_softdedup" -> ((s, d) => Pipeline.softDedup(s, d)),
    "docs_split" -> ((s, d) => Pipeline.splitAudit(s, d)),
    "text_unigram_lp" -> ((s, d) => Pipeline.unigramLogProb(s, d)),
    "docs_pii_scrub" -> ((s, d) => Pipeline.piiScrub(s, d)),
    "text_repetition" -> ((s, d) => Pipeline.repetition(s, d)),
    "text_compression" -> ((s, d) => Pipeline.compressionRatio(s, d)),
    // §2.5 text analysis
    "text_quality" -> ((s, d) => TextAnalysis.quality(s, d)),
    "text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "text_langid" -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "docs_by_source" -> ((s, d) => TextAnalysis.bySource(s, d)),
    "text_top_terms" -> ((s, d) => TextAnalysis.topTerms(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidf(s, d)),
    "text_bm25" -> ((s, d) => TextAnalysis.bm25(s, d)),
    "text_langid_eval" -> ((s, d) => TextAnalysis.langIdEval(s, d)),
    "text_pmi_bigrams" -> ((s, d) => TextAnalysis.pmiBigrams(s, d)),
    "text_bigram_lm" -> ((s, d) => TextAnalysis.bigramLm(s, d)),
    "text_vocab_prune" -> ((s, d) => TextAnalysis.vocabPrune(s, d)),
    "text_dup_ngram_frac" -> ((s, d) => TextAnalysis.dupNgramFrac(s, d)),
    "text_ttr" -> ((s, d) => TextAnalysis.ttr(s, d)),
    "text_zipf_slope" -> ((s, d) => TextAnalysis.zipfSlope(s, d)),
    "text_top_phrases" -> ((s, d) => TextAnalysis.topPhrases(s, d)),
    "text_ngram_novelty" -> ((s, d) => TextAnalysis.ngramNovelty(s, d)),
    "text_substr_dup" -> ((s, d) => TextAnalysis.substrDup(s, d)),
    "text_substr_dup_winnow" -> ((s, d) => TextAnalysis.substrDupWinnow(s, d)),
    "text_substr_apply" -> ((s, d) => TextAnalysis.substrApply(s, d)),
    "text_substr_apply_winnow" -> ((s, d) => TextAnalysis.substrApplyWinnow(s, d)),
    "text_substr_keep" -> ((s, d) => TextAnalysis.substrKeep(s, d)),
    "text_substr_keep_winnow" -> ((s, d) => TextAnalysis.substrKeepWinnow(s, d)),
    "text_bpe_curve" -> ((s, d) => TextAnalysis.bpeTrainCurve(s, d)),
    "text_unigram_em" -> ((s, d) => TextAnalysis.unigramEm(s, d)),
    "text_unigram_apply" -> ((s, d) => TextAnalysis.unigramApply(s, d)),
    "text_unigram_prune" -> ((s, d) => TextAnalysis.unigramPrune(s, d)),
    "text_unigram_curve" -> ((s, d) => TextAnalysis.unigramCurve(s, d)),
    "text_code_detect" -> ((s, d) => TextAnalysis.codeDetect(s, d)),
    "text_readability" -> ((s, d) => TextAnalysis.readability(s, d)),
    "text_js_divergence" -> ((s, d) => TextAnalysis.jsDivergence(s, d)),
    "text_winnowing" -> ((s, d) => TextAnalysis.winnowing(s, d)),
    // §2.6 multimodal columns
    "mm_decode_meta" -> ((s, d) => Multimodal.decodeMeta(s, d)),
    "mm_decode_real" -> ((s, d) => Multimodal.decodeReal(s, d)),
    "mm_resize" -> ((s, d) => Multimodal.resize(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    "mm_shard_plan" -> ((s, d) => Multimodal.shardPlan(s, d)),
    "mm_phash_dedup" -> ((s, d) => Multimodal.phashDedup(s, d)),
    "mm_phash_band_stats" -> ((s, d) => Multimodal.phashBandStats(s, d)),
    "mm_phash_recall" -> ((s, d) => Multimodal.phashRecall(s, d)),
    "mm_audio_meta" -> ((s, d) => Multimodal.audioMeta(s, d)),
    "mm_features" -> ((s, d) => Multimodal.features(s, d)),
  )

  /** DuckDB-equivalent SQL per query (driver's correctness oracle). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='BUILDING'
        | AND o_orderdate < TIMESTAMP '1996-03-15'
        | AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN customer ON o_custkey=c_custkey AND s_nationkey=c_nationkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast" ->
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue, count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name, round(c_acctbal,2) AS c_acctbal, n_name, revenue
        |FROM (
        |  SELECT o_custkey, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |  WHERE l_returnflag='R'
        |   AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY o_custkey) t
        |JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        | round(o_totalprice,2) AS o_totalprice, total_qty
        |FROM (
        |  SELECT l_orderkey, round(sum(l_quantity),2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity),2) > 150) t
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_revenue_by_month" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        | round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | cast(year(o_orderdate) AS int) AS l_year,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN customer ON o_custkey=c_custkey
        |JOIN nation n1 ON s_nationkey=n1.n_nationkey
        |JOIN nation n2 ON c_nationkey=n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        | AND n1.n_name != n2.n_name
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, cast(year(o_orderdate) AS int) AS o_year,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey=p_partkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN nation ON s_nationkey=n_nationkey
        |WHERE p_name LIKE '%a%'
        |GROUP BY 1,2 ORDER BY nation, o_year DESC""".stripMargin,
    "q2_first_supplier" ->
      """WITH first AS (
        |  SELECT p_partkey, p_name, l_suppkey, min(l_shipdate) AS first_ship
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
        |  ORDER BY first_ship, l_suppkey) AS rk FROM first)
        |SELECT p_partkey, p_name, s_name, first_ship
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rk = 1 ORDER BY p_partkey""".stripMargin,
    "q8_market_share" ->
      """WITH asian AS (
        |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |cust AS (SELECT c_custkey FROM customer JOIN asian ON c_nationkey = n_nationkey),
        |supn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT cast(year(o_orderdate) AS int) AS o_year,
        |  round(sum(CASE WHEN supp_nation = 'NATION_7'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4) AS nation_revenue,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue,
        |  round(100.0 * sum(CASE WHEN supp_nation = 'NATION_7'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share_pct
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN cust ON o_custkey = c_custkey
        |JOIN supn ON l_suppkey = s_suppkey
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_dominant_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY 1, 2),
        |t AS (SELECT *, sum(qty) OVER (PARTITION BY l_partkey) AS tot,
        |  count(*) OVER (PARTITION BY l_partkey) AS nsupp FROM ps)
        |SELECT s_name, count(*) AS n_parts_dominated,
        |  cast(sum(qty) AS bigint) AS qty_dominated
        |FROM t JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty * nsupp > tot * 2
        |GROUP BY 1 ORDER BY n_parts_dominated DESC, s_name""".stripMargin,
    "q21_late_suppliers" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
        |  FROM lineitem GROUP BY 1, 2),
        |f0 AS (
        |  SELECT l_orderkey, l_suppkey, smax,
        |    max(smax) OVER (PARTITION BY l_orderkey) AS omax,
        |    count(*) OVER (PARTITION BY l_orderkey) AS nsupp
        |  FROM ps),
        |f AS (
        |  SELECT *, cast(sum(CASE WHEN smax = omax THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY l_orderkey) AS bigint) AS nlast
        |  FROM f0)
        |SELECT s_name, count(*) AS waiting_orders
        |FROM f JOIN supplier ON l_suppkey = s_suppkey
        |WHERE nsupp >= 2 AND nlast = 1 AND smax = omax
        |GROUP BY 1 ORDER BY waiting_orders DESC, s_name LIMIT 10""".stripMargin,
    "q11_important_parts" ->
      """WITH supn AS (
        |  SELECT s_suppkey, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey),
        |pq AS (
        |  SELECT n_name, l_partkey, cast(sum(l_quantity) AS bigint) AS qty
        |  FROM lineitem JOIN supn ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT n_name, cast(sum(qty) AS bigint) AS tot,
        |  count(*) AS nparts FROM pq GROUP BY 1)
        |SELECT n_name AS nation, l_partkey, qty
        |FROM pq JOIN tot USING (n_name)
        |WHERE qty * nparts > tot * 3
        |ORDER BY qty DESC, nation, l_partkey LIMIT 100""".stripMargin,
    "q14_promo_share" ->
      """SELECT date_trunc('month', l_shipdate) AS month,
        | round(sum(CASE WHEN p_type='PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END),4) AS promo_revenue,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS total_revenue,
        | round(100.0*sum(CASE WHEN p_type='PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END)
        |   / sum(l_extendedprice*(1-l_discount)),4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_part_suppliers" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey=p_partkey
        |WHERE p_size >= 10 AND p_size <= 30 AND p_brand != 'Brand#1'
        |GROUP BY 1,2,3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q19_disjunct" ->
      """SELECT round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |WHERE (p_brand='Brand#12' AND p_size<=15 AND l_quantity>=1 AND l_quantity<=21)
        | OR (p_brand='Brand#3' AND p_size<=20 AND l_quantity>=10 AND l_quantity<=30)
        | OR (p_brand='Brand#24' AND p_size<=25 AND l_quantity>=20 AND l_quantity<=40)""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_mktsegment, count(*) AS n_custs, round(sum(c_acctbal),2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        | AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_order_priority" -> Tpch.q4Oracle,
    "q12_priority" -> Tpch.q12Oracle,
    "q13_custdist" -> Tpch.q13Oracle,
    "q15_top_supplier" -> Tpch.q15Oracle,
    "q17_small_qty" -> Tpch.q17Oracle,
    "q_running_totals" -> Tpch.qRunningTotalsOracle,
    "q_rollup_revenue" -> Tpch.qRollupRevenueOracle,
    "q_cube_revenue" -> Tpch.qCubeRevenueOracle,
    "q_grouping_sets" -> Tpch.qGroupingSetsOracle,
    "q_spend_deciles" -> Tpch.qSpendDecilesOracle,
    "q_zorder_layout" -> Bucketing.zorderLayoutOracle,
    "q_incremental_agg" -> Tpch.qIncrementalAggOracle,
    "q_mom_delta" -> Tpch.qMomDeltaOracle,
    "q_bloom_join" -> Tpch.qBloomJoinOracle,
    "q_delta_join" -> Tpch.qDeltaJoinOracle,
    "q_integrity_audit" -> Tpch.qIntegrityAuditOracle,
    "q_data_profile" -> Tpch.qDataProfileOracle,
    "q_market_basket" -> Tpch.marketBasketOracle,
    "q_basket_stats" -> Tpch.basketStatsOracle,
    "q_triangle_count" -> Joins.triangleCountOracle,
    "q_pareto_bands" -> Tpch.paretoBandsOracle,
    "q_segment_migration" -> Tpch.segmentMigrationOracle,
    "q_join_card_est" -> Tpch.joinCardEstOracle,
    "q_delta_distinct" -> Tpch.deltaDistinctOracle,
    "q_partition_advisor" -> Tpch.partitionAdvisorOracle,
    "q_broadcast_audit" -> Tpch.broadcastAuditOracle,
    "q_file_skipping" -> Bucketing.fileSkippingOracle,
    "ev_agg_salted" ->
      """SELECT event_type, count(*) AS n_events, round(sum(value),2) AS sum_value,
        | round(sum(value)/count(*),4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "sse_parse" ->
      """SELECT event_type AS event, cast(event_id AS varchar) AS id, props AS data
        |FROM events ORDER BY event_id""".stripMargin,
    "sse_parse_full" ->
      """SELECT event_type AS event, cast(event_id AS varchar) AS id, props AS data
        |FROM events ORDER BY event_id""".stripMargin,
    "sse_normalize" ->
      """SELECT coalesce(nullif(event_type,'error'),'unknown') AS event,
        | cast(event_id AS varchar) AS id, coalesce(nullif(props,''),'') AS data
        |FROM events ORDER BY event_id""".stripMargin,
    "sse_route" ->
      """SELECT 'sse_'||event_type AS topic, cast(event_id % 32 AS int) AS "partition",
        | count(*) AS n_events
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_type_counts" ->
      """SELECT event_type, count(*) AS n_events,
        | cast(sum(length(props)) AS bigint) AS payload_bytes,
        | round(avg(value),4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_metrics" ->
      """SELECT count(*) AS total_events,
        | cast(sum(length(props)+length(event_type)) AS bigint) AS total_bytes,
        | cast(floor(epoch(min(ts))) AS bigint) AS first_ts,
        | cast(floor(epoch(max(ts))) AS bigint) AS last_ts,
        | round(count(*) / cast(cast(floor(epoch(max(ts))) AS bigint)
        |   - cast(floor(epoch(min(ts))) AS bigint) AS double), 6) AS events_per_sec
        |FROM events""".stripMargin,
    "ev_window_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    cast(floor(epoch(ts)) AS bigint) AS tsec,
        |    lag(cast(floor(epoch(ts)) AS bigint))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tsec
        |  FROM events),
        |s AS (
        |  SELECT *, sum(CASE WHEN prev_tsec IS NULL OR tsec - prev_tsec > 1800
        |    THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id, cast(session_id AS bigint) AS session_id,
        |  count(*) AS n_events, round(sum(value),2) AS sum_value,
        |  min(tsec) AS session_start, max(tsec) AS session_end
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "sse_project" -> Events.sseProjectOracle,
    "sse_extract_field" -> Events.sseExtractFieldOracle,
    "sse_xml_extract" -> Events.xmlExtractOracle,
    "sse_csv_extract" -> Events.csvExtractOracle,
    "ev_json_extract" ->
      """SELECT cast(regexp_extract(props,'[0-9]+') AS bigint) % 10 AS k_bucket,
        | count(*) AS n_events, round(avg(value),4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_topn_users" ->
      """SELECT user_id, round(sum(value),2) AS total_value, count(*) AS n_purchases
        |FROM events WHERE event_type='purchase'
        |GROUP BY 1 ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,
    "ev_dedup_latest" ->
      """SELECT user_id, event_type, round(value,2) AS value,
        | cast(floor(epoch(ts)) AS bigint) AS last_seen
        |FROM (SELECT *, row_number() OVER
        |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn=1 ORDER BY user_id""".stripMargin,
    "ev_scd2" -> Events.scd2Oracle,
    "ev_count_min" -> Events.countMinOracle,
    "ev_ewma_hourly" -> Events.ewmaHourlyOracle,
    "ev_attribution" -> Events.attributionOracle,
    "ev_ab_test" -> Events.abTestOracle,
    "ev_transition_matrix" -> Events.transitionMatrixOracle,
    "ev_markov_stationary" -> Events.markovStationaryOracle,
    "ev_seasonality" -> Events.seasonalityOracle,
    "ev_sliding_counts" -> Events.slidingCountsOracle,
    "ev_changepoint" -> Events.changepointOracle,
    "ev_top_paths" -> Events.topPathsOracle,
    "ev_transition_entropy" -> Events.transitionEntropyOracle,
    "ev_bitmap_distinct" -> Events.bitmapDistinctOracle,
    "ev_missing_hours" -> Events.missingHoursOracle,
    "ev_watermark_curve" -> Events.watermarkCurveOracle,
    "ev_user_lifetime" -> Events.userLifetimeOracle,
    "ev_profile_drift" -> Events.profileDriftOracle,
    "ev_stickiness" -> Events.stickinessOracle,
    "q_ship_latency" -> Events.shipLatencyOracle,
    "ev_gap_histogram" -> Events.gapHistogramOracle,
    "ev_key_skew" -> Events.keySkewOracle,
    "q_cdc_merge" -> Events.cdcMergeOracle,
    "ev_asof_join" -> Joins.asofJoinOracle,
    "ev_forward_asof" -> Joins.forwardAsofJoinOracle,
    "ev_ohlc_hourly" -> Events.ohlcHourlyOracle,
    "ev_rfm" -> Events.rfmOracle,
    "ev_hourly_hll" -> Events.hourlyHllOracle,
    "ev_error_burst" -> Events.errorBurstOracle,
    "ev_dq_rules" -> Events.dqRulesOracle,
    "sse_schema_infer" -> Events.schemaInferOracle,
    "ev_autocorr" -> Events.autocorrOracle,
    "ev_range_join" -> Joins.rangeJoinOracle,
    "ev_skew_join_salted" -> Joins.skewJoinSaltedOracle,
    "ev_funnel" -> Events.funnelOracle,
    "ev_funnel_steps" -> Events.funnelStepsOracle,
    "ev_retention" -> Events.retentionOracle,
    "ev_anomalies" -> Events.anomaliesOracle,
    "ev_user_paths" -> Events.userPathsOracle,
    "ev_distinct_sketch" -> Events.distinctSketchOracle,
    "ev_hll_distinct" -> Events.hllDistinctOracle,
    "ev_value_quantiles" -> Events.valueQuantilesOracle,
    "ev_lateness" -> Events.latenessOracle,
    "ev_quantile_sketch" -> Events.quantileSketchOracle,
    "ev_burstiness" -> Events.burstinessOracle,
    "ev_watermark_recommend" -> Events.watermarkRecommendOracle,
    "ev_pivot_hour" -> Events.pivotHourOracle,
    "ann_ivf" -> Similarity.ivfTopKOracle,
    "vec_centroids" -> Similarity.centroidsOracle,
    "vec_quantize" -> Similarity.vecQuantizeOracle,
    "vec_pq" -> Similarity.vecPqOracle,
    "ann_ivf_probe2" -> Similarity.ivfProbeTopKOracle,
    "ann_ivf_recall" -> Similarity.ivfRecallOracle,
    "ann_ivf_nprobe_curve" -> Similarity.ivfNprobeCurveOracle,
    "ann_hybrid_rrf" -> Similarity.hybridRrfOracle,
    "ann_ivfpq_tune_grid" -> Similarity.ivfPqTuneGridOracle,
    "ann_hard_negatives" -> Similarity.hardNegativesOracle,
    "q_pagerank" -> Joins.pagerankOracle,
    "ann_hybrid_rrf_eval" -> Similarity.hybridRrfEvalOracle,
    "ann_pq_search" -> Similarity.pqSearchTopKOracle,
    "ann_refine" -> Similarity.refineTopKOracle,
    "ann_mrl_recall" -> Similarity.mrlRecallOracle,
    "ann_ivfpq" -> Similarity.ivfPqSearchTopKOracle,
    "ann_ivfpq_recall" -> Similarity.ivfPqRecallOracle,
    "vec_pq_residual" -> Similarity.vecPqResidualOracle,
    "vec_kmeans_train" -> Similarity.kmeansTrainOracle,
    "vec_kmeans_centroids" -> Similarity.kmeansCentroidsOracle,
    "ann_ivf_trained_recall" -> Similarity.ivfTrainedRecallOracle,
    "ann_ivfpq_residual" -> Similarity.ivfPqResidualSearchTopKOracle,
    "ann_ivfpq_residual_recall" -> Similarity.ivfPqResidualRecallOracle,
    "ann_pq_recall" -> Similarity.pqRecallOracle,
    "vec_kmeans_step" -> Similarity.kmeansStepOracle,
    "vec_drift" -> Similarity.driftOracle,
    "vec_norm_audit" -> Similarity.normAuditOracle,
    "text_tfidf" -> TextAnalysis.tfidfOracle,
    "text_bm25" -> TextAnalysis.bm25Oracle,
    "text_langid_eval" -> TextAnalysis.langIdEvalOracle,
    "text_pmi_bigrams" -> TextAnalysis.pmiBigramsOracle,
    "text_bigram_lm" -> TextAnalysis.bigramLmOracle,
    "text_vocab_prune" -> TextAnalysis.vocabPruneOracle,
    "text_dup_ngram_frac" -> TextAnalysis.dupNgramFracOracle,
    "text_ttr" -> TextAnalysis.ttrOracle,
    "text_zipf_slope" -> TextAnalysis.zipfSlopeOracle,
    "text_top_phrases" -> TextAnalysis.topPhrasesOracle,
    "text_ngram_novelty" -> TextAnalysis.ngramNoveltyOracle,
    "text_substr_dup" -> TextAnalysis.substrDupOracle,
    "text_substr_dup_winnow" -> TextAnalysis.substrDupWinnowOracle,
    "text_substr_apply" -> TextAnalysis.substrApplyOracle,
    "text_substr_apply_winnow" -> TextAnalysis.substrApplyWinnowOracle,
    "text_substr_keep" -> TextAnalysis.substrKeepOracle,
    "text_substr_keep_winnow" -> TextAnalysis.substrKeepWinnowOracle,
    "text_bpe_curve" -> TextAnalysis.bpeTrainCurveOracle,
    "text_unigram_em" -> TextAnalysis.unigramEmOracle,
    "text_unigram_apply" -> TextAnalysis.unigramApplyOracle,
    "text_unigram_prune" -> TextAnalysis.unigramPruneOracle,
    "text_unigram_curve" -> TextAnalysis.unigramCurveOracle,
    "text_code_detect" -> TextAnalysis.codeDetectOracle,
    "text_readability" -> TextAnalysis.readabilityOracle,
    "text_js_divergence" -> TextAnalysis.jsDivergenceOracle,
    "text_winnowing" -> TextAnalysis.winnowingOracle,
    "dedup_exact" -> Dedup.exactOracle,
    "dedup_exact_norm" -> Dedup.exactNormOracle,
    "dedup_minhash_lsh" -> Dedup.minhashLshOracle,
    "dedup_simhash" -> Dedup.simhashOracle,
    "dedup_band_stats" -> Dedup.bandStatsOracle,
    "dedup_minhash_band_stats" -> Dedup.minhashBandStatsOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "dedup_threshold_curve" -> Dedup.thresholdCurveOracle,
    "dedup_embedding" -> Dedup.embeddingCosineOracle,
    "dedup_embedding_bucket_stats" -> Dedup.embeddingBucketStatsOracle,
    "dedup_clusters" -> Dedup.clustersOracle,
    // labels are a pure function of the edge set: the recursive-traversal
    // oracle adjudicates BOTH the BSP and the star-contraction algorithm
    "dedup_cc_star" -> Dedup.clustersOracle,
    "dedup_cluster_stats" -> Dedup.clusterStatsOracle,
    "docs_softdedup_neardup" -> Dedup.softDedupNearDupOracle,
    "dedup_winnow_pairs" -> Dedup.winnowPairsOracle,
    "dedup_winnow_stats" -> Dedup.winnowStatsOracle,
    "dedup_apply" -> Dedup.dedupApplyOracle,
    "dedup_containment" -> Dedup.containmentOracle,
    "shingle_stats" -> Dedup.shingleStatsOracle,
    "shingle_stats_containment" -> Dedup.shingleStatsContainmentOracle,
    "docs_decontaminate" -> Dedup.decontaminateOracle,
    "docs_decontaminate_bloom" -> Dedup.decontaminateBloomOracle,
    "dedup_minhash_recall" -> Dedup.minhashRecallOracle,
    "dedup_cross_source" -> Dedup.crossSourceOracle,
    "dedup_lines" -> Dedup.lineDedupOracle,
    "dedup_lines_apply" -> Dedup.lineDedupApplyOracle,
    "dedup_semantic" -> Dedup.semanticOracle,
    "dedup_semantic_cell_stats" -> Dedup.semanticCellStatsOracle,
    "ann_bruteforce" -> Similarity.bruteforceTopKOracle,
    "ann_mips" -> Similarity.mipsTopKOracle,
    "ann_mips_ivfpq" -> Similarity.mipsIvfPqTopKOracle,
    "ann_mips_recall" -> Similarity.mipsIvfPqRecallOracle,
    "ann_mips_refine" -> Similarity.mipsRefineTopKOracle,
    "ann_lsh" -> Similarity.lshTopKOracle,
    "ann_multiprobe" -> Similarity.multiprobeTopKOracle,
    "ann_recall" -> Similarity.annRecallOracle,
    "vec_kcenter" -> Similarity.kCenterOracle,
    "ann_ivf_kcenter_recall" -> Similarity.ivfKcenterRecallOracle,
    "vec_rp" -> Similarity.vecRpOracle,
    "vec_rp_distortion" -> Similarity.vecRpDistortionOracle,
    "vec_rp_curve" -> Similarity.vecRpCurveOracle,
    "ann_rp_recall" -> Similarity.annRpRecallOracle,
    "ev_windowed_topk" -> Events.windowedTopKOracle,
    "knn_join" -> Similarity.knnJoinOracle,
    "knn_bucket_stats" -> Similarity.knnBucketStatsOracle,
    "ann_sq_search" -> Similarity.sqTopKOracle,
    "ann_sq_recall" -> Similarity.sqRecallOracle,
    "vec_power_iter" -> Similarity.powerIterOracle,
    "vec_silhouette" -> Similarity.silhouetteOracle,
    "vec_dim_variance" -> Similarity.dimVarianceOracle,
    "vec_ivf_balance" -> Similarity.ivfBalanceOracle,
    "docs_sample_stratified" -> Pipeline.sampleStratifiedOracle,
    "docs_filter_clean" -> Pipeline.filterCleanOracle,
    "dedup_prefix" -> Pipeline.prefixDupsOracle,
    "text_token_hist" -> Pipeline.tokenHistOracle,
    "docs_pack" -> Pipeline.packOracle,
    "docs_pack_greedy" -> Pipeline.packGreedyOracle,
    "docs_mix_uniform" -> Pipeline.mixUniformOracle,
    "docs_mix_temperature" -> Pipeline.mixTemperatureOracle,
    "docs_gopher_audit" -> Pipeline.gopherAuditOracle,
    "docs_token_budget" -> Pipeline.tokenBudgetOracle,
    "docs_pipeline_e2e" -> Pipeline.pipelineE2eOracle,
    "docs_pipeline_full" -> Pipeline.pipelineFullOracle,
    "text_bpe_step" -> TextAnalysis.bpeStepOracle,
    "text_bpe_train" -> TextAnalysis.bpeTrainOracle,
    "text_bpe_apply" -> TextAnalysis.bpeApplyOracle,
    "text_wordpiece_train" -> TextAnalysis.wordpieceTrainOracle,
    "text_wordpiece_apply" -> TextAnalysis.wordpieceApplyOracle,
    "text_wordpiece_curve" -> TextAnalysis.wordpieceCurveOracle,
    "docs_shard_skew" -> Pipeline.shardSkewOracle,
    "docs_dsir_weights" -> Pipeline.dsirWeightsOracle,
    "docs_ccnet_buckets" -> Pipeline.ccnetBucketsOracle,
    "docs_anneal_schedule" -> Pipeline.annealScheduleOracle,
    "docs_reservoir" -> Pipeline.reservoirOracle,
    "docs_mad_outliers" -> Pipeline.madOutliersOracle,
    "docs_quality_classifier" -> Pipeline.qualityClassifierOracle,
    "docs_softdedup" -> Pipeline.softDedupOracle,
    "docs_split" -> Pipeline.splitOracle,
    "text_unigram_lp" -> Pipeline.unigramLogProbOracle,
    "docs_pii_scrub" -> Pipeline.piiScrubOracle,
    "text_repetition" -> Pipeline.repetitionOracle,
    "text_compression" -> Pipeline.compressionOracle,
    "text_quality" -> TextAnalysis.qualityOracle,
    "text_tokens" -> TextAnalysis.tokenCountsOracle,
    "text_langid" -> TextAnalysis.langIdOracle,
    "text_fingerprint" -> TextAnalysis.fingerprintOracle,
    "docs_by_source" -> TextAnalysis.bySourceOracle,
    "text_top_terms" -> TextAnalysis.topTermsOracle,
    "mm_decode_meta" -> Multimodal.decodeMetaOracle,
    "mm_decode_real" -> Multimodal.decodeRealOracle,
    "mm_resize" -> Multimodal.resizeOracle,
    "mm_frame_sample" -> Multimodal.frameSampleOracle,
    "mm_shard_plan" -> Multimodal.shardPlanOracle,
    "mm_phash_dedup" -> Multimodal.phashDedupOracle,
    "mm_phash_band_stats" -> Multimodal.phashBandStatsOracle,
    "mm_phash_recall" -> Multimodal.phashRecallOracle,
    "mm_audio_meta" -> Multimodal.audioMetaOracle,
    "mm_features" -> Multimodal.featuresOracle,
  )
}
