package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.relational.Relational
import graft.pipeline.TextPipelineQueries
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.textanalysis.{CorpusOps, TextAnalysis}
import graft.multimodal.Multimodal
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator the engine claims is registered here twice: as a Spark
  * query and as its DuckDB-oracle SQL twin (same column names, same row
  * order, exact-arithmetic aggregates).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's raison d'être: χ² top-k feature terms per category.
    */
  def entry(spark: SparkSession): DataFrame =
    TextPipelineQueries.chisqTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing"        -> Relational.aggPricing _,
    "q_join_segment"       -> Relational.joinRevenueBySegment _,
    "q_join_nation"        -> Relational.joinRevenueByNation _,
    "q_join_q5"            -> Relational.localSupplierVolume _,
    "q_small_qty"          -> Relational.smallQuantityRevenue _,
    "q_join_semi"          -> Relational.joinSemi _,
    "q_join_anti"          -> Relational.joinAnti _,
    "q_join_outer"         -> Relational.joinOuterLineCounts _,
    "q_sql_shipping"       -> Relational.shippingPriority _,
    "q_window_topk"        -> Relational.windowTopOrders _,
    "q_window_running"     -> Relational.windowRunningTotal _,
    "q_setops"             -> Relational.setOps _,
    "q_rollup"             -> Relational.rollupQuantities _,
    "q_cube"               -> Relational.cubeOrders _,
    "q_events_hourly"      -> Relational.eventsHourly _,
    "q_events_histogram"   -> Relational.eventsHistogram _,
    "q_profile_docs"       -> Relational.profileDocs _,
    "q_events_funnel"      -> Relational.eventsFunnel _,
    "q_sample_stratified"  -> Relational.sampleStratified _,
    "q_scalar_funcs"       -> Relational.scalarFunctions _,
    "q_scalar_dates"       -> Relational.scalarDates _,
    "q_events_json"        -> Relational.eventsJson _,
    "q_distinct_users"     -> Relational.distinctUsers _,
    // sketch scale-twin: no oracle twin by design (sketches are
    // engine-specific) → driver records the rows-only check; error is
    // bounded against the exact queries in ApproxSpec
    "q_approx_stats"       -> Relational.approxStats _,
    "q_pivot"              -> Relational.pivotOrders _,
    "q_unpivot"            -> Relational.unpivotMetrics _,
    "q_window_analytics"   -> Relational.windowAnalytics _,
    "q_string_funcs"       -> Relational.stringFunctions _,
    "q_percentiles"        -> Relational.percentiles _,
    "q_join_salted"        -> ((s, d) => Relational.saltedJoin(s, d)),
    "q_topk_agg"           -> Relational.topKAggregated _,
    "q_asof_join"          -> Relational.asofJoin _,
    "q_moment_stats"       -> Relational.momentStats _,
    "q_grouping_sets"      -> Relational.groupingSets _,
    "q_window_range"       -> Relational.windowRange _,
    "q_array_agg"          -> Relational.arrayAgg _,
    "q_setops_all"         -> Relational.setOpsAll _,
    "q_wordcount"          -> TextPipelineQueries.wordcount _,
    "q_stopword_antijoin"  -> TextPipelineQueries.stopwordAntiJoin _,
    "q_chisq_topk"         -> ((s, d) => TextPipelineQueries.chisqTopK(s, d)),
    "q_vocabulary"         -> ((s, d) => TextPipelineQueries.vocabulary(s, d)),
    "q_dedup_exact"        -> Dedup.exact _,
    "q_dedup_minhash"      -> Dedup.minhashCandidates _,
    "q_minhash_est"        -> Dedup.minhashEstimates _,
    "q_dedup_simhash"      -> Dedup.simhashPairs _,
    "q_dedup_jaccard"      -> Dedup.jaccardPairs _,
    "q_dedup_clusters"     -> Dedup.nearDupClusters _,
    // embedding near-dup is declared ONLY via the LSH scale path
    // (q_dedup_embed_lsh); the brute-force O(n²) baseline stays test-only
    // as a recall audit (DedupSpec) so no quadratic join is reachable here
    "q_sim_topk"           -> Similarity.cosineTopK _,
    "q_ann_topk"           -> Similarity.annTopK _,
    "q_ivf_assign"         -> Similarity.ivfAssign _,
    "q_ivf_topk"           -> Similarity.ivfTopK _,
    "q_dedup_embed_lsh"    -> Similarity.lshNearDupPairs _,
    "q_text_tfidf"         -> TextAnalysis.tfidf _,
    "q_text_split"         -> TextAnalysis.trainTestSplit _,
    "q_text_tokenstats"    -> TextAnalysis.tokenStats _,
    "q_text_quality"       -> TextAnalysis.qualityScore _,
    "q_text_langid"        -> TextAnalysis.langId _,
    "q_langid_confusion"   -> TextAnalysis.langIdConfusion _,
    "q_text_fingerprint"   -> TextAnalysis.fingerprints _,
    "q_text_pmi"           -> TextAnalysis.pmiPairs _,
    "q_corpus_clean"       -> TextAnalysis.corpusClean _,
    "q_text_repetition"    -> CorpusOps.repetitionStats _,
    "q_text_chunks"        -> CorpusOps.slidingChunks _,
    "q_text_pii"           -> CorpusOps.piiScrub _,
    "q_text_oov"           -> CorpusOps.oovRate _,
    "q_quality_gate"       -> CorpusOps.qualityGate _,
    "q_split_leakage"      -> CorpusOps.splitLeakage _,
    "q_text_logprob"       -> CorpusOps.logProb _,
    "q_text_entropy"       -> CorpusOps.tokenEntropy _,
    "q_dedup_incremental"  -> Dedup.incrementalNew _,
    "q_multimodal_meta"    -> Multimodal.mediaMeta _,
    "q_multimodal_frames"  -> Multimodal.mediaFrames _,
    "q_embed_quantize"     -> Similarity.quantize _,
    "q_events_sessions"    -> StreamingOps.sessionsBatch _,
    "q_events_enriched"    -> StreamingOps.enrichedHourlyBatch _,
    "q_events_attrib"      -> StreamingOps.attributionBatch _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing"        -> Relational.aggPricingSql,
    "q_join_segment"       -> Relational.joinRevenueBySegmentSql,
    "q_join_nation"        -> Relational.joinRevenueByNationSql,
    "q_join_q5"            -> Relational.localSupplierVolumeSql,
    "q_small_qty"          -> Relational.smallQuantityRevenueSql,
    "q_join_semi"          -> Relational.joinSemiSql,
    "q_join_anti"          -> Relational.joinAntiSql,
    "q_join_outer"         -> Relational.joinOuterLineCountsSql,
    "q_sql_shipping"       -> Relational.shippingPrioritySql,
    "q_window_topk"        -> Relational.windowTopOrdersSql,
    "q_window_running"     -> Relational.windowRunningTotalSql,
    "q_setops"             -> Relational.setOpsSql,
    "q_rollup"             -> Relational.rollupQuantitiesSql,
    "q_cube"               -> Relational.cubeOrdersSql,
    "q_events_hourly"      -> Relational.eventsHourlySql,
    "q_events_histogram"   -> Relational.eventsHistogramSql,
    "q_profile_docs"       -> Relational.profileDocsSql,
    "q_events_funnel"      -> Relational.eventsFunnelSql,
    "q_sample_stratified"  -> Relational.sampleStratifiedSql,
    "q_scalar_funcs"       -> Relational.scalarFunctionsSql,
    "q_scalar_dates"       -> Relational.scalarDatesSql,
    "q_events_json"        -> Relational.eventsJsonSql,
    "q_distinct_users"     -> Relational.distinctUsersSql,
    "q_pivot"              -> Relational.pivotOrdersSql,
    "q_unpivot"            -> Relational.unpivotMetricsSql,
    "q_window_analytics"   -> Relational.windowAnalyticsSql,
    "q_string_funcs"       -> Relational.stringFunctionsSql,
    "q_percentiles"        -> Relational.percentilesSql,
    "q_join_salted"        -> Relational.saltedJoinSql,
    "q_topk_agg"           -> Relational.topKAggregatedSql,
    "q_asof_join"          -> Relational.asofJoinSql,
    "q_moment_stats"       -> Relational.momentStatsSql,
    "q_grouping_sets"      -> Relational.groupingSetsSql,
    "q_window_range"       -> Relational.windowRangeSql,
    "q_array_agg"          -> Relational.arrayAggSql,
    "q_setops_all"         -> Relational.setOpsAllSql,
    "q_wordcount"          -> TextPipelineQueries.wordcountSql,
    "q_stopword_antijoin"  -> TextPipelineQueries.stopwordAntiJoinSql,
    "q_chisq_topk"         -> TextPipelineQueries.chisqTopKSql(),
    "q_vocabulary"         -> TextPipelineQueries.vocabularySql(),
    "q_dedup_exact"        -> Dedup.exactSql,
    "q_dedup_minhash"      -> Dedup.minhashCandidatesSql,
    "q_minhash_est"        -> Dedup.minhashEstimatesSql,
    "q_dedup_simhash"      -> Dedup.simhashPairsSql,
    "q_dedup_jaccard"      -> Dedup.jaccardPairsSql,
    "q_dedup_clusters"     -> Dedup.nearDupClustersSql,
    "q_sim_topk"           -> Similarity.cosineTopKSql,
    "q_ann_topk"           -> Similarity.annTopKSql,
    "q_ivf_assign"         -> Similarity.ivfAssignSql,
    "q_ivf_topk"           -> Similarity.ivfTopKSql,
    "q_dedup_embed_lsh"    -> Similarity.lshNearDupPairsSql,
    "q_text_tfidf"         -> TextAnalysis.tfidfSql,
    "q_text_split"         -> TextAnalysis.trainTestSplitSql,
    "q_text_tokenstats"    -> TextAnalysis.tokenStatsSql,
    "q_text_quality"       -> TextAnalysis.qualityScoreSql,
    "q_text_langid"        -> TextAnalysis.langIdSql,
    "q_langid_confusion"   -> TextAnalysis.langIdConfusionSql,
    "q_text_fingerprint"   -> TextAnalysis.fingerprintsSql,
    "q_text_pmi"           -> TextAnalysis.pmiPairsSql,
    "q_corpus_clean"       -> TextAnalysis.corpusCleanSql,
    "q_text_repetition"    -> CorpusOps.repetitionStatsSql,
    "q_text_chunks"        -> CorpusOps.slidingChunksSql,
    "q_text_pii"           -> CorpusOps.piiScrubSql,
    "q_text_oov"           -> CorpusOps.oovRateSql,
    "q_quality_gate"       -> CorpusOps.qualityGateSql,
    "q_split_leakage"      -> CorpusOps.splitLeakageSql,
    "q_text_logprob"       -> CorpusOps.logProbSql,
    "q_text_entropy"       -> CorpusOps.tokenEntropySql,
    "q_dedup_incremental"  -> Dedup.incrementalNewSql,
    "q_multimodal_meta"    -> Multimodal.mediaMetaSql,
    "q_multimodal_frames"  -> Multimodal.mediaFramesSql,
    "q_embed_quantize"     -> Similarity.quantizeSql,
    "q_events_sessions"    -> StreamingOps.sessionsBatchSql,
    "q_events_enriched"    -> StreamingOps.enrichedHourlyBatchSql,
    "q_events_attrib"      -> StreamingOps.attributionBatchSql,
  )
}
