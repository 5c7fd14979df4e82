package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EtlQueries, JoinQueries, OlapQueries, RefQueries, SimilarityQueries, StreamQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (re-expressed over the driver's testdata tables); `oracleSql` the
  * DuckDB-runnable twin with identical column aliases and ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The notebook's top-k-by-mean-aggregate shape (analysis.ipynb cell 4)
    * over testdata: top-10 parts by revenue.
    */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q8TopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_split_part" -> (RefQueries.q1SplitPart _),
    "q2_cte" -> (RefQueries.q2Cte _),
    "q3_group_avg" -> (RefQueries.q3GroupAvg _),
    "q4_round" -> (RefQueries.q4Round _),
    "q5_join_inner" -> (RefQueries.q5Join _),
    "q5_salted_join" -> (RefQueries.q5SaltedJoin _),
    "q6_view" -> (RefQueries.q6View _),
    "q7_group_avg_over_join" -> (RefQueries.q7GroupAvgOverJoin _),
    "q8_topk" -> (RefQueries.q8TopK _),
    "q9_full_select" -> (RefQueries.q9Select _),
    "join_asof" -> (JoinQueries.joinAsOf _),
    "join_range" -> (JoinQueries.joinRange _),
    "q10_semi_anti" -> (JoinQueries.q10SemiAnti _),
    "q11_outer_join" -> (JoinQueries.q11OuterJoin _),
    "q12_set_ops" -> (JoinQueries.q12SetOps _),
    "olap_count_distinct" -> (OlapQueries.olapCountDistinct _),
    "olap_topk_per_group" -> (OlapQueries.olapTopkPerGroup _),
    "olap_percentile" -> (OlapQueries.olapPercentile _),
    "text_term_freq" -> (TextQueries.textTermFreq _),
    "etl_sample" -> (EtlQueries.etlSample _),
    "etl_upsert" -> (EtlQueries.etlUpsert _),
    "olap_rollup" -> (OlapQueries.olapRollup _),
    "olap_cube" -> (OlapQueries.olapCube _),
    "olap_grouping_sets" -> (OlapQueries.olapGroupingSets _),
    "olap_pivot" -> (OlapQueries.olapPivot _),
    "analytics_window" -> (OlapQueries.analyticsWindow _),
    "etl_cell_scrub" -> (EtlQueries.etlCellScrub _),
    "etl_date_parse" -> (EtlQueries.etlDateParse _),
    "etl_drop_last_n" -> (EtlQueries.etlDropLastN _),
    "etl_json_extract" -> (EtlQueries.etlJsonExtract _),
    "etl_full_clean" -> (EtlQueries.etlFullClean _),
    "text_tokens" -> (TextQueries.textTokens _),
    "text_quality" -> (TextQueries.textQuality _),
    "text_langid" -> (TextQueries.textLangid _),
    "text_fingerprint" -> (TextQueries.textFingerprint _),
    "dedup_exact" -> (TextQueries.dedupExact _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
    "corpus_curate" -> (TextQueries.corpusCurate _),
    "sim_topk_bruteforce" -> (SimilarityQueries.simTopK _),
    "sim_ann_lsh" -> (SimilarityQueries.simAnnLsh _),
    "sim_ann_ivf" -> (SimilarityQueries.simAnnIvf _),
    "dedup_minhash_lsh" -> (SimilarityQueries.dedupMinhash _),
    "dedup_simhash" -> (SimilarityQueries.dedupSimhash _),
    "dedup_embedding_cosine" -> (SimilarityQueries.dedupEmbeddingCosine _),
    "stream_window_agg" -> (StreamQueries.streamWindowAgg _),
    "stream_sessionize" -> (StreamQueries.streamSessionize _),
    "stream_join_interval" -> (StreamQueries.streamJoinInterval _),
    "multimodal_meta" -> (StreamQueries.multimodalMeta _),
    "multimodal_features" -> (StreamQueries.multimodalFeatures _),
    "multimodal_ppm_decode" -> (StreamQueries.multimodalPpm _),
    "multimodal_png_decode" -> (StreamQueries.multimodalPng _),
    "multimodal_wav_decode" -> (StreamQueries.multimodalWav _),
    "multimodal_resize" -> (StreamQueries.multimodalResize _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_split_part" -> RefQueries.q1Sql,
    "q2_cte" -> RefQueries.q2Sql,
    "q3_group_avg" -> RefQueries.q3Sql,
    "q4_round" -> RefQueries.q4Sql,
    "q5_join_inner" -> RefQueries.q5Sql,
    "q5_salted_join" -> RefQueries.q5Sql,
    "q6_view" -> RefQueries.q6Sql,
    "q7_group_avg_over_join" -> RefQueries.q7Sql,
    "q8_topk" -> RefQueries.q8Sql,
    "q9_full_select" -> RefQueries.q9Sql,
    "join_asof" -> JoinQueries.joinAsOfSql,
    "join_range" -> JoinQueries.joinRangeSql,
    "q10_semi_anti" -> JoinQueries.q10SemiAntiSql,
    "q11_outer_join" -> JoinQueries.q11OuterJoinSql,
    "q12_set_ops" -> JoinQueries.q12SetOpsSql,
    "olap_count_distinct" -> OlapQueries.olapCountDistinctSql,
    "olap_topk_per_group" -> OlapQueries.olapTopkPerGroupSql,
    "olap_percentile" -> OlapQueries.olapPercentileSql,
    "text_term_freq" -> TextQueries.textTermFreqSql,
    "etl_sample" -> EtlQueries.etlSampleSql,
    "etl_upsert" -> EtlQueries.etlUpsertSql,
    "olap_rollup" -> OlapQueries.olapRollupSql,
    "olap_cube" -> OlapQueries.olapCubeSql,
    "olap_grouping_sets" -> OlapQueries.olapGroupingSetsSql,
    "olap_pivot" -> OlapQueries.olapPivotSql,
    "analytics_window" -> OlapQueries.analyticsWindowSql,
    "etl_cell_scrub" -> EtlQueries.etlCellScrubSql,
    "etl_date_parse" -> EtlQueries.etlDateParseSql,
    "etl_drop_last_n" -> EtlQueries.etlDropLastNSql,
    "etl_json_extract" -> EtlQueries.etlJsonExtractSql,
    "etl_full_clean" -> EtlQueries.etlFullCleanSql,
    "text_tokens" -> TextQueries.textTokensSql,
    "text_quality" -> TextQueries.textQualitySql,
    "text_langid" -> TextQueries.textLangidSql,
    "text_fingerprint" -> TextQueries.textFingerprintSql,
    "dedup_exact" -> TextQueries.dedupExactSql,
    "dedup_ngram_jaccard" -> TextQueries.dedupNgramJaccardSql,
    "corpus_curate" -> TextQueries.corpusCurateSql,
    "sim_topk_bruteforce" -> SimilarityQueries.simTopKSql,
    "sim_ann_lsh" -> SimilarityQueries.simAnnLshSql,
    "sim_ann_ivf" -> SimilarityQueries.simAnnIvfSql,
    "dedup_minhash_lsh" -> SimilarityQueries.dedupMinhashSql,
    "dedup_embedding_cosine" -> SimilarityQueries.dedupEmbeddingCosineSql,
    "dedup_simhash" -> SimilarityQueries.dedupSimhashSql,
    "stream_window_agg" -> StreamQueries.streamWindowAggSql,
    "stream_sessionize" -> StreamQueries.streamSessionizeSql,
    "stream_join_interval" -> StreamQueries.streamJoinIntervalSql,
    "multimodal_meta" -> StreamQueries.multimodalMetaSql,
    "multimodal_features" -> StreamQueries.multimodalFeaturesSql,
    "multimodal_ppm_decode" -> StreamQueries.multimodalPpmSql,
    "multimodal_png_decode" -> StreamQueries.multimodalPngSql,
    "multimodal_wav_decode" -> StreamQueries.multimodalWavSql,
    "multimodal_resize" -> StreamQueries.multimodalResizeSql,
  )
}
