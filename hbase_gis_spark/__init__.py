"""hbase_gis_spark — a PySpark-native spatial + training-data analytics engine.

Re-expresses the query capabilities of the reference system
(stackabletech/hbase-gis: geohash-rowkey HBase tables with within-polygon,
KNN, and grouped-top-X queries — see SURVEY.md) as idiomatic Spark
DataFrame transformations, and extends them with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): composable DataFrame transformers, no RDDs,
geometry as plain (lon double, lat double) columns, WKT only as query-time
parameters. Heavy lifting stays JVM-side via pyspark.sql.functions:
geohash encode is a pure-Column Morton/base32 expression, convex
within() is codegen'd half-plane comparisons, and the remaining Python
paths (concave ray-cast, media decode, streaming state) are always
Arrow-batched.
"""

from hbase_gis_spark.geo import geohash, geometry, planner  # noqa: F401
from hbase_gis_spark.geo.geojson import results_to_geojson  # noqa: F401
from hbase_gis_spark.operators.within import within  # noqa: F401
from hbase_gis_spark.operators.spatial_join import (  # noqa: F401
    dbscan,
    distance_join,
    spatial_join,
)
from hbase_gis_spark.operators.asof import asof_join, interval_join  # noqa: F401
from hbase_gis_spark.operators.knn import (  # noqa: F401
    knn,
    knn_multi,
    knn_per_region,
    with_distance,
    within_radius,
)
from hbase_gis_spark.operators.topx import top_x, binned_limit  # noqa: F401
from hbase_gis_spark.session import make_session  # noqa: F401
from hbase_gis_spark.sqlapi import (  # noqa: F401
    bbox_sql,
    geohash_prefix_sql,
    global_percentiles_sql,
    haversine_distance_sql,
    lang_id_sql,
    minhash_band_sql,
    planar_distance_sql,
    quantile_transform_sql,
    register_sql_api,
    sharded_ntile_sql,
    simhash_sql,
    tokens_sql,
    within_convex_sql,
    word_shingles_sql,
)
from hbase_gis_spark.operators.dedup import (  # noqa: F401
    cell_footprint_pairs,
    containment_pairs,
    cluster_representatives,
    append_catalog_postings,
    dedup_incremental,
    dedup_incremental_bucketed,
    dedup_incremental_stored,
    write_catalog_postings,
    write_catalog_postings_bucketed,
    dedup_recall_report,
    dup_ngram_spans,
    dup_substring_spans,
    remove_dup_spans,
    substring_dedup_profile,
    edit_distance_pairs,
    fuzzy_join_edit1,
    near_dup_clusters,
    winnow_fingerprints,
    dedup_exact,
    dedup_impact,
    embedding_dup_lsh,
    embedding_dup_pairs,
    jaccard_pairs,
    jaccard_pairs_prefix,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
    ngram_novelty,
    segment_dup_stats,
    split_assign,
    stratified_sample,
    tfidf_cosine_pairs,
)
from hbase_gis_spark.operators.similarity import (  # noqa: F401
    ann_hamming_rerank_topk,
    ann_hamming_topk,
    ann_hamming_topk_stored,
    write_signature_table,
    ann_ivf_topk,
    ann_ivf_topk_multi,
    append_ivf_table,
    ann_ivfpq_topk,
    ann_recall_report,
    ann_range_search,
    cosine_topk_multi,
    embedding_norm_stats,
    label_purity,
    ann_ivf_topk_stored,
    ann_ivfpq_topk_stored,
    ann_lsh_topk,
    cosine_topk,
    cosine_topk_filtered,
    ivf_prototypes,
    ivf_reassign_delta,
    ivf_reassign_report,
    label_centroid_separation,
    mrl_truncation_report,
    embedding_outliers,
    pca_project,
    pq_adc_topk,
    semdedup,
    train_ivf_centroids,
    train_pca,
    train_pq_codebooks,
    write_ivf_table,
    write_ivfpq_table,
)
from hbase_gis_spark.operators.textstats import (  # noqa: F401
    bigram_lm_score,
    bpe_learned_counts,
    bpe_pair_counts,
    bpe_token_count,
    clean_text,
    fingerprint,
    lang_id,
    ngram_contamination,
    heaps_law_fit,
    ngram_coverage_curve,
    source_vocab_jaccard,
    pack_sequences,
    quality_classifier,
    readability_scores,
    quality_features,
    repetition_stats,
    term_stats,
    tfidf_topk_terms,
    token_count,
    token_fertility,
    unigram_lm_score,
    vocab_coverage,
    bm25_topk,
    boilerplate_coverage,
    boilerplate_ngrams,
    doc_length_histogram,
    ngram_diversity,
    collocations_pmi,
    vocab_drift,
    zipf_fit,
)
from hbase_gis_spark.operators.multimodal import (  # noqa: F401
    attach_fake_audio,
    audio_decode_real,
    attach_fake_media,
    attach_fake_video,
    audio_features,
    clip_audio,
    block_phash,
    decode_media,
    frame_sample,
    media_dup_phash,
    media_phash,
    video_features,
    video_frame_sample,
)
from hbase_gis_spark.streaming.events import (  # noqa: F401
    dedup_events,
    latest_rollup_version,
    maintain_rollup_stream,
    purchase_view_attribution,
    streaming_daily_anomalies,
    streaming_decontaminate,
    streaming_dedup_incremental_stored,
    streaming_first_seen,
    streaming_histogram_counts,
    streaming_orphan_counts,
    streaming_psi_counts,
    streaming_top_x_earliest,
    user_sessions,
    windowed_event_counts,
)
from hbase_gis_spark.operators.corpus import (  # noqa: F401
    chunk_documents,
    dataset_card,
    domain_cap,
    global_shuffle,
    k_anonymity_report,
    l_diversity_report,
    mixture_rates,
    mixture_sample,
    pii_scrub,
    profile_table,
    rare_category_collapse,
    salted_join,
    target_encoding_loo,
    skew_report,
    temperature_mixture,
    token_budget_sample,
    winsorize,
    write_training_shards,
    contamination_report,
    group_sample_k,
    quality_resample,
    t_closeness_report,
    weighted_sample_k,
    weighted_sample_k_per_group,
    ablation_ladder,
)
from hbase_gis_spark.operators.graph import (  # noqa: F401
    association_rules,
    cooccurrence_edges,
    event_type_edges,
    lpa_communities,
    node_jaccard,
    pagerank_int,
    triangle_stats,
)
from hbase_gis_spark.operators.layout import (  # noqa: F401
    append_hilbert_table,
    append_zorder_table,
    hilbert_key_2d,
    read_curve_bounds,
    write_hilbert_table,
    write_zorder_table,
    zorder_key_2d,
)
from hbase_gis_spark.operators.timeseries import (  # noqa: F401
    autocorr_lag,
    cumulative_users,
    cusum_days,
    naive_backtest,
    weekday_adjusted_anomalies,
    dense_daily_counts,
    mad_anomalies,
    seasonal_decompose_daily,
    weekday_profile,
    theil_sen_slope,
    mann_kendall_trend,
    daily_fano_factor,
    event_debounce,
    churn_hazard,
    rolling_corr,
)
from hbase_gis_spark.operators.quality import (  # noqa: F401
    behavior_entropy,
    benford_first_digit,
    bootstrap_means,
    cross_split_leakage,
    fd_audit,
    split_balance,
    join_cardinality_audit,
    referential_orphans,
    uniqueness_audit,
    sequence_gap_audit,
    forget_audit,
    apply_forget,
    srm_check,
)
from hbase_gis_spark.operators.merge import (  # noqa: F401
    merge_upsert,
    scd2_intervals,
    snapshot_diff,
    incremental_rollup,
)
from hbase_gis_spark.operators.drift import (  # noqa: F401
    chi_square_independence,
    gini_coefficient,
    moments_report,
    welch_t_test,
    global_quantile_cuts,
    histogram_range,
    profile_diff,
    spearman_corr,
    psi_cuts,
    value_histogram,
    value_psi,
    lorenz_curve,
    pareto_threshold,
)
from hbase_gis_spark.operators.rank import (  # noqa: F401
    apply_range_shards,
    global_half_ranks,
    global_percentiles,
    quantile_transform,
    range_sharded,
    shard_boundaries,
    shard_offsets,
    sharded_ntile,
)
from hbase_gis_spark.operators.funnel import (  # noqa: F401
    conversion_lag,
    funnel_counts,
    window_funnel,
    retention_cohorts,
    position_attribution,
    time_decay_attribution,
)
from hbase_gis_spark.operators.retrieval import (  # noqa: F401
    hybrid_rrf_topk,
    mmr_rerank,
    mmr_rerank_multi,
    rrf_fuse,
)
from hbase_gis_spark.sources.bucketed import (  # noqa: F401
    bucketed_join_plan_is_shuffle_free,
    read_bucketed_table,
    write_bucketed_table,
)
from hbase_gis_spark.sources.corpus_io import (  # noqa: F401
    compact_parquet,
    jsonl_to_parquet,
    read_documents_jsonl,
    read_documents_orc,
    write_documents_jsonl,
    write_documents_orc,
)
from hbase_gis_spark.sources.ingest import (  # noqa: F401
    bulk_points,
    ingest_points_tsv,
    ingest_taxi_csv,
    read_geo_table,
    write_geo_table,
)

__version__ = "0.1.0"
