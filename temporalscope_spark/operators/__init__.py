"""Operator surface — flat re-exports for ergonomic imports.

``from temporalscope_spark.operators import shift_target, asof_join, ...``
Every name is also importable from its home module; this is convenience
only, no logic.
"""

from temporalscope_spark.operators.asof import (
    asof_join,
    serve_features,
    backward_fill,
    forward_fill,
    interval_overlap_join,
    range_join,
)
from temporalscope_spark.operators.attribution import attribution
from temporalscope_spark.operators.basket import association_rules, transition_matrix
from temporalscope_spark.operators.experiment import (
    ab_test,
    cuped_adjust,
    chi2_independence,
    covariate_balance,
    did_estimate,
    dispersion_test,
    eb_shrink_means,
    fdr_bh,
    ipw_estimate,
    kruskal_wallis,
    levene_test,
    mann_whitney_u,
    msprt_test,
    permutation_test,
    poisson_bootstrap,
    ratio_metric_test,
    srm_check,
    stratified_att,
    yuen_test,
)
from temporalscope_spark.operators.lifecycle import cohort_retention, funnel_conversion
from temporalscope_spark.operators.corruption import fim_split, span_corruption
from temporalscope_spark.operators.suffix import repeated_substrings, suffix_ranks
from temporalscope_spark.operators.survival import (
    cox_step,
    fit_cox,
    rmst,
    kaplan_meier,
    logrank_test,
    nelson_aalen,
)
from temporalscope_spark.operators.contamination import (
    bloom_bits,
    bloom_contaminated_ids,
    contaminated_ids,
    contamination_rate,
    decontaminate,
    decontaminate_bloom,
    token_ngrams,
)
from temporalscope_spark.operators.cv import (
    entity_split,
    fit_fold_bounds,
    purged_fold_summary,
    purged_time_series_splits,
)
from temporalscope_spark.operators.bpe import (
    apply_bpe,
    bpe_compression_stats,
    learn_bpe_merges,
    word_vocab,
)
from temporalscope_spark.operators.c4 import c4_clean
from temporalscope_spark.operators.wordpiece import (
    apply_wordpiece,
    learn_wordpiece,
    wordpiece_pieces,
    wp_word_vocab,
)
from temporalscope_spark.operators.unigram import (
    apply_unigram,
    piece_seed,
    train_unigram,
    unigram_em_round,
    viterbi_word_tokens,
    word_lattice,
)
from temporalscope_spark.operators.dedup import (
    LineDedupIndex,
    dedup_exact,
    dedup_lines,
    dedup_lines_incremental,
    dup_span_stats,
    line_index,
    merge_line_index,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    remove_dup_spans,
    simhash,
    simhash_near_pairs,
)
from temporalscope_spark.operators.drift import (
    embedding_drift,
    fit_psi_reference,
    ks_drift,
    psi_drift,
    psi_score,
    wasserstein_1d,
)
from temporalscope_spark.operators.dsir import dsir_select, hashed_ngram_features
from temporalscope_spark.operators.coreset import kcenter_select
from temporalscope_spark.operators.edjoin import edit_distance_pairs
from temporalscope_spark.operators.gopher import (
    gopher_quality_flags,
    gopher_repetition_features,
)
from temporalscope_spark.operators.graph import label_propagation, pagerank
from temporalscope_spark.operators.trend import (
    holt_forecast,
    holt_winters_forecast,
    kalman_local_level,
    mann_kendall,
    theil_sen,
)
from temporalscope_spark.operators.retrieval import (
    PostingsIndex,
    bm25_topk,
    bm25_topk_multi,
    build_postings,
    query_likelihood_topk,
)
from temporalscope_spark.operators.lm import (
    bigram_counts,
    good_turing_counts,
    ppl_buckets,
    score_kneser_ney,
    score_stupid_backoff,
    score_unigram,
    unigram_counts,
)
from temporalscope_spark.operators.packing import (
    batch_padding_stats,
    length_bucket_batches,
    pack_concat_chunks,
    pack_greedy,
    training_windows,
)
from temporalscope_spark.operators.binning import fit_quantile_edges, mad_outliers_grouped, quantile_bin, winsorize
from temporalscope_spark.operators.cooccur import cooccurrence_pmi
from temporalscope_spark.operators.corpus_stats import capture_recapture, chao1_richness
from temporalscope_spark.operators.encoding import (
    count_encode,
    target_encode_oof,
    woe_encode,
    woe_iv_table,
    fit_top_categories,
    hash_cross,
    one_hot_top_k,
    rare_collapse,
)
from temporalscope_spark.operators.pca import (
    PCAModel,
    fit_pca,
    fit_pca_array,
    pca_project,
    pca_project_array,
)
from temporalscope_spark.operators.impute import fit_impute, impute
from temporalscope_spark.operators.scaling import (
    ecdf_feature,
    fit_mahalanobis,
    mahalanobis_score,
    fit_scaler,
    mad_outliers,
    moment_profile,
    polynomial_features,
    quantile_normalize,
    scale_by_group,
    scale_features,
)
from temporalscope_spark.operators.vectorize import (
    hashed_features,
    tfidf_cosine_pairs,
    tfidf_table,
)
from temporalscope_spark.operators.relevance import (
    anova_f,
    correlation_matrix,
    feature_relevance,
    numeric_relevance,
    select_features_mrmr,
    spearman_matrix,
)
from temporalscope_spark.operators.tsfeatures import (
    acf_features,
    durbin_watson,
    ljung_box,
    pacf_features,
    calendar_features,
    entity_profile,
    recency_features,
    trend_features,
    fourier_time_features,
    seasonal_decompose,
    series_features,
    dft_features,
)
from temporalscope_spark.operators.padding import (
    mean_fill_pad,
    pad_groups_mean_fill,
    pad_token_arrays,
)
from temporalscope_spark.operators.partitioner import SlidingWindowPartitioner
from temporalscope_spark.operators.resample import interpolate_linear, resample
from temporalscope_spark.operators.rolling import (
    ewma,
    expanding_features,
    rolling_corr,
    rolling_features,
    rolling_row_features,
    target_encode_expanding,
)
from temporalscope_spark.operators.sampling import (
    assign_shards,
    negative_samples,
    deterministic_sample,
    doremi_round,
    stratified_sample,
    temperature_sample,
    top_k_per_group,
    upsample_repeat,
    weighted_sample,
)
from temporalscope_spark.operators.sessionize import (
    session_bounds,
    sessionize,
    sessionize_builtin,
)
from temporalscope_spark.operators.shift import (
    TargetShifter,
    delta_features,
    lag_features,
    multi_step_targets,
    shift_target,
    shift_target_chunked,
    time_to_event,
)
from temporalscope_spark.operators.diffing import fd_violations, table_diff
from temporalscope_spark.operators.geo import haversine_km, proximity_join
from temporalscope_spark.operators.privacy import dp_counts, dp_mean
from temporalscope_spark.operators.scd import scd2_history
from temporalscope_spark.operators.linkage import fs_em_round, fs_link
from temporalscope_spark.operators.layout import (
    column_bounds,
    zorder_key,
    zorder_layout,
)
from temporalscope_spark.operators.pii import (
    PII_PATTERNS,
    k_anonymity,
    l_diversity,
    pii_scan,
    redact_pii,
)
from temporalscope_spark.operators.pq import pq_codebooks, pq_encode, pq_topk
from temporalscope_spark.operators.preference import dpo_pairs
from temporalscope_spark.operators.similarity import (
    ann_topk,
    centroid_distance_features,
    cosine_self_join_pairs,
    cosine_topk,
    ivf_centroids,
    ivf_topk,
    margin_mining,
    mmr_rerank,
    prototype_prune,
    semdedup,
    with_ivf_cell,
    with_lsh_bucket,
)

__all__ = [
    "asof_join", "backward_fill", "forward_fill", "range_join", "serve_features",
    "interval_overlap_join",
    "bloom_bits", "bloom_contaminated_ids", "contaminated_ids",
    "contamination_rate", "decontaminate", "decontaminate_bloom", "token_ngrams",
    "entity_split", "fit_fold_bounds", "purged_fold_summary",
    "purged_time_series_splits",
    "dedup_exact", "dedup_lines", "dedup_lines_incremental", "line_index",
    "merge_line_index", "LineDedupIndex", "dup_span_stats", "minhash_lsh_pairs",
    "minhash_signatures", "ngram_jaccard_pairs", "remove_dup_spans",
    "simhash", "simhash_near_pairs", "pagerank", "label_propagation",
    "PII_PATTERNS", "k_anonymity", "pii_scan", "redact_pii",
    "learn_bpe_merges", "word_vocab", "apply_bpe", "bpe_compression_stats",
    "piece_seed", "train_unigram", "unigram_em_round", "word_lattice",
    "viterbi_word_tokens", "apply_unigram", "c4_clean",
    "learn_wordpiece", "wordpiece_pieces", "apply_wordpiece", "wp_word_vocab",
    "PostingsIndex", "bm25_topk", "bm25_topk_multi", "build_postings",
    "query_likelihood_topk",
    "dsir_select", "hashed_ngram_features",
    "ks_drift", "psi_drift", "fit_psi_reference", "psi_score", "embedding_drift",
    "gopher_quality_flags", "gopher_repetition_features",
    "bigram_counts", "good_turing_counts", "ppl_buckets", "score_kneser_ney",
    "score_stupid_backoff", "score_unigram", "unigram_counts",
    "pack_concat_chunks", "pack_greedy", "training_windows",
    "length_bucket_batches", "batch_padding_stats",
    "mann_kendall", "theil_sen", "holt_forecast", "holt_winters_forecast",
    "kalman_local_level",
    "acf_features", "calendar_features", "entity_profile",
    "fourier_time_features", "recency_features", "trend_features",
    "seasonal_decompose", "series_features", "dft_features",
    "feature_relevance", "numeric_relevance", "anova_f", "spearman_matrix",
    "select_features_mrmr",
    "correlation_matrix", "cooccurrence_pmi",
    "fit_quantile_edges", "mad_outliers_grouped", "quantile_bin", "winsorize",
    "ecdf_feature", "fit_scaler", "mad_outliers", "moment_profile", "quantile_normalize",
    "polynomial_features", "scale_by_group",
    "scale_features", "fit_impute", "impute",
    "PCAModel", "fit_pca", "fit_pca_array", "pca_project", "pca_project_array",
    "tfidf_cosine_pairs", "tfidf_table", "hashed_features", "mann_whitney_u",
    "permutation_test", "covariate_balance", "srm_check", "ipw_estimate",
    "msprt_test", "fs_link", "fs_em_round", "cox_step", "fit_cox", "stratified_att",
    "kruskal_wallis", "levene_test", "yuen_test", "eb_shrink_means",
    "capture_recapture", "chao1_richness", "dispersion_test", "ratio_metric_test",
    "rmst",
    "table_diff", "fd_violations", "haversine_km", "proximity_join",
    "dp_counts", "dp_mean", "wasserstein_1d", "fit_mahalanobis", "mahalanobis_score",
    "scd2_history", "durbin_watson", "ljung_box", "pacf_features",
    "count_encode", "fit_top_categories", "hash_cross", "one_hot_top_k",
    "rare_collapse", "target_encode_oof", "woe_encode", "woe_iv_table",
    "mean_fill_pad", "pad_groups_mean_fill", "pad_token_arrays",
    "SlidingWindowPartitioner",
    "interpolate_linear", "resample",
    "ewma", "expanding_features", "rolling_corr", "rolling_features",
    "rolling_row_features",
    "target_encode_expanding",
    "assign_shards", "deterministic_sample", "negative_samples", "stratified_sample",
    "temperature_sample", "top_k_per_group", "upsample_repeat",
    "weighted_sample", "doremi_round",
    "session_bounds", "sessionize", "sessionize_builtin",
    "TargetShifter", "delta_features", "lag_features", "multi_step_targets",
    "shift_target", "shift_target_chunked", "time_to_event",
    "ann_topk", "centroid_distance_features", "cosine_self_join_pairs",
    "cosine_topk", "ivf_centroids",
    "ivf_topk", "margin_mining", "mmr_rerank", "prototype_prune", "semdedup", "with_ivf_cell", "with_lsh_bucket",
    "dpo_pairs",
    "repeated_substrings", "suffix_ranks",
]
