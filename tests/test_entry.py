"""Driver-contract smoke tests: entry() runs, registry is consistent."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "sim", "source"]


def test_registry_consistent():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "no queries registered"
    # every oracle key must have a query
    assert set(o) <= set(q)


def test_driver_order_covers_registry_exactly():
    """The explicit driver enumeration must stay in sync with the
    registry (a new query missing from _DRIVER_ORDER still runs, but
    flag it so it gets a deliberate priority slot), and the head-50
    must contain the families the r02 driver file dropped."""
    q = entry_mod.queries()
    assert set(entry_mod._DRIVER_ORDER) == set(q), (
        "registry and _DRIVER_ORDER diverge: "
        f"{set(q) ^ set(entry_mod._DRIVER_ORDER)}"
    )
    head = list(q)[:50]
    # family representatives: window_rank's slot passed to
    # window_range_time when it rotated to the tail with r1-r5 greens;
    # udtf_chunk_fixed's (green r5) passed to arrow_grouped_seq when
    # the applyInArrow form rotated in (session-close wave) — the
    # python-kernel family row is grouped_map_order_seq + the Arrow
    # grouped map
    # corpus_clean's slot passed to pretrain_corpus and
    # text_stats_by_lang's to rerank_topk (both displaced with
    # multi-round greens in the session-close rotation)
    # (grouped_map_order_seq and contamination_ngram rotated to the
    # tail with green r5 rows for the null-safe/subquery additions;
    # arrow_grouped_seq carries the python-kernel family row)
    # r7: knn_topk and dedup_minhash rotated to the tail (multi-round
    # greens; knn_topk still runs via entry()) so the 7 never-driver-
    # recorded oracle queries get their first ledger rows — pin them.
    # mid-r7: knn_label_eval then knn_auto (green rows) rotated to the
    # tail so the new oracle-backed knn_filtered and knn_int8 get
    # their first driver rows.
    # r8: the four new oracle-backed queries take head-50 slots from
    # variant_funcs / bm25_topk / hybrid_rrf / funnel_conversion
    # (green r6+r7; ansi_try_funcs, rerank_topk and cohort_retention
    # keep those families' rows) — pin them.
    # r13: knn_binary + knn_matryoshka rotated to the tail (green
    # r8+r12; the quantized family keeps six head rows) for the
    # promoted simhash oracle twin and the ROUGE/BLEU eval metrics.
    # r15: dedup_simhash_exact + eval_rouge_bleu + corpus_zipf_fit
    # rotated to the tail (green r13+r14 per the two-green rule;
    # zipf's r14 row ran the salted plan, cleared by VERDICT r14's
    # rotation note) for the ann_ivf_exact md5 twin and the
    # lm_bigram_score / quality_filter_stack re-promotions (the
    # stalest driver rows in the registry — last rows r8 — and the
    # two queries this round's sf100 lm/quality gates re-measure).
    # r15 also: ansi_try_funcs and arrow_text_stats rotated to the
    # tail (green r6-r14, the head's two longest streaks) for
    # ann_lsh_exact and ann_pq_exact — the LSH and PQ legs of the
    # ANN ladder's twin promotion, closing the ladder.
    for must in ("ann_ivf_exact", "ann_lsh_exact", "ann_pq_exact",
                 "lm_bigram_score",
                 "quality_filter_stack",
                 # r10: outlier_mad / token_budget_select /
                 # agg_percentile rotated to the tail (green r8+r9 /
                 # r8+r9 / r6-r9) for the three new oracle queries.
                 "rfm_scores", "fingerprint_winnow",
                 "conversion_latency_quantiles",
                 # r10: knn_filtered rotated to the tail (green
                 # r7/r8 + r9 head row) so the fixed
                 # decayed_engagement gets its first driver row.
                 # (lake_compact_files dropped from the pins: the r9
                 # rotation moved it to the tail for
                 # window_gaps_islands, but the stale pin was masked
                 # by the set-equality assert failing first)
                 # r10: knn_int8 rotated to the tail (green r8+r9)
                 # for the composed filter x SQ8 x batch query.
                 "knn_filtered_int8_batch",
                 "decayed_engagement", "lake_zorder_scan",
                 "cms_term_freq",
                 # r10: dedup_incremental rotated to the tail (green
                 # r8+r9) for the FFD packing oracle query.
                 # r10: rerank_topk + pretrain_corpus rotated to the
                 # tail (4 green driver rows each) for the phrase
                 # retrieval + histogram-stats queries.
                 # r12: histogram_equi_depth rotated to the tail
                 # (green r10+r11) so the promoted recursive-splitter
                 # oracle query gets its first driver row.
                 "seq_pack_ffd", "chunk_split_exact",
                 "arrow_grouped_seq",
                 "window_range_time", "quality_lr_score_fixed",
                 "phrase_search", "join_null_safe",
                 "join_bucketed_colocated",
                 "sql_correlated_subqueries",
                 # (gopher_repetition rotated to the tail in r11 —
                 # green r7-r10 — for the composed filtered indexed
                 # serving query)
                 "knn_binary_batch", "knn_auto_filtered_batch",
                 # (set_ops_all rotated to the tail in r11 — green
                 # r7-r10 — for the fixed-point PageRank oracle query;
                 # source_mixture_weights likewise for the fixed-table
                 # BPE inference leg)
                 "graph_pagerank_exact", "bpe_apply_fixed",
                 # (window_ntile rotated to the tail in r10 — 3 green
                 # driver rows — for the ROC-AUC evaluate leg)
                 # (vocab_topk rotated to the tail in r11 — green
                 # r7-r10 — for the fixed-point MMR oracle query)
                 # (lr_auc rotated to the tail in r12 — green r10+r11
                 # — for the fixed-point trainer-loop oracle query)
                 "udtf_dynamic_schema", "mmr_rerank_exact",
                 "quality_lr_train_fixed",
                 # r9: six new oracle-backed queries take head-50
                 # slots from knn_auto_indexed / cohort_retention /
                 # event_transitions / basket_lift / latest_per_key /
                 # sample_group_topk (each green r7+r8 or r6-r8;
                 # every displaced family keeps head representatives)
                 # (dedup_semantic_clusters rotated to the tail in
                 # r10 — 4 green driver rows — for chunk_cdc;
                 # chunk_cdc itself to the tail in r12 — green
                 # r10+r11 — for the promoted seq_pack oracle query)
                 "seq_pack",
                 # (dsir_select rotated to the tail in r12 — green
                 # r9-r11 — for the BPE-training oracle query)
                 "semdedup_prune", "bpe_train_exact",
                 "sql_recursive_cte",
                 "sql_lateral_topk", "contamination_bloom",
                 "dedup_ppjoin", "quality_char_entropy",
                 "dsir_resample", "graph_triangles",
                 # (knn_int8_batch + knn_matryoshka_batch rotated to
                 # the tail in r14 — green r9+r12+r13 — for the
                 # eval_rouge_l and dedup_minhash_exact oracle
                 # queries)
                 "mixture_temperature", "eval_rouge_l",
                 "seq_pack_ffd",
                 "dedup_minhash_exact", "multivec_maxsim_batch",
                 "pareto_frontier", "interval_concurrency",
                 "path_mining_3step",
                 # (grouped_linreg rotated to the tail in r12 — green
                 # r9-r11 — for the eigen power-iteration oracle query)
                 "lr_calibration_deciles", "embed_pca_power_fixed",
                 "window_gaps_islands"):
        assert must in head


def test_all_queries_run_smoke(spark, sf_dir):
    """Every registered query must at least execute at sf0.001."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        df.limit(5).collect()
