"""Driver-window rotation for the correctness gate.

The external driver verifies the FIRST 50 entries of :data:`QUERIES` in
registration order per round (CORRECTNESS_r01 checked exactly
``list(QUERIES)[:50]``).  With 174+ registered queries, a static order
would leave most of the surface driver-unverified forever.  This module
pins an explicit order instead:

1. ``DRIVER_WINDOW`` — the 50 names this round's driver run must check:
   queries whose output or oracle changed this round (must re-verify)
   plus the highest-priority never-checked queries.
2. everything else not yet driver-green (any newly added query lands
   here automatically), in registration order.
3. ``DRIVER_GREEN`` — names already verified green by a previous round's
   driver run, deprioritized to the back.

Update both lists once per round from ``CORRECTNESS_r{N}.json``: move
newly green names into DRIVER_GREEN and refill DRIVER_WINDOW with the
next unchecked batch.  ``tools/parity.py`` still checks ALL queries
locally every run, so rotation never weakens local coverage.
"""

from __future__ import annotations

# Round 2 window: 5 changed-output queries (et17 driver FAIL fix; et16/et22
# new oracles; tx16/ss08 de-arrayed) + 2 fixed-this-round relational queries
# (q85 scale fix, q93 try_cast fix) + the first 43 never-checked SURVEY-core
# relational mappings.
DRIVER_WINDOW: list[str] = [
    "et17_skew_profile",
    "et16_lttb_downsample",
    "et22_ewma_smoothing",
    "tx16_inverted_postings",
    "ss08_label_centroids",
    "q85_null_ordering",
    "q93_try_function_surface",
    # outputs/schemas changed by the late-round-2 review fixes, so they
    # must (re-)verify this round: mm01 was driver-green in r01 but its
    # resize targets now derive from the rounded scale; mm05 shares the
    # formula; tx15/pipe02 lost redundant trailing chunks; sm11's rank
    # dtype widened to bigint (as did q85's, already windowed above).
    # They take the slots of q02/q03/q18/q19/q21 (lowest-canonicalizer-
    # risk core mappings — round-3 refill picks them up).
    "mm01_decode_resize",
    "mm05_patch_grid",
    "tx15_rag_chunks",
    "pipe02_rag_corpus",
    "sm11_shuffle_order",
    "q01_pricing_summary",
    "q04_next_run_id",
    "q05_date_trunc_daily",
    "q06_latest_order_per_customer",
    "q07_exists_semi_join",
    "q08_not_exists_anti_join",
    "q09_multiway_join_revenue",
    "q10_decode_status_matrix",
    "q12_topk_orders",
    "q14_string_agg_ordered",
    "q15_window_running",
    "q16_rollup",
    "q17_cube",
    "q20_json_props",
    "q22_asof_join",
    "q23_range_join_bands",
    "q24_full_outer_join",
    "q25_pivot_linestatus",
    "q26_percentiles",
    "q27_sessionize",
    "q30_field_counter",
    "q31_nth_field",
    "q32_atoi_priority",
    "q33_datediff_hms",
    "q34_check_date_codes",
    "q35_shipping_priority",
    # changed-this-round: new exact oracles for formerly rows-only
    # iterative ops + the new substring-dedup operator — verified here so
    # any driver-canonicalizer quirk (vs local parity) surfaces this round
    "ss04_kmeans_clusters",
    "ss05_doc_pagerank",
    "ss07_mmr_topk",
    "dd11_hot_span_scrub",
    # brand-new this round (new operators, new oracles — highest quirk
    # risk, so they take the window slots of three low-risk relational
    # mappings q39-q41, which move to the round-3 refill)
    "dd12_semantic_dedup",
    "ss10_pq_ann",
    "tx17_bigram_lm_score",
    "ss11_random_projection",
    "et25_count_min_freq",
    # late round-2 additions (new operators, new oracles): take the slots
    # of q38 (rows-only — a window slot buys no hash check there), q11
    # and q13 (native-typed string filter / union — lowest canonicalizer
    # risk of the core tier; round-3 refill picks them up)
    "tx19_vocab_heavy_hitters",
    "q97_skyline_pareto",
    "ev15_peak_concurrency",
]

# ROUND 3 PREP (written end of round 2): once CORRECTNESS_r02.json
# lands, (1) append the newly green window names to DRIVER_GREEN,
# (2) refill DRIVER_WINDOW from the still-unchecked middle tier, in
# priority order: q02/q03/q11/q13/q18/q19/q21/q38 (displaced this
# round), q39–q41,
# q42..q84, q86..q94 relational (minus q85/q93 if green), then
# q95/q96/q98, tx03–tx15, tx20, sm03–sm09, dd08–dd10, ss06/ss09,
# ss12/ss13, mm03/mm04, et23/et24, et26/et27, ev13/ev14/ev16,
# pipe01–04 — about 100 names, so rounds 3–4 complete the sweep.  Run
# `python tools/rotate.py CORRECTNESS_r02.json --write` to do this
# mechanically (--prepend for round-3 changed queries).
# tests/test_rotation.py pins the invariants.

# Driver-green in CORRECTNESS_r01.json (rows+schema+hash all true, or
# rows-only by design with no change since).  Deprioritized to the back
# of the registry so the driver window reaches unchecked queries first.
DRIVER_GREEN: list[str] = [
    "et01_scd2_merge",
    "et02_profile_columns",
    "et03_fk_audit",
    "et04_rollup_cascade",
    "et05_hierarchy_levels",
    "et06_table_checksum",
    "et07_sketch_rollup",
    "et08_snapshot_diff",
    "et09_expectations",
    "et10_apply_changelog",
    "et11_fuzzy_match",
    "et12_fifo_allocation",
    "et13_incremental_agg",
    "et14_mad_outliers",
    "et15_triangle_count",
    "et18_sequence_gaps",
    "et19_benford_audit",
    "et20_point_in_time_join",
    "et21_bitmap_distinct",
    "ev01_funnel",
    "ev02_retention_cohorts",
    "ev03_active_users",
    "ev04_top_paths",
    "ev05_asof_operator",
    "ev06_interpolate_at_clicks",
    "ev07_session_window_builtin",
    "ev08_time_weighted_avg",
    "ev09_ohlc_bars",
    "ev10_markov_transitions",
    "ev11_time_since_purchase",
    "ev12_windowed_funnel",
    "dd01_dedup_exact",
    "dd02_fingerprint",
    "dd03_ngram_jaccard",
    "dd04_minhash_lsh",
    "dd05_simhash",
    "dd06_embedding_neardup",
    "dd07_neardup_clusters",
    "ss01_cosine_topk",
    "ss02_lsh_bucketed_ann",
    "ss03_ivf_ann",
    "mm01_decode_resize",
    "mm02_frame_sample",
    "sm01_hash_sample",
    "sm02_stratified_sample",
    "tx01_text_stats",
    "tx02_langid",
]


def reorder(queries: dict) -> None:
    """Rebuild the registry dict in driver-window order, in place.

    ``QUERIES`` is imported by name elsewhere, so the dict object must be
    mutated rather than replaced.  Unknown names in the lists are skipped
    (robust to renames); names in neither list form the middle tier,
    sorted SURVEY-core-first (see below), otherwise registration order.
    """
    window = [n for n in DRIVER_WINDOW if n in queries]
    green = {n for n in DRIVER_GREEN if n not in DRIVER_WINDOW}
    middle = [n for n in queries if n not in set(window) and n not in green]
    # SURVEY-core relational mappings (qNN_*) lead the middle tier so the
    # next rotation's refill (tools/rotate.py consumes registry order)
    # verifies the core surface before engine extensions; non-q names
    # keep registration order behind them (stable sort).
    def _prio(n: str) -> tuple:
        num = n[1:].split("_", 1)[0]
        if n[0] == "q" and num.isdigit():
            return (0, int(num))
        return (1, 0)

    middle.sort(key=_prio)
    tail = [n for n in queries if n in green]
    items = {n: queries[n] for n in (*window, *middle, *tail)}
    queries.clear()
    queries.update(items)
