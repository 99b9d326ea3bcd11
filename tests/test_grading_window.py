"""The grading window is load-bearing: the driver hash-grades only the
FIRST 50 catalog entries, so the _PROMOTED/_DEPRIORITIZED rotation
mechanism decides which operators get driver verification. A typo in
either list would silently shrink or reshuffle the graded set — these
pins make that a test failure instead."""

from __future__ import annotations

WINDOW = 50

# The round-5 window, chosen deliberately: all 30 never-driver-graded
# oracled entries (the session-2 surface, promoted to pay the r4
# grading-window debt) + the new q109 binned-join scale path + the
# first 19 foundational-family entries. Everything displaced has green
# rows in CORRECTNESS_r04.
EXPECTED_CLASSIC_HEAD = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_interval_collapse",
    "q04_customers_without_orders",
    "q05_latest_order_per_customer",
    "q06_cumulative_daily_revenue",
    "q07_salted_join_priority_volume",
    "q08_part_unpivot",
    "q09_json_shred_events",
    "q11_sessionize_events",
    "q12_sliding_distinct_users",
    "q13_dedup_exact_documents",
    "q14_text_profile",
    "q15_embedding_topk",
    "q16_size_band_join",
    "q17_wildcard_rule_tiering",
    "q18_open_not_fulfilled_custkeys",
    "q20_order_lag_features",
    "q23_overlapping_order_windows",
]

# Catalog entries that legitimately carry no oracle: approximate or
# engine-specific by design. Anything else without an oracle is a bug.
NO_ORACLE_ALLOWED = {
    "q41_approx_sliding_distinct",  # HLL sketch — no exact SQL twin
    "q87_minhash_fast_path",        # xxhash64 — DuckDB lacks the hash;
    "q88_simhash_fast_path",        # portable twins q33/q34 are graded
}


def _catalog():
    from data_pipelines_examples_spark import queries as catalog

    return catalog


def test_rotation_lists_reference_real_entries():
    cat = _catalog()
    qs = cat.queries()
    for name in cat._PROMOTED:
        assert name in qs, f"_PROMOTED names unknown entry {name}"
    for name in cat._DEPRIORITIZED:
        assert name in qs, f"_DEPRIORITIZED names unknown entry {name}"
    overlap = set(cat._PROMOTED) & set(cat._DEPRIORITIZED)
    assert not overlap, f"entries both promoted and deprioritized: {overlap}"


def test_graded_window_composition():
    cat = _catalog()
    names = list(cat.queries().keys())
    window = names[:WINDOW]
    assert window == cat._PROMOTED + EXPECTED_CLASSIC_HEAD, (
        "graded window drifted from the intended round-5 set"
    )


def test_every_graded_entry_has_oracle():
    cat = _catalog()
    names = list(cat.queries().keys())
    oracles = cat.oracle_sql()
    missing = [n for n in names[:WINDOW] if n not in oracles]
    assert not missing, f"graded entries without an oracle: {missing}"


def test_every_catalog_entry_has_oracle_unless_allowed():
    cat = _catalog()
    names = set(cat.queries().keys())
    oracles = set(cat.oracle_sql().keys())
    missing = names - oracles - NO_ORACLE_ALLOWED
    assert not missing, f"entries without oracle or allowlist reason: {missing}"
    stale = NO_ORACLE_ALLOWED - names
    assert not stale, f"allowlist names unknown entries: {stale}"


def test_no_oracle_entries_never_occupy_graded_slots():
    cat = _catalog()
    names = list(cat.queries().keys())
    bad = [n for n in names[:WINDOW] if n in NO_ORACLE_ALLOWED]
    assert not bad, f"approximate/no-oracle entries in the graded window: {bad}"
