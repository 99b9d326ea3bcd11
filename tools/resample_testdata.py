"""Perturb the driver testdata for differential robustness testing.

Two seeded perturbations, each followed by `tools/check_oracle.py DST`
— both engines read the identical parquet, so any mismatch is a real
defect, not noise:

- ``resample``: with-replacement bootstrap of every table (same
  schemas/domains, NEW duplicate-row and tie patterns). Found: ngram
  Jaccard's gram-count inflation under duplicate doc_ids; q17 per-row
  vs per-key tiering; q64/q68 packing order underdetermined without a
  unique-id contract. All fixed/contracted in round 5; 0 failures
  across 3 seeds x 2 scales since.
- ``inject_nulls``: NULL ~5% of the values in nullable non-key columns.
  Found: q37's concat_ws-vs-concat NULL divergence (DuckDB concat
  treats NULL as '', Spark concat_ws skips the arg AND its separator);
  q21's implicit NULL sort order (Spark ASC = nulls first, DuckDB ASC =
  nulls last — every NTILE bucket shifts). Both made explicit on both
  sides in round 5; 0 failures since.

Why this matters: the driver regenerates testdata per round — any
query/oracle pair that only agrees on one data shape is a latent gate
failure on a future seed.

- ``inject_skew``: point a large fraction of foreign-key values at one
  hot key (lineitem→one order, orders→one customer, events→one user)
  and a slice of document texts at one hot text. Referential integrity
  is preserved (the hot key is an existing key), so every query stays
  well-defined; what changes is the data DISTRIBUTION — giant per-key
  window partitions, quadratic dedup groups, salted-join hot keys.
- ``inject_strings``: replace a slice of free-text values (document
  text, names, JSON props) with adversarial payloads — quotes,
  backslashes, the \\x1f legacy separator, NFC/NFD pairs, astral-plane
  emoji, RTL, embedded newlines, empty and 10k-char strings, malformed
  JSON. Both engines read identical parquet, so any gate divergence is
  an encoding/escaping defect in an operator or its oracle.
- ``inject_floats``: replace a slice of double-column values (money,
  measures) with IEEE edge cases — NaN, ±inf, -0.0, ±1e308 (overflow
  bait for naive double sums), the min denormal, and max-precision
  doubles. Stresses: decimal-cast NULLing vs erroring (Spark non-ANSI
  CAST(inf AS DECIMAL) → NULL, DuckDB CAST → error — TRY_CAST is the
  shared contract), NaN ordering/equality (both engines: NaN is
  largest and equal to itself), and -0.0 group-key normalization.
- ``inject_times``: replace a slice of timestamp values with temporal
  edge cases — the epoch, the last pre-epoch microsecond (negative
  epoch seconds), 1900 (pre-epoch year), leap day 2024-02-29,
  year-boundary midnight, a .999999 microsecond edge, the int64-nanos
  ceiling (2262-04-11), and a far-future year with arithmetic headroom
  (9000). Stresses month/fiscal arithmetic, window RANGE frames, gap
  detection, and epoch-second conversions on negative values.

- ``--replicate=K``: multiplicity-PRESERVING scale-up (the readable
  bench rung — r8 verdict item 5). The ``--scale`` bootstrap draws K·n
  rows from the SAME key domain, so both sides of every fact-fact FK
  gain K× multiplicity and join workload grows K² (q07 measured 29×
  wall at K=10 — dataset construction, not engine scaling). Replication
  instead stamps K disjoint key universes: every key column shifts by
  replica·stride (stride > the domain's max key, consistently across
  ALL tables sharing the domain — events.user_id lives in the custkey
  domain via q49's asof join), so per-key join multiplicity, window
  partition sizes, and dup-group sizes are IDENTICAL to the source
  while row counts grow K×: a linear-work scale-up, like TPC-H SF
  growth. Content that would collide across replicas is decorrelated
  deterministically: document/name text is Caesar-shifted by replica
  (length-preserving — n_chars stays consistent; Levenshtein distances
  within a replica are invariant under the bijective char map, and
  cross-replica texts differ in every letter so fuzzy/ngram/minhash
  families don't gain cross-replica pairs), and embedding vectors are
  cyclically rotated by replica (norm-preserving; within-replica
  geometry identical, cross-replica cosine ≈ isotropic noise).
  Replicas 26+ (r10, for the 100× rung): Caesar wraps at 26, so text
  switches to SEEDED ALPHABET PERMUTATIONS, re-seeded until every pair
  of replica tables (including the Caesar ones) agrees on at most 3
  lowercase letters (full pairwise derangement is pigeonhole-impossible
  past 26 tables; ≤3 agreement still forbids any real text from
  colliding across replicas — pinned by the dup-group invariant) — and
  embeddings compose the rotation with a deterministic sign-flip
  bitmask (flip coordinate i iff bit i of replica//dim + 1 is set):
  sign-flips are orthogonal, so within-replica inner products are
  untouched, and (rotation, mask) pairs are distinct across all
  replicas for dim ≥ 8, so no two replicas apply the same transform.
  nation/region stay single-copy (small enums — more customers per
  nation is linear fan-out, and region-level aggregates keep their
  5-row shape). Replica 0 is the identity, so the source is a subset.

Usage:
    python tools/resample_testdata.py /root/testdata/sf0.001 /tmp/randsf [seed]
    python tools/resample_testdata.py --replicate=10 /root/testdata/sf0.1 /tmp/sf1_replica
    python tools/resample_testdata.py --nulls /root/testdata/sf0.001 /tmp/nullsf [seed]
    python tools/resample_testdata.py --skew /root/testdata/sf0.001 /tmp/skewsf [seed]
    python tools/resample_testdata.py --strings /root/testdata/sf0.001 /tmp/strsf [seed]
    python tools/resample_testdata.py --floats /root/testdata/sf0.001 /tmp/fltsf [seed]
    python tools/resample_testdata.py --times /root/testdata/sf0.001 /tmp/tmsf [seed]
    python tools/check_oracle.py /tmp/randsf
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


# The many-side tables: safe to upscale. Scaling the one-side
# (dimension) tables instead multiplies EVERY FK join hop ~scale× —
# a 4-table star join reached ~6e9 intermediate rows on an all-tables
# ×10 set (COVERAGE.md round 6) — so --scale defaults to facts only.
FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}


def resample(
    src: str,
    dst: str,
    seed: int = 20260814,
    scale: int = 1,
    scale_tables: set[str] | None = None,
) -> dict[str, int]:
    """Bootstrap every table; ``scale`` > 1 draws scale·n rows for the
    tables in ``scale_tables`` (default: ``FACT_TABLES``; pass a set to
    override, or ``{"*"}`` for all — see the join-fan-out warning above),
    extending the density ladder past the largest generated SF (r5
    verdict item 7: sf0.1 × 10 ≈ an sf1-density composed gate) — every
    key appears ~scale times, so duplicate groups, tie runs, and per-key
    window partitions all grow ~scale× beyond anything the same-size
    bootstrap reaches."""
    if scale_tables is None:
        scale_tables = FACT_TABLES
    os.makedirs(dst, exist_ok=True)
    rng = np.random.RandomState(seed)
    counts = {}
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(p)
        stem = name.replace(".parquet", "")
        t = pq.read_table(p)
        n = t.num_rows
        if n == 0:  # nothing to resample; copy through
            pq.write_table(t, os.path.join(dst, name))
            counts[name] = 0
            continue
        k = scale if ("*" in scale_tables or stem in scale_tables) else 1
        idx = rng.randint(0, n, size=n * k)
        pq.write_table(t.take(pa.array(idx)), os.path.join(dst, name))
        counts[name] = len(set(idx))
    return counts


# --replicate: key domains (columns sharing one key space — a remap
# must hit every member or an FK dangles; user_id is in the custkey
# domain via q49's `o_custkey = user_id` asof join) and the content
# columns decorrelated per replica.
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
    "eventid": [("events", "event_id")],
}
REPLICATED = {
    "lineitem", "orders", "events", "documents",
    "embeddings", "customer", "part", "supplier",
}
CAESAR_COLS = {
    "documents": ["text"],
    "customer": ["c_name"],
    "part": ["p_name"],
    "supplier": ["s_name"],
}


def _caesar_table(shift: int) -> dict[int, int]:
    """Bijective char map: rotate a-z, A-Z (by ``shift`` mod 26) and
    0-9 (mod 10). Length-preserving (n_chars stays valid) and
    distance-preserving within a replica; cross-replica texts differ
    in every alphanumeric. Residual: a text with NO alphanumerics maps
    to itself in every replica (measured zero such rows in the
    generated testdata) — its replicas would re-couple as exact dups."""
    lo = "abcdefghijklmnopqrstuvwxyz"
    hi = lo.upper()
    dg = "0123456789"
    s = shift % 26
    d = shift % 10
    return str.maketrans(
        lo + hi + dg,
        lo[s:] + lo[:s] + hi[s:] + hi[:s] + dg[d:] + dg[:d],
    )


_MAX_LETTER_AGREEMENT = 3


def _char_tables(k: int) -> list[dict[int, int]]:
    """One bijective char map per replica. Replicas 0-25 keep the exact
    Caesar maps (byte-compatible with the r9 rung; distinct shifts
    differ on EVERY letter). Replicas 26+ draw seeded alphabet
    permutations, deterministically re-seeded until the candidate
    agrees with every earlier table on at most _MAX_LETTER_AGREEMENT
    lowercase letters.

    Why the bound is 3 and not 0: full pairwise derangement is
    IMPOSSIBLE past 26 tables — at each alphabet position the 26
    Caesar maps already use all 26 letters (pigeonhole), so any new
    permutation agrees with SOME earlier table somewhere. Agreement
    <= 3 is the sufficient guarantee: two replicas' copies of a text
    collide only if every letter of the text falls in their <= 3-letter
    agreement set (no generated document does — the dup-group
    invariant is pinned in test_round10_fixes.py), and cross-replica
    shared n-grams are limited to grams drawn entirely from that tiny
    set, far below any near-dup candidate threshold. Digits are
    permuted per replica (no pairwise bound — Caesar's own digit map
    wraps mod 10) and uppercase mirrors lowercase."""
    import random

    lo = "abcdefghijklmnopqrstuvwxyz"
    dg = "0123456789"
    lo_maps: list[str] = []
    dg_maps: list[str] = []
    for r in range(min(k, 26)):
        s, d = r % 26, r % 10
        lo_maps.append(lo[s:] + lo[:s])
        dg_maps.append(dg[d:] + dg[:d])
    seed = 0
    while len(lo_maps) < k:
        rng = random.Random(f"replica-perm-{len(lo_maps)}-{seed}")
        cand = "".join(rng.sample(lo, 26))
        if all(
            sum(cand[i] == prev[i] for i in range(26)) <= _MAX_LETTER_AGREEMENT
            for prev in lo_maps
        ):
            lo_maps.append(cand)
            dg_maps.append("".join(rng.sample(dg, 10)))
        else:
            seed += 1
    return [
        str.maketrans(lo + lo.upper() + dg, m + m.upper() + dm)
        for m, dm in zip(lo_maps, dg_maps)
    ]


def replicate(src: str, dst: str, k: int) -> dict[str, int]:
    """Stamp ``k`` disjoint key universes of every replicated table —
    the multiplicity-preserving scale-up (see module docstring). Fully
    deterministic: replica 0 is the identity; replicas 26+ use seeded
    (but deterministically re-seeded) permutations, so the same (src,
    k) always produces byte-identical output."""
    if not 1 <= k <= 100:
        # 100 = two decades above the source — the strongest
        # constant-multiplicity scaling evidence the sandbox produces;
        # past that the permutation search and pylist text conversion
        # costs outgrow the evidence value
        raise ValueError(f"replicate: k must be in [1, 100], got {k}")
    os.makedirs(dst, exist_ok=True)
    domain_of = {}  # (table, column) -> domain name
    for dom, members in KEY_DOMAINS.items():
        for tbl, col in members:
            domain_of[(tbl, col)] = dom
    # stride per domain: > max key across EVERY member column
    stride = {}
    for dom, members in KEY_DOMAINS.items():
        hi = 0
        for tbl, col in members:
            p = os.path.join(src, f"{tbl}.parquet")
            if not os.path.exists(p):
                continue
            t = pq.read_table(p, columns=[col])
            if t.num_rows:
                import pyarrow.compute as pc

                m = pc.max(t[col]).as_py()
                if m is not None:
                    hi = max(hi, int(m))
        stride[dom] = hi + 1
    counts = {}
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        import pyarrow.compute as pc

        name = os.path.basename(p)
        stem = name.replace(".parquet", "")
        t = pq.read_table(p)
        if stem not in REPLICATED or t.num_rows == 0:
            pq.write_table(t, os.path.join(dst, name))
            counts[name] = t.num_rows
            continue
        replicas = []
        tables = _char_tables(k)
        for r in range(k):
            cols = {}
            trans = tables[r]
            for field in t.schema:
                arr = t[field.name].combine_chunks()
                dom = domain_of.get((stem, field.name))
                if dom is not None and r > 0:
                    arr = pc.add(arr, pa.scalar(r * stride[dom], type=field.type))
                elif field.name in CAESAR_COLS.get(stem, []) and r > 0:
                    arr = pa.array(
                        [
                            None if v is None else v.translate(trans)
                            for v in arr.to_pylist()
                        ],
                        type=field.type,
                    )
                elif stem == "embeddings" and field.name == "embedding" and r > 0:
                    # r < 26 (unchanged, byte-compatible with the r9
                    # rung): rotation r mod d decorrelates; when d
                    # divides r the rotation is the identity, so flip
                    # all signs instead — norm- and geometry-preserving
                    # (cos(-u,-v) == cos(u,v)). r >= 26 (r10): compose
                    # the rotation with a sign-flip bitmask — flip
                    # coordinate i iff bit i of (r // d + 1) is set.
                    # Sign-flips are orthogonal (within-replica inner
                    # products untouched) and the (r % d, r // d) pair
                    # is distinct per replica, so for d >= 8 no replica
                    # repeats another's transform (mask < 2^d - 1 for
                    # k <= 100, so it also never collides with the
                    # all-flip d|r case above). Empty vectors pass
                    # through (nothing to decorrelate).
                    def _rot(v, _r=r):
                        if v is None or len(v) == 0:
                            return v
                        d = len(v)
                        k2 = _r % d
                        out = v[k2:] + v[:k2]
                        if _r >= 26:
                            mask = _r // d + 1
                            out = [
                                -x if x is not None and (mask >> i) & 1 else x
                                for i, x in enumerate(out)
                            ]
                        elif k2 == 0:
                            out = [-x if x is not None else None for x in out]
                        return out

                    arr = pa.array(
                        [_rot(v) for v in arr.to_pylist()],
                        type=field.type,
                    )
                cols[field.name] = arr
            replicas.append(pa.table(cols))
        out = pa.concat_tables(replicas)
        pq.write_table(out, os.path.join(dst, name))
        counts[name] = out.num_rows
    return counts


# nullable non-key columns per table; keys/timestamps/text stay intact
# (their null behavior is a different contract — extend deliberately)
NULLABLE = {
    "customer": ["c_acctbal", "c_mktsegment"],
    "orders": ["o_totalprice", "o_orderpriority"],
    "lineitem": ["l_discount", "l_tax", "l_returnflag"],
    "events": ["value", "props"],
    "documents": ["lang", "source"],
    "part": ["p_retailprice", "p_type"],
    "supplier": ["s_acctbal"],
}


def inject_nulls(src: str, dst: str, seed: int = 5, rate: float = 0.05) -> None:
    import pyarrow.compute as pc

    os.makedirs(dst, exist_ok=True)
    rng = np.random.RandomState(seed)
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        t = pq.read_table(p)
        cols = {}
        for field in t.schema:
            arr = t[field.name]
            if field.name in NULLABLE.get(name, []):
                mask = rng.rand(t.num_rows) < rate
                arr = pc.if_else(
                    pa.array(~mask),
                    arr.combine_chunks(),
                    pa.nulls(t.num_rows, field.type),
                )
            cols[field.name] = arr
        pq.write_table(pa.table(cols), os.path.join(dst, f"{name}.parquet"))


# (table, fk_column, hot-fraction): the hot value is the MOST FREQUENT
# existing key, so referential integrity and key-domain contracts hold.
SKEW_KEYS = [
    ("lineitem", "l_orderkey", 0.3),
    ("orders", "o_custkey", 0.3),
    ("events", "user_id", 0.3),
]
SKEW_TEXT_RATE = 0.05  # fraction of documents pointed at one hot text


def inject_skew(src: str, dst: str, seed: int = 7) -> None:
    import pyarrow.compute as pc

    os.makedirs(dst, exist_ok=True)
    rng = np.random.RandomState(seed)
    plans = {t: (c, r) for t, c, r in SKEW_KEYS}
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        t = pq.read_table(p)
        cols = {f.name: t[f.name] for f in t.schema}
        if name in plans and t.num_rows > 0:
            col, rate = plans[name]
            counts = pc.value_counts(t[col].combine_chunks())
            hot = max(counts.to_pylist(), key=lambda kv: kv["counts"])["values"]
            mask = rng.rand(t.num_rows) < rate
            cols[col] = pc.if_else(
                pa.array(mask),
                pa.scalar(hot, type=t.schema.field(col).type),
                t[col].combine_chunks(),
            )
        if name == "documents" and t.num_rows > 0:
            texts = t["text"].combine_chunks()
            # first non-null text is the hot value (composable with --nulls)
            non_null = [s for s in texts if s.is_valid]
            hot_text = non_null[0] if non_null else None
        else:
            hot_text = None
        if hot_text is not None:
            mask = rng.rand(t.num_rows) < SKEW_TEXT_RATE
            cols["text"] = pc.if_else(pa.array(mask), hot_text, texts)
            if "n_chars" in cols:  # keep the derived column consistent
                cols["n_chars"] = pc.if_else(
                    pa.array(mask),
                    pa.scalar(len(hot_text.as_py()), type=t.schema.field("n_chars").type),
                    t["n_chars"].combine_chunks(),
                )
        pq.write_table(pa.table(cols), os.path.join(dst, f"{name}.parquet"))


# Payloads cycle through a slice of each STRINGS column. Deliberately
# includes: SQL-literal breakers, the pre-round-5 checksum separator,
# NFC/NFD forms of the same glyph, astral emoji, RTL, control chars,
# malformed JSON, an empty string, and a 10k-char document.
ADVERSARIAL = [
    "O'Reilly 'quoted'; DROP TABLE t; --",
    'back\\slash "double" quote',
    "unit\x1fsep\x1fpayload",
    "café NFC",  # é precomposed
    "café NFD",  # e + combining acute
    "emoji \U0001f600\U0001f680 astral",
    "שלום rtl mixed ltr",
    "line1\nline2\ttabbed",
    "",
    "x" * 10000,
    # single-quoted pseudo-JSON (a Python-repr leak, the classic props
    # corruption): Jackson's DEFAULT from_json parses it, DuckDB's
    # json_valid rejects it — strict mode is what keeps engines agreeing
    "{'k': 99}",
]

STRINGS = {
    "documents": ["text"],
    "customer": ["c_name"],
    "part": ["p_name"],
    "supplier": ["s_name"],
    "events": ["props"],  # malformed-JSON robustness for the shredders
}


def _inject_cycle(src, dst, seed, rate, targets, payloads, fixup=None) -> None:
    """Shared replace-a-slice loop for the payload-cycling axes
    (--strings/--floats/--times): for every targeted column, replace a
    ``rate`` slice of non-null values by cycling through ``payloads``
    (cycle index resets per column). Draw order is one ``rng.rand(n)``
    per targeted column in schema order — KEEP IT THAT WAY: outputs must
    stay byte-identical for a given seed across refactors (verified by
    checksum when this helper replaced the three per-axis copies).
    ``fixup(name, table, cols)`` patches derived columns (n_chars)."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.RandomState(seed)
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        t = pq.read_table(p)
        cols = {}
        for field in t.schema:
            arr = t[field.name].combine_chunks()
            if field.name in targets.get(name, []):
                vals = arr.to_pylist()
                hit = rng.rand(t.num_rows) < rate
                k = 0
                for i in range(t.num_rows):
                    if hit[i] and vals[i] is not None:
                        vals[i] = payloads[k % len(payloads)]
                        k += 1
                arr = pa.array(vals, type=field.type)
            cols[field.name] = arr
        if fixup is not None:
            fixup(name, t, cols)
        pq.write_table(pa.table(cols), os.path.join(dst, f"{name}.parquet"))


def _sync_n_chars(name, t, cols) -> None:
    if name == "documents":  # keep the derived column consistent
        cols["n_chars"] = pa.array(
            [None if v is None else len(v) for v in cols["text"].to_pylist()],
            type=t.schema.field("n_chars").type,
        )


def inject_strings(src: str, dst: str, seed: int = 11, rate: float = 0.04) -> None:
    _inject_cycle(src, dst, seed, rate, STRINGS, ADVERSARIAL, fixup=_sync_n_chars)


# IEEE-754 edge values. ±1e308 is overflow bait: a naive double SUM
# that meets two same-sign 1e308s overflows to ±inf in an accumulation-
# order-dependent way; the engine's decimal-exact money sums must
# instead treat non-finite as NULL (TRY_CAST) identically in both
# engines. 5e-324 is the min subnormal; 0.1 + 0.2 lands on the classic
# repr-visible double 0.30000000000000004.
FLOAT_PAYLOADS = [
    float("nan"),
    float("inf"),
    float("-inf"),
    -0.0,
    1e308,
    -1e308,
    5e-324,
    1.7976931348623157e308,
    0.1 + 0.2,
]

FLOATS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "events": ["value"],
}


def inject_floats(src: str, dst: str, seed: int = 13, rate: float = 0.03) -> None:
    _inject_cycle(src, dst, seed, rate, FLOATS, FLOAT_PAYLOADS)


def _time_payloads() -> list:
    import datetime as dt

    # All payloads stay inside pandas' int64-NANOSECOND Timestamp range
    # (1677-09-21 .. 2262-04-11): both gate clients materialize results
    # through pandas, so a year-9000 value overflows the CLIENT even
    # though both engines compute it fine (verified — the engine-side
    # far-future contract is pinned by tests/test_time_edges.py via
    # collect(), which returns plain datetimes and has no ns ceiling).
    return [
        dt.datetime(1970, 1, 1, 0, 0, 0),  # the epoch itself
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # negative epoch secs
        dt.datetime(1900, 1, 1, 12, 0, 0),  # pre-epoch year
        dt.datetime(2024, 2, 29, 23, 59, 59, 999999),  # leap day, µs edge
        dt.datetime(2025, 1, 1, 0, 0, 0),  # year-boundary midnight
        dt.datetime(2200, 6, 15, 1, 2, 3, 4),  # far future, arith headroom
        dt.datetime(2262, 4, 11, 23, 47, 16, 854775),  # int64-nanos ceiling
    ]


TIMES = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def inject_times(src: str, dst: str, seed: int = 17, rate: float = 0.03) -> None:
    _inject_cycle(src, dst, seed, rate, TIMES, _time_payloads())


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    dst = args[1] if len(args) > 1 else "/tmp/randsf"
    if "--nulls" in sys.argv:
        inject_nulls(src, dst, int(args[2]) if len(args) > 2 else 5)
        print(f"null-injected {src} -> {dst}")
    elif "--skew" in sys.argv:
        inject_skew(src, dst, int(args[2]) if len(args) > 2 else 7)
        print(f"skew-injected {src} -> {dst}")
    elif "--strings" in sys.argv:
        inject_strings(src, dst, int(args[2]) if len(args) > 2 else 11)
        print(f"string-injected {src} -> {dst}")
    elif "--floats" in sys.argv:
        inject_floats(src, dst, int(args[2]) if len(args) > 2 else 13)
        print(f"float-injected {src} -> {dst}")
    elif "--times" in sys.argv:
        inject_times(src, dst, int(args[2]) if len(args) > 2 else 17)
        print(f"time-injected {src} -> {dst}")
    elif any(a.startswith("--replicate=") for a in sys.argv):
        k = next(
            int(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--replicate=")
        )
        for name, rows in replicate(src, dst, k).items():
            print(f"{name}: {rows} rows ({k} replicas)")
    else:
        seed = int(args[2]) if len(args) > 2 else 20260814
        scale = next(
            (int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--scale=")),
            1,
        )
        tables = {"*"} if "--scale-all-tables" in sys.argv else None
        for name, distinct in resample(
            src, dst, seed, scale=scale, scale_tables=tables
        ).items():
            print(f"{name}: resampled ({distinct} distinct source rows)")
