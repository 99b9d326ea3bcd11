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

Usage:
    python tools/resample_testdata.py /root/testdata/sf0.001 /tmp/randsf [seed]
    python tools/resample_testdata.py --nulls /root/testdata/sf0.001 /tmp/nullsf [seed]
    python tools/check_oracle.py /tmp/randsf
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def resample(src: str, dst: str, seed: int = 20260814) -> dict[str, int]:
    os.makedirs(dst, exist_ok=True)
    rng = np.random.RandomState(seed)
    counts = {}
    for p in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(p)
        t = pq.read_table(p)
        n = t.num_rows
        idx = rng.randint(0, n, size=n)
        pq.write_table(t.take(pa.array(idx)), os.path.join(dst, name))
        counts[name] = len(set(idx))
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


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--nulls"]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    dst = args[1] if len(args) > 1 else "/tmp/randsf"
    if "--nulls" in sys.argv:
        inject_nulls(src, dst, int(args[2]) if len(args) > 2 else 5)
        print(f"null-injected {src} -> {dst}")
    else:
        seed = int(args[2]) if len(args) > 2 else 20260814
        for name, distinct in resample(src, dst, seed).items():
            print(f"{name}: resampled ({distinct} distinct source rows)")
