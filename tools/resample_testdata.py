"""Bootstrap-resample the driver testdata for differential robustness
testing.

Writes a seeded with-replacement resample of every table in SRC to DST
(same schemas, same value domains, new duplicate-row / tie patterns),
then `tools/check_oracle.py DST` runs the full Spark-vs-DuckDB gate on
it. Both engines read the identical parquet, so any mismatch is a real
defect: either an operator whose answer silently degrades under
duplicate keys (found: ngram Jaccard's gram-count inflation) or a
query/oracle pair whose spec is underdetermined without a uniqueness
contract (found: q17 per-row vs per-key tiering, q64/q68 packing order
— all fixed/contracted in round 5; the gate is 0-failures on resampled
data since).

Usage:
    python tools/resample_testdata.py /root/testdata/sf0.001 /tmp/randsf [seed]
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


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/randsf"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20260814
    for name, distinct in resample(src, dst, seed).items():
        print(f"{name}: resampled ({distinct} distinct source rows)")
