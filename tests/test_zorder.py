"""Z-order clustering: Morton bit math, and the property that actually
matters — every output file covers a COMPACT rectangle of the clustered
space, so footer min/max stats prune scans on either dimension."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_pipelines_examples_spark.operators.zorder import (
    morton_interleave,
    write_zordered,
    zorder_key,
)


def test_morton_interleave_known_values(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    # bit b of x -> output bit 2b; bit b of y -> output bit 2b+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(2, 3)] == 0b1110  # x=10 -> bits 2b: 0100; y=11 -> bits 2b+1: 1010
    assert out[(65535, 65535)] == (1 << 32) - 1


def test_zorder_files_cover_compact_rectangles(spark, tmp_path):
    """Uniform 64×64 grid written Z-ordered into 16 files: each file's
    (x, y) bounding box must cover far less than the full domain in BOTH
    dimensions — the precondition for min/max skipping on either column.
    A single-column sort would leave the other dimension's per-file range
    at ~full width."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=16)

    files = [f for f in glob.glob(path + "/*.parquet")]
    assert len(files) >= 8
    import pandas as pd  # noqa: F401
    import pyarrow.parquet as pq

    max_span_x = max_span_y = 0
    total = 0
    for f in files:
        t = pq.read_table(f).to_pandas()
        if len(t) == 0:
            continue
        total += len(t)
        max_span_x = max(max_span_x, int(t.x.max() - t.x.min()))
        max_span_y = max(max_span_y, int(t.y.max() - t.y.min()))
    assert total == 64 * 64
    # Z-curve cells: each file's box is a fraction of the 0..63 domain on
    # BOTH axes (a plain x-sort gives span_y = 63 for every file)
    assert max_span_x <= 40 and max_span_y <= 40, (max_span_x, max_span_y)

    # data intact
    back = spark.read.parquet(path)
    assert back.count() == 64 * 64
    assert back.select(F.min("x"), F.max("x")).first() == (0, 63)


def test_zorder_minmax_scale_path(spark, tmp_path):
    """The no-sort minmax normalization clusters the uniform grid just as
    compactly — and its plan has no window sort."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    keyed = zorder_key(df, ["x", "y"], how="minmax")
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # one agg + narrow exprs, no per-column sort
    path = str(tmp_path / "zm")
    write_zordered(df, path, ["x", "y"], n_files=16, how="minmax")
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(path + "/*.parquet"):
        t = pq.read_table(f).to_pandas()
        if len(t):
            spans.append((int(t.x.max() - t.x.min()), int(t.y.max() - t.y.min())))
    assert sum(len(pq.read_table(f).to_pandas()) for f in glob.glob(path + "/*.parquet")) == 4096
    assert max(s[0] for s in spans) <= 40 and max(s[1] for s in spans) <= 40
