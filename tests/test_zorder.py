"""Z-order layout: the Morton interleave is exact, buckets bound BOTH
dimensions, and a z-sorted write round-trips while narrowing per-file
ranges on both columns (the two-dim zone-map property — the single-col
counterpart lives in sources/layout.py + test_layout.py)."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.layout import (
    write_zorder,
    zorder_stats,
    zorder_value,
)


def _interleave_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_python(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 65536).alias("x"), (F.col("id") * 101 % 65536).alias("y")
    )
    got = df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == _interleave_py(r.x, r.y), (r.x, r.y)


def test_zorder_value_bits_validation():
    import pytest

    with pytest.raises(ValueError):
        zorder_value(F.lit(1), F.lit(1), bits=0)
    with pytest.raises(ValueError):
        zorder_value(F.lit(1), F.lit(1), bits=32)


def test_zorder_stats_bucket_bits_validation(spark):
    import pytest

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.layout import (
        zorder_stats,
    )

    df = spark.range(10).selectExpr("id AS x", "id AS y")
    with pytest.raises(ValueError):
        zorder_stats(df, "x", "y", bits=8, bucket_bits=17)  # > 2*bits
    with pytest.raises(ValueError):
        zorder_stats(df, "x", "y", bits=8, bucket_bits=0)


def test_zorder_stats_bounds_both_dims(tables):
    # top 8 z-bits fix the top 4 bits of x AND y → every bucket's span
    # in either dimension is < 2^12 of the 2^16 domain
    rows = zorder_stats(tables["lineitem"], "l_partkey", "l_suppkey").collect()
    assert rows, "no buckets"
    assert sum(r.n_rows for r in rows) == tables["lineitem"].count()
    for r in rows:
        assert r.x_span < 4096 and r.y_span < 4096, r


def test_write_zorder_roundtrips(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_suppkey")
    tmp = tempfile.mkdtemp(prefix="zorder_")
    try:
        write_zorder(li, tmp, "l_partkey", "l_suppkey", num_files=8)
        back = spark.read.parquet(tmp)
        assert back.count() == li.count()
        assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_write_zorder_narrows_files_on_both_dims(spark):
    # uniform 2D domain so both dimensions have room to narrow: each
    # z-range file fixes the top interleaved bits of BOTH columns, so
    # most parquet footers must bound both ranges at ≤ half the global
    df = spark.range(20_000).select(
        ((F.col("id") * 2654435761) % 65536).alias("x"),
        ((F.col("id") * 40503) % 65536).alias("y"),
    )
    tmp = tempfile.mkdtemp(prefix="zorder_")
    try:
        write_zorder(df, tmp, "x", "y", num_files=16)
        narrower = 0
        nfiles = 0
        for f in glob.glob(tmp + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo: dict = {"x": None, "y": None}
            hi: dict = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema in lo and c.statistics is not None:
                        st = c.statistics
                        lo[c.path_in_schema] = (
                            st.min
                            if lo[c.path_in_schema] is None
                            else min(lo[c.path_in_schema], st.min)
                        )
                        hi[c.path_in_schema] = (
                            st.max
                            if hi[c.path_in_schema] is None
                            else max(hi[c.path_in_schema], st.max)
                        )
            if lo["x"] is None:
                continue
            nfiles += 1
            if (hi["x"] - lo["x"]) <= 32768 and (hi["y"] - lo["y"]) <= 32768:
                narrower += 1
        assert nfiles >= 8, nfiles
        # boundary files may straddle a top-bit cut; most must narrow
        assert narrower >= nfiles // 2, (narrower, nfiles)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

