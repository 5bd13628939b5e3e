"""Manifest-resident NDV: per-file KMV sketches merge to the exact
whole-table sketch (semilattice), so MTable.ndv() is a zero-job statistic
that matches a direct python sketch of the data bit-for-bit.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from retailfeaturestore_spark.sources.mtable import MTable

K = 64
_SPAN = float(2**56)


def _py_ndv(values, k=K):
    hs = sorted({int(hashlib.md5(f"kmv#{v}".encode()).hexdigest()[:14], 16) for v in values})[:k]
    if len(hs) < k:
        return float(len(hs))
    return float(k - 1) / ((hs[-1] + 1.0) / _SPAN)


def test_ndv_matches_direct_python_sketch_exactly(spark, tmp_path):
    rows = [(i, i % 531, f"d{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, u long, d string").repartition(6)
    t = MTable(spark, str(tmp_path / "nd"))
    t.write(df, partition_by="d", ndv_cols=["k", "u"])
    # semilattice merge: manifest sketches == whole-column sketch
    assert t.ndv("k") == _py_ndv(range(3000))
    assert t.ndv("u") == _py_ndv(range(531))
    # estimate quality: within the KMV 1/sqrt(k) envelope
    assert abs(t.ndv("k") - 3000) <= 3 * 3000 / (K ** 0.5)
    # partition-scoped: months of u values present in d0 only
    vals_d0 = {i % 531 for i in range(3000) if i % 3 == 0}
    assert t.ndv("u", partitions=["d0"]) == _py_ndv(vals_d0)


def test_small_tables_are_exact_and_missing_sketches_raise(spark, tmp_path):
    df = spark.createDataFrame([(i, "1") for i in range(40)], "k long, d string")
    t = MTable(spark, str(tmp_path / "nd2"))
    t.write(df, partition_by="d", ndv_cols=["k"])
    assert t.ndv("k") == 40.0  # < K distinct: exact
    with pytest.raises(ValueError, match="no KMV sketch"):
        t.ndv("d_oops")


def test_ndv_inherits_through_merge_and_time_travels(spark, tmp_path):
    rows = [(i, "1" if i < 500 else "2") for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, d string").repartition(3)
    t = MTable(spark, str(tmp_path / "nd3"))
    t.write(df, partition_by="d", ndv_cols=["k"])
    v1_ndv = t.ndv("k")
    assert v1_ndv == _py_ndv(range(1000))
    # merge adds new keys into partition 1; staged files re-sketch with the
    # inherited ndv set, untouched partition 2 carries its sketches
    upd = spark.createDataFrame([(5000 + i, "1") for i in range(200)], "k long, d string")
    t.merge_upsert(upd, keys=["k"], partition_col_value=F.lit("1"))
    assert t.ndv("k") == _py_ndv(list(range(1000)) + list(range(5000, 5200)))
    # time travel: the old version still answers with the old estimate
    assert t.ndv("k", version=1) == v1_ndv


def test_plain_append_inherits_stats_bloom_ndv_sets(spark, tmp_path):
    # ADVICE r9: write(mode="append") without explicit column sets used to
    # commit stat-less files — pruning silently degraded and ndv() RAISED
    # on a previously ndv_cols-committed table after any plain append.
    from retailfeaturestore_spark.sources.mtable import MTable as _MT

    df = spark.createDataFrame(
        [(i, f"u{i}", "1") for i in range(500)], "k long, tag string, d string"
    ).repartition(2)
    t = _MT(spark, str(tmp_path / "nd4"))
    t.write(df, partition_by="d", stats_cols=["k"], bloom_cols=["tag"], ndv_cols=["k"])
    extra = spark.createDataFrame(
        [(1000 + i, f"v{i}", "1") for i in range(100)], "k long, tag string, d string"
    )
    t.write(extra, mode="append")  # no column sets: must inherit
    m = t._read_manifest(2)
    appended = [
        rel for rel in m["partitions"]["1"]
        if rel not in t._read_manifest(1)["stats"]
    ]
    assert appended
    for rel in appended:
        ent = m["stats"][rel]
        assert "mn" in ent["k"] and "kmv" in ent["k"], rel
        assert "bf" in ent["tag"], rel
    # ndv still answers and reflects the appended keys
    assert t.ndv("k") == _py_ndv(list(range(500)) + list(range(1000, 1100)))
    # explicit [] still means "stat nothing" for the new files
    t.write(extra.withColumn("k", F.col("k") + 10000), mode="append", stats_cols=[],
            bloom_cols=[], ndv_cols=[])
    m3 = t._read_manifest(3)
    new3 = [rel for rel in m3["partitions"]["1"] if rel not in m["stats"]]
    assert new3 and all(rel not in m3["stats"] for rel in new3)
