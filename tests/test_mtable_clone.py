"""Shallow clone: zero-copy branch, full independence, vacuum safety.

The contracts: a clone reads identically to the cloned source version by
planning the SOURCE's files (no bytes copied); writes and DML on either
side never affect the other; the clone's copy-on-write progressively
materializes rewritten files into its OWN data directory; the clone's
vacuum can never delete source files; stats/constraints carry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retailfeaturestore_spark.sources.mtable import (
    ConstraintViolation,
    MTable,
    NoSuchVersion,
)


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id long, t_ref string, score double"
    ).withColumn("t_ref", F.col("t_ref").cast("timestamp"))


def _with_date(df):
    return df.withColumn("date", F.date_format("t_ref", "yyyy-MM-dd"))


BASE = [
    (1, "2024-01-01 10:00:00", 1.0),
    (2, "2024-01-01 11:00:00", 2.0),
    (3, "2024-01-02 10:00:00", 3.0),
]


def _mk(spark, tmp_path, name="src"):
    t = MTable(spark, str(tmp_path / name))
    t.write(
        _with_date(_snap(spark, BASE)),
        partition_by="date",
        stats_cols=["score"],
    )
    return t


def _rows(t, **kw):
    return {(r.customer_id, r.score, r.date) for r in t.read(**kw).collect()}


def test_clone_is_zero_copy_and_reads_the_source_version(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.write(
        _with_date(_snap(spark, [(4, "2024-01-03 10:00:00", 4.0)])),
        mode="append",
    )
    clone = src.clone_to(str(tmp_path / "dev"), version=1)
    assert _rows(clone) == _rows(src, version=1)
    # zero copy: the clone plans the SOURCE's physical files
    assert set(clone.read().inputFiles()) == set(src.read(version=1).inputFiles())
    d = clone.describe()
    assert d["operation"] == "clone" and d["n_rows"] == 3
    assert clone.history()[0]["operation"] == "clone"
    # stats carried: pruning works against the absolute references
    pruned = clone.read(prune=[("score", ">=", 3.0)])
    assert len(pruned.inputFiles()) < len(clone.read().inputFiles())
    with pytest.raises(ValueError):
        src.clone_to(str(tmp_path / "dev"))  # target not empty
    with pytest.raises(NoSuchVersion):
        src.clone_to(str(tmp_path / "dev2"), version=9)


def test_clone_and_source_are_fully_independent(spark, tmp_path):
    src = _mk(spark, tmp_path)
    clone = src.clone_to(str(tmp_path / "dev"))
    # diverge both sides; the prune keeps date=2024-01-02 (score 3.0)
    # match-free so its file stays source-referenced after the rewrite
    clone.update(
        F.col("customer_id") == 1,
        {"score": F.lit(100.0)},
        prune=[("score", "<=", 1.0)],
    )
    clone.write(
        _with_date(_snap(spark, [(9, "2024-01-09 10:00:00", 9.0)])),
        mode="append",
    )
    src.delete(F.col("customer_id") == 3)
    assert _rows(src) == {(1, 1.0, "2024-01-01"), (2, 2.0, "2024-01-01")}
    assert _rows(clone) == {
        (1, 100.0, "2024-01-01"),
        (2, 2.0, "2024-01-01"),
        (3, 3.0, "2024-01-02"),
        (9, 9.0, "2024-01-09"),
    }
    # the clone's rewrite materialized into its OWN data dir; untouched
    # partitions still reference the source
    files = set(clone.read().inputFiles())
    assert any(str(tmp_path / "dev") in f for f in files)
    assert any(str(tmp_path / "src") in f for f in files)
    # the clone's change feed bootstraps with the cloned content at v1
    ins = {
        (r.customer_id, r._commit_version)
        for r in clone.read_changes(0, 1).collect()
    }
    assert ins == {(1, 1), (2, 1), (3, 1)}


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    src = _mk(spark, tmp_path)
    clone = src.clone_to(str(tmp_path / "dev"))
    # rewrite everything clone-side so v1's source refs become unreferenced
    clone.update(F.col("score") >= 0, {"score": F.col("score") + 1})
    deleted = clone.vacuum(keep_versions=1, min_age_ms=0)
    assert all(str(tmp_path / "src") not in d for d in deleted)
    # source intact, clone consistent
    assert _rows(src) == {
        (1, 1.0, "2024-01-01"),
        (2, 2.0, "2024-01-01"),
        (3, 3.0, "2024-01-02"),
    }
    assert {s for (_, s, _) in _rows(clone)} == {2.0, 3.0, 4.0}


def test_clone_carries_constraints(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.add_constraint("score_pos", "score > 0")
    clone = src.clone_to(str(tmp_path / "dev"))
    assert clone.constraints() == {"score_pos": "score > 0"}
    with pytest.raises(ConstraintViolation):
        clone.write(
            _with_date(_snap(spark, [(9, "2024-01-09 10:00:00", -9.0)])),
            mode="append",
        )
