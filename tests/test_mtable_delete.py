"""Row-level DELETE: stats/bloom-pruned file-surgical rewrites, untouched
files carried by reference (byte-identical rel paths), snapshot isolation,
NULL-condition keep semantics, emptied files/partitions dropped.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retailfeaturestore_spark.sources.mtable import ConcurrentCommit, MTable


def _table(spark, tmp_path, name, **write_kw):
    rows = [(i, i % 977, f"d{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, u long, d string").repartition(4)
    t = MTable(spark, str(tmp_path / name))
    t.write(df, partition_by="d", **write_kw)
    return t


def test_pruned_delete_touches_only_candidate_files(spark, tmp_path):
    t = _table(
        spark, tmp_path, "dl", stats_cols=["k"], bloom_cols=["u"], bloom_bits=4096
    )
    m1 = t._read_manifest(1)
    before_files = {r for fs in m1["partitions"].values() for r in fs}
    v = t.delete("u = 7", prune=[("u", "=", 7)])
    assert v == 2
    m2 = t._read_manifest(2)
    after_files = {r for fs in m2["partitions"].values() for r in fs}
    carried = before_files & after_files
    # bloom pruning left SOME original files byte-identical by reference
    assert carried, "no file carried by reference"
    assert m2["meta"]["delete_untouched_files"] == len(carried)
    # row set = original minus deleted
    got = {(r.k, r.u) for r in t.read().collect()}
    assert got == {(i, i % 977) for i in range(3000) if i % 977 != 7}
    # snapshot isolation: version 1 still has the deleted rows
    n_deleted = len([i for i in range(3000) if i % 977 == 7])
    assert t.read(version=1).where("u = 7").count() == n_deleted
    # rewritten files re-stat'd with the inherited range AND bloom sets
    for rel in after_files - carried:
        ent = m2["stats"][rel]
        assert "mn" in ent["k"] and "bf" in ent["u"], rel


def test_range_pruned_delete_and_emptied_partition_drops(spark, tmp_path):
    rows = [(i, "1" if i < 100 else "2") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, d string").repartition(2)
    t = MTable(spark, str(tmp_path / "dl2"))
    t.write(df, partition_by="d", stats_cols=["k"])
    # delete everything in partition 2's range; partition 1's files are
    # provably out of range -> carried by reference
    m1 = t._read_manifest(1)
    v = t.delete("k >= 100", prune=[("k", ">=", 100)])
    m2 = t._read_manifest(v)
    assert "2" not in m2["partitions"], "fully-emptied partition must drop"
    assert set(m2["partitions"]["1"]) == set(m1["partitions"]["1"])
    assert {r.k for r in t.read().collect()} == set(range(100))


def test_null_condition_rows_are_kept(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 5.0, "1"), (2, None, "1"), (3, 90.0, "1")], "k long, v double, d string"
    )
    t = MTable(spark, str(tmp_path / "dl3"))
    t.write(df, partition_by="d")
    t.delete(F.col("v") > 50.0)
    assert {r.k for r in t.read().collect()} == {1, 2}  # NULL v survives


def test_delete_nothing_is_a_noop_version(spark, tmp_path):
    t = _table(spark, tmp_path, "dl4", stats_cols=["k"])
    # prune proves no file can match -> no new version at all
    v = t.delete("k = -5", prune=[("k", "=", -5)])
    assert v == 1
    assert t.versions() == [1]


def test_update_assigns_from_preupdate_row_and_prunes(spark, tmp_path):
    t = _table(
        spark, tmp_path, "up1", stats_cols=["k"], bloom_cols=["u"], bloom_bits=4096
    )
    m1 = t._read_manifest(1)
    before_files = {r for fs in m1["partitions"].values() for r in fs}
    # swap-style double assignment: both expressions must see the ORIGINAL row
    v = t.update(
        "u = 7", set={"k": "k + 1000000", "u": "k"}, prune=[("u", "=", 7)]
    )
    m2 = t._read_manifest(v)
    after_files = {r for fs in m2["partitions"].values() for r in fs}
    assert before_files & after_files, "no file carried by reference"
    got = {(r.k, r.u) for r in t.read().collect()}
    want = {
        (i + 1000000, i) if i % 977 == 7 else (i, i % 977) for i in range(3000)
    }
    assert got == want
    # unchanged via time travel
    assert t.read(version=1).where("u = 7").count() == len(
        [i for i in range(3000) if i % 977 == 7]
    )


def test_update_null_condition_rows_unchanged(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 5.0, "1"), (2, None, "1"), (3, 90.0, "1")], "k long, v double, d string"
    )
    t = MTable(spark, str(tmp_path / "up2"))
    t.write(df, partition_by="d")
    t.update(F.col("v") > 50.0, set={"v": F.col("v") * 2})
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(1, 5.0), (2, None), (3, 180.0)}


def test_update_rejects_retypes_and_unknown_columns(spark, tmp_path):
    t = _table(spark, tmp_path, "up3")
    with pytest.raises(ValueError, match="unknown columns"):
        t.update("u = 1", set={"nope": F.lit(1)})
    with pytest.raises(ValueError, match="changed the schema"):
        # long -> double: when/otherwise widens the column type, which
        # would silently diverge the rewritten files from the manifest
        t.update("u = 1", set={"u": F.lit(1.5)})
    # failed updates commit nothing
    assert t.versions() == [1]


def test_delete_loses_cas_to_a_commit_racing_its_base(spark, tmp_path, monkeypatch):
    """A racing commit that CHANGED a partition the delete rewrites must
    surface ConcurrentCommit (rebasing would resurrect the racer's removed
    file or drop its rows); a racing commit that changed nothing the
    delete touches rebases automatically (r10 OCC retry, VERDICT r9 #6)."""
    t = _table(spark, tmp_path, "dl5")
    # interleave a racing writer between delete()'s base read and its
    # commit: hook _stage_files (runs after the base read) to claim the
    # next version first
    real_stage = MTable._stage_files

    def stage_and_race(self, df, partition_by):
        out = real_stage(self, df, partition_by)
        racer = t._read_manifest(1)
        manifest = {k: v for k, v in racer.items() if k != "full_distance"}
        manifest["version"] = 2
        manifest["parent"] = 1
        # the racer DROPS one of d0's files -> overlaps every un-pruned
        # delete (all files are rewrite candidates without `prune`)
        parts = {k: list(v) for k, v in racer["partitions"].items()}
        parts["d0"] = parts["d0"][:-1]
        manifest["partitions"] = parts
        manifest["stats"] = {
            rel: ent
            for rel, ent in (racer.get("stats") or {}).items()
            if rel != racer["partitions"]["d0"][-1]
        }
        t._commit(dict(manifest), 2)
        return out

    monkeypatch.setattr(MTable, "_stage_files", stage_and_race)
    with pytest.raises(ConcurrentCommit):
        t.delete("u = 3")
    monkeypatch.undo()
    # the racer's drop is intact and a retry on the fresh base lands
    assert t.versions()[-1] == 2
    v = t.delete("u = 3")
    assert v == 3
    assert t.read().where("u = 3").count() == 0


def test_delete_rebases_over_a_disjoint_racing_commit(spark, tmp_path, monkeypatch):
    t = _table(spark, tmp_path, "dl6", stats_cols=["u"])
    real_stage = MTable._stage_files
    raced = {}

    def stage_and_race(self, df, partition_by):
        out = real_stage(self, df, partition_by)
        if "done" not in raced:
            raced["done"] = True
            # racer appends NEW rows to a partition the pruned delete
            # provably does not touch (u stats exclude 3 in the new file)
            MTable(spark, t.path).write(
                spark.createDataFrame(
                    [(90000, 900, "d0")], "k long, u long, d string"
                ),
                mode="append",
            )
        return out

    monkeypatch.setattr(MTable, "_stage_files", stage_and_race)
    # prune restricts candidates to files whose u-range straddles 3; the
    # racer's new file (u=900 only) is not a candidate... but it landed in
    # partition d0, which the delete also rewrites files in -> same
    # partition changed -> conservative conflict
    with pytest.raises(ConcurrentCommit):
        t.delete("u = 3", prune=[("u", "=", 3)])
    monkeypatch.undo()

    # now the genuinely disjoint case: replace d2 with a file whose u
    # stats exclude 3, so the pruned delete's candidates live ONLY in
    # d0/d1 — then a racer replacing d2 again is provably disjoint and
    # the delete rebases over it
    t.overwrite_partitions(
        spark.createDataFrame([(91000, 910, "d2")], "k long, u long, d string"),
        partition_values=["d2"],
    )

    def stage_and_race2(self, df, partition_by):
        out = real_stage(self, df, partition_by)
        if "done2" not in raced:
            raced["done2"] = True
            MTable(spark, t.path).overwrite_partitions(
                spark.createDataFrame(
                    [(92000, 920, "d2")], "k long, u long, d string"
                ),
                partition_values=["d2"],
            )
        return out

    monkeypatch.setattr(MTable, "_stage_files", stage_and_race2)
    v0 = t.versions()[-1]
    v = t.delete("u = 3", prune=[("u", "=", 3)])
    monkeypatch.undo()
    # both landed, serialized: the racer's d2 replacement took v0+1 and
    # the delete rebased onto it at v0+2
    assert v == v0 + 2
    assert t.read().where("u = 3").count() == 0
    assert t.read(partitions=["d2"]).where("k = 92000").count() == 1
