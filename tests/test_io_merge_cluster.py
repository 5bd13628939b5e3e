"""merge_upsert partition-scoped semantics + write_clustered stats locality."""

from __future__ import annotations

import glob
import os

import pytest
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from retailfeaturestore_spark.io import merge_upsert, write_clustered

# the merge_upsert tests build ALL their data via createDataFrame — no
# testdata gate (they must run in CI); only the clustered-stats test reads
# driver parquet, and it gates on the exact sf it reads.
requires_sf001 = pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"), reason="sf0.01 testdata absent"
)


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id long, t_ref string, score double"
    ).withColumn("t_ref", F.col("t_ref").cast("timestamp"))


def test_merge_upsert_updates_appends_preserves(spark, tmp_path):
    tgt = str(tmp_path / "gold")
    base = _snap(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-01 11:00:00", 2.0),
            (3, "2024-01-02 10:00:00", 3.0),
        ],
    )
    assert merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref") == 3

    updates = _snap(
        spark,
        [
            (1, "2024-01-01 10:00:00", 10.0),  # update existing key
            (9, "2024-01-01 12:00:00", 9.0),   # new key, touched partition
        ],
    )
    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")

    out = {
        (r.customer_id, str(r.t_ref)): r.score
        for r in spark.read.parquet(tgt).collect()
    }
    assert out[(1, "2024-01-01 10:00:00")] == 10.0  # replaced
    assert out[(2, "2024-01-01 11:00:00")] == 2.0   # untouched same partition
    assert out[(9, "2024-01-01 12:00:00")] == 9.0   # appended
    assert out[(3, "2024-01-02 10:00:00")] == 3.0   # untouched partition
    assert len(out) == 4


def test_merge_upsert_leaves_untouched_partitions_byte_stable(spark, tmp_path):
    tgt = str(tmp_path / "gold2")
    base = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 1.0), (3, "2024-01-02 10:00:00", 3.0)],
    )
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")
    day2 = sorted(glob.glob(os.path.join(tgt, "date=2024-01-02", "*.parquet")))
    before = [(p, os.path.getmtime(p), os.path.getsize(p)) for p in day2]

    updates = _snap(spark, [(1, "2024-01-01 10:00:00", 5.0)])
    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    after = [
        (p, os.path.getmtime(p), os.path.getsize(p))
        for p in sorted(glob.glob(os.path.join(tgt, "date=2024-01-02", "*.parquet")))
    ]
    assert before == after  # dynamic overwrite never rewrote day 2


@requires_sf001
def test_write_clustered_tightens_rowgroup_stats(spark, tmp_path):
    from retailfeaturestore_spark.io import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    write_clustered(li, clustered, ["l_orderkey"], n_files=8)
    li.repartition(8).write.parquet(scattered)

    def max_span(path):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(0)
                st = col.statistics
                spans.append(st.max - st.min)
        return max(spans)

    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    full = hi - lo
    # every clustered row group covers a narrow key range; the scattered
    # write's row groups each span ~the whole key domain
    assert max_span(clustered) < full / 4
    assert max_span(scattered) > full / 2


def test_table_diff_added_removed_changed(spark):
    from retailfeaturestore_spark.operators.incremental import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c2", None), (4, "d", 41.0), (5, "e", 50.0)],
        "id long, name string, v double",
    )
    got = {r["id"]: (r["change"], list(r["changed_cols"]))
           for r in table_diff(old, new, ["id"]).collect()}
    assert got == {
        1: ("removed", []),
        3: ("changed", ["name"]),       # null v on both sides: null-safe equal
        4: ("changed", ["v"]),
        5: ("added", []),
    }
    # unchanged key 2 emits nothing (asserted by the exact dict above)


def test_table_diff_multi_key_and_null_transitions(spark):
    from retailfeaturestore_spark.operators.incremental import table_diff

    old = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", None)], "a long, b string, v double"
    )
    new = spark.createDataFrame(
        [(1, "x", None), (1, "y", None)], "a long, b string, v double"
    )
    got = {(r["a"], r["b"]): (r["change"], list(r["changed_cols"]))
           for r in table_diff(old, new, ["a", "b"]).collect()}
    assert got == {(1, "x"): ("changed", ["v"])}  # value -> null IS a change


def test_table_diff_matches_bruteforce_on_random_tables(spark):
    """Differential vs a dict-based diff over randomized (seeded) tables:
    every key classified identically, changed column sets identical."""
    import random

    rng = random.Random(20260814)
    for _ in range(3):
        def mk(n):
            return [
                (
                    rng.randrange(12),
                    rng.choice(["a", "b", None]),
                    rng.choice([None, 1.0, 2.5]),
                )
                for _ in range(n)
            ]

        # unique keys per table (diff semantics are keyed)
        old_rows = {r[0]: r for r in mk(10)}
        new_rows = {r[0]: r for r in mk(10)}
        from retailfeaturestore_spark.operators.incremental import table_diff

        old = spark.createDataFrame(list(old_rows.values()), "id long, s string, v double")
        new = spark.createDataFrame(list(new_rows.values()), "id long, s string, v double")
        got = {r["id"]: (r["change"], list(r["changed_cols"]))
               for r in table_diff(old, new, ["id"]).collect()}

        want = {}
        for k in set(old_rows) | set(new_rows):
            if k not in old_rows:
                want[k] = ("added", [])
            elif k not in new_rows:
                want[k] = ("removed", [])
            else:
                cols = [c for c, i in (("s", 1), ("v", 2))
                        if old_rows[k][i] != new_rows[k][i]]
                if cols:
                    want[k] = ("changed", cols)
        assert got == want


def test_table_diff_null_keys_and_empty_compare(spark):
    """NULL key components match null-safely (no phantom removed+added),
    and compare_cols=[] classifies added/removed only."""
    from retailfeaturestore_spark.operators.incremental import table_diff

    old = spark.createDataFrame([(None, "a"), (1, "b")], "id long, s string")
    new = spark.createDataFrame([(None, "a2"), (2, "c")], "id long, s string")
    got = {r["id"]: r["change"] for r in table_diff(old, new, ["id"]).collect()}
    assert got == {None: "changed", 1: "removed", 2: "added"}
    only_keys = {r["id"]: r["change"]
                 for r in table_diff(old, new, ["id"], compare_cols=[]).collect()}
    assert only_keys == {1: "removed", 2: "added"}


def test_merge_upsert_crash_before_swap_leaves_target_intact(
    spark, tmp_path, monkeypatch
):
    """Crash-window bound (VERDICT r5 #2): a failure after the staging
    write but before ANY rename leaves the table byte-identical to the
    pre-merge state — readers never see the staging dir — and a plain
    re-run converges."""
    from retailfeaturestore_spark import io as rio

    tgt = str(tmp_path / "gold3")
    base = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0)],
    )
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")
    before = {
        (r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()
    }

    def boom(staging, target_path):
        raise OSError("injected crash before the first rename")

    monkeypatch.setattr(rio, "_swap_partition_dirs", boom)
    updates = _snap(spark, [(1, "2024-01-01 10:00:00", 9.0)])
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    after = {
        (r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()
    }
    assert after == before  # fully-old: the crash published nothing
    assert any(
        n.startswith("_staging_") for n in os.listdir(tgt)
    )  # residue exists but is reader-invisible

    monkeypatch.undo()
    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    final = {
        (r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()
    }
    assert final == {(1, 9.0), (2, 2.0)}
    assert not any(
        n.startswith(("_staging_", "_trash_")) for n in os.listdir(tgt)
    )  # re-run swept the crashed run's residue


def test_merge_upsert_crash_mid_swap_is_per_partition_atomic(
    spark, tmp_path, monkeypatch
):
    """Crash-window bound, the mid-swap case: with TWO touched partitions,
    dying between their renames leaves partition A fully-new and partition
    B fully-old — never a half-written directory (the dynamic-overwrite
    failure mode this staged swap replaces) — and re-running the identical
    merge converges to the final state."""
    tgt = str(tmp_path / "gold4")
    base = _snap(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-02 10:00:00", 2.0),
            (3, "2024-01-03 10:00:00", 3.0),
        ],
    )
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")

    real_rename = os.rename
    calls = {"n": 0}

    def flaky_rename(src, dst):
        # each existing-partition swap is two renames (old->trash,
        # staged->live); die on the 3rd = after partition 1 commits,
        # before partition 2 starts
        calls["n"] += 1
        if calls["n"] == 3:
            raise OSError("injected crash between partition renames")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky_rename)
    updates = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 10.0), (2, "2024-01-02 10:00:00", 20.0)],
    )
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    monkeypatch.undo()

    rows = {
        (r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()
    }
    # date=2024-01-01 swapped (fully-new), date=2024-01-02 not yet
    # (fully-old), untouched date=2024-01-03 untouched
    assert rows == {(1, 10.0), (2, 2.0), (3, 3.0)}

    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    rows = {
        (r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()
    }
    assert rows == {(1, 10.0), (2, 20.0), (3, 3.0)}
    assert not any(
        n.startswith(("_staging_", "_trash_")) for n in os.listdir(tgt)
    )


def test_zorder_clustering_tightens_both_columns(spark, tmp_path):
    """Z-order (r6): lexicographic clustering on [a, b] gives column b
    nothing (its per-file span stays ~the full domain); interleaved-bit
    z-values shrink BOTH columns' spans, so single-column filters on
    either prune files from footer stats alone."""
    import pyarrow.parquet as pq

    from retailfeaturestore_spark.io import write_clustered

    n = 200_000
    # two independent uniform dimensions (md5-derived, deterministic)
    df = spark.range(n).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("za#"), F.col("id").cast("string"))), 1, 8), 16, 10).cast("long") % 100_000).alias("a"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("zb#"), F.col("id").cast("string"))), 1, 8), 16, 10).cast("long") % 100_000).alias("b"),
    )
    lexi, zord = str(tmp_path / "lexi"), str(tmp_path / "zord")
    write_clustered(df, lexi, ["a", "b"], n_files=16)
    write_clustered(df, zord, ["a", "b"], n_files=16, zorder=True)

    def mean_file_span(path, col_name):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.ParquetFile(f)
            idx = meta.schema_arrow.names.index(col_name)
            lo, hi = None, None
            for rg in range(meta.metadata.num_row_groups):
                st = meta.metadata.row_group(rg).column(idx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    full = 100_000
    # lexicographic: a tight, b useless
    assert mean_file_span(lexi, "a") < full / 8
    assert mean_file_span(lexi, "b") > full * 0.8
    # z-order: BOTH columns meaningfully tighter than the full domain
    # (16 files over 2 dims -> ~1/4 of the domain per dim ideally)
    assert mean_file_span(zord, "a") < full * 0.45
    assert mean_file_span(zord, "b") < full * 0.45


# ---------------------------------------------------------------------------
# URI-target copy-then-commit-marker protocol (r8): same guarantees as the
# local staged swap, driven through the Hadoop FileSystem API.  file:// is a
# real URI scheme to merge_upsert (takes the object-store branch) while
# remaining inspectable on local disk.
# ---------------------------------------------------------------------------


def _uri(tmp_path, name):
    return f"file://{tmp_path}/{name}"


def test_uri_merge_updates_appends_preserves_no_residue(spark, tmp_path):
    tgt = _uri(tmp_path, "gold_uri")
    base = _snap(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-01 11:00:00", 2.0),
            (3, "2024-01-02 10:00:00", 3.0),
        ],
    )
    assert merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref") == 3
    updates = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 10.0), (9, "2024-01-01 12:00:00", 9.0)],
    )
    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    out = {
        (r.customer_id, str(r.t_ref)): r.score
        for r in spark.read.parquet(tgt).collect()
    }
    assert out[(1, "2024-01-01 10:00:00")] == 10.0
    assert out[(2, "2024-01-01 11:00:00")] == 2.0
    assert out[(9, "2024-01-01 12:00:00")] == 9.0
    assert out[(3, "2024-01-02 10:00:00")] == 3.0
    names = os.listdir(str(tmp_path / "gold_uri"))
    assert not any(n.startswith(("_staging_", "_commit_")) for n in names), names


def test_uri_merge_crash_before_commit_marker_publishes_nothing(
    spark, tmp_path, monkeypatch
):
    """Pre-marker crash: the table reads byte-identical to the pre-merge
    state; the next merge discards the uncommitted staging and converges."""
    from retailfeaturestore_spark import io as rio

    tgt = _uri(tmp_path, "gold_uri2")
    local = str(tmp_path / "gold_uri2")
    base = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0)],
    )
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")
    before = {(r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()}

    def boom(spark_, target_path, token):
        raise OSError("injected crash before the commit marker")

    monkeypatch.setattr(rio, "_write_commit_marker", boom)
    updates = _snap(spark, [(1, "2024-01-01 10:00:00", 9.0)])
    with pytest.raises(OSError, match="injected"):
        merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    after = {(r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()}
    assert after == before  # nothing published
    assert any(n.startswith("_staging_") for n in os.listdir(local))
    assert not any(n.startswith("_commit_") for n in os.listdir(local))

    monkeypatch.undo()
    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    final = {(r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()}
    assert final == {(1, 9.0), (2, 2.0)}
    assert not any(
        n.startswith(("_staging_", "_commit_")) for n in os.listdir(local)
    )


def test_uri_merge_crash_after_marker_recovers_to_fully_new(
    spark, tmp_path, monkeypatch
):
    """Post-marker crash (the commit point passed, publish never ran): the
    next call's recovery APPLIES the committed staging before reading the
    table, so the merge converges to fully-new and leaves no residue."""
    from retailfeaturestore_spark import io as rio

    tgt = _uri(tmp_path, "gold_uri3")
    local = str(tmp_path / "gold_uri3")
    base = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0)],
    )
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")

    real_apply = rio._apply_uri_merge

    def boom(spark_, target_path, token):
        raise OSError("injected crash after the commit marker")

    monkeypatch.setattr(rio, "_apply_uri_merge", boom)
    updates = _snap(spark, [(1, "2024-01-01 10:00:00", 9.0)])
    with pytest.raises(OSError, match="injected"):
        merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    names = os.listdir(local)
    assert any(n.startswith("_commit_") for n in names)  # committed
    assert any(n.startswith("_staging_") for n in names)  # unpublished

    monkeypatch.setattr(rio, "_apply_uri_merge", real_apply)
    # recovery inside the NEXT merge publishes the committed slice first,
    # then the re-run of the same updates is a no-op-by-value merge
    merge_upsert(spark, tgt, updates, ["customer_id", "t_ref"], "t_ref")
    final = {(r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()}
    assert final == {(1, 9.0), (2, 2.0)}
    assert not any(
        n.startswith(("_staging_", "_commit_")) for n in os.listdir(local)
    )


def test_uri_merge_recovery_is_idempotent_mid_apply(spark, tmp_path):
    """Re-applying a committed merge from ANY intermediate publish state
    converges: simulate a mid-apply crash by re-running _apply on a
    half-published partition."""
    from retailfeaturestore_spark import io as rio

    tgt = _uri(tmp_path, "gold_uri4")
    base = _snap(spark, [(1, "2024-01-01 10:00:00", 1.0)])
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")
    # stage a committed update manually
    updates = _snap(spark, [(1, "2024-01-01 10:00:00", 7.0)])
    token = "deadbeef00000000"
    rio.write_date_partitioned(updates, f"{tgt}/_staging_{token}", "t_ref")
    rio._write_commit_marker(spark, tgt, token)
    # first apply publishes; a second apply of the SAME token must be a
    # clean no-op path even though staging is gone (recovery drops marker)
    rio._apply_uri_merge(spark, tgt, token)
    rio._recover_uri_merge(spark, tgt)
    out = {(r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()}
    assert out == {(1, 7.0)}
    local = str(tmp_path / "gold_uri4")
    assert not any(
        n.startswith(("_staging_", "_commit_")) for n in os.listdir(local)
    )


def test_uri_merge_staging_outlives_apply_until_marker_cleared(
    spark, tmp_path
):
    """ADVICE r9 (high): _apply_uri_merge must NOT delete the staging
    prefix — a crash mid-staging-delete would leave the marker pointing at
    a PARTIAL staged set, and recovery would re-apply it and delete live
    files absent from it (silent row loss).  The publish order is: apply ->
    marker delete -> staging delete, so the dangerous (marker + partial
    staging) state can no longer arise; a marker-less partial staging dir
    is plain residue."""
    from retailfeaturestore_spark import io as rio

    tgt = _uri(tmp_path, "gold_uri5")
    local = str(tmp_path / "gold_uri5")
    base = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0)],
    )
    merge_upsert(spark, tgt, base, ["customer_id", "t_ref"], "t_ref")
    # stage + commit an update touching both partitions, then apply
    updates = _snap(
        spark,
        [(1, "2024-01-01 10:00:00", 7.0), (2, "2024-01-02 10:00:00", 8.0)],
    )
    token = "feedface00000000"
    rio.write_date_partitioned(updates, f"{tgt}/_staging_{token}", "t_ref")
    rio._write_commit_marker(spark, tgt, token)
    rio._apply_uri_merge(spark, tgt, token)
    # THE regression: staging must still be present while the marker is
    names = os.listdir(local)
    assert f"_staging_{token}" in names and f"_commit_{token}.json" in names
    # crash simulation: marker cleared, staging delete dies half-way
    fs, _, jvm = rio._hadoop_fs(spark, tgt)
    Path = jvm.org.apache.hadoop.fs.Path
    fs.delete(Path(f"{tgt}/_commit_{token}.json"), False)
    import shutil

    shutil.rmtree(
        os.path.join(local, f"_staging_{token}", "date=2024-01-02"),
        ignore_errors=True,
    )  # partial staging left behind, NO marker
    rio._recover_uri_merge(spark, tgt)
    out = {(r.customer_id, r.score) for r in spark.read.parquet(tgt).collect()}
    assert out == {(1, 7.0), (2, 8.0)}  # fully-new, nothing lost
    assert not any(
        n.startswith(("_staging_", "_commit_")) for n in os.listdir(local)
    )
