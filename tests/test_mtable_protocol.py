"""mtable protocol versioning (VERDICT r10 next-round #8): manifests carry
``min_reader_version`` / ``min_writer_version`` (the Delta
protocol-evolution recipe), a future requirement is refused LOUDLY instead
of silently misread, and pre-stamp manifests stay forward-compatible.
"""

from __future__ import annotations

import json
import os

import pytest

from retailfeaturestore_spark.sources.mtable import (
    MTable,
    ProtocolVersionError,
)


def _kx(spark, rows):
    return spark.createDataFrame(rows, "k string, x long")


def _edit_manifest(t: MTable, version: int, **fields) -> None:
    mp = t._manifest_path(version)
    raw = json.loads(open(mp).read())
    for k, v in fields.items():
        if v is None:
            raw.pop(k, None)
        else:
            raw[k] = v
    with open(mp, "w") as f:
        json.dump(raw, f)
    crc = os.path.join(os.path.dirname(mp), "." + os.path.basename(mp) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_commits_stamp_protocol_versions(spark, tmp_path):
    t = MTable(spark, str(tmp_path / "t"))
    t.write(_kx(spark, [("a", 1)]), partition_by="k")
    t.merge_upsert(_kx(spark, [("a", 2)]), ["k"])
    for v in (1, 2):
        raw = json.loads(open(t._manifest_path(v)).read())
        assert raw["min_reader_version"] == 1
        assert raw["min_writer_version"] == 1


def test_pre_stamp_manifest_reads_and_writes(spark, tmp_path):
    # a table committed before the stamp existed (fields absent) is
    # requirement 1 by definition: reads and new commits both work
    t = MTable(spark, str(tmp_path / "old"))
    t.write(_kx(spark, [("a", 1)]), partition_by="k")
    _edit_manifest(t, 1, min_reader_version=None, min_writer_version=None)
    t2 = MTable(spark, str(tmp_path / "old"))
    assert {(r.k, r.x) for r in t2.read().collect()} == {("a", 1)}
    t2.merge_upsert(_kx(spark, [("a", 2)]), ["k"])
    assert {(r.k, r.x) for r in t2.read().collect()} == {("a", 2)}


def test_future_reader_requirement_refuses_loudly(spark, tmp_path):
    t = MTable(spark, str(tmp_path / "fr"))
    t.write(_kx(spark, [("a", 1)]), partition_by="k")
    _edit_manifest(t, 1, min_reader_version=99)
    t2 = MTable(spark, str(tmp_path / "fr"))
    with pytest.raises(ProtocolVersionError, match="reader protocol 99"):
        t2.read().collect()
    # and the writer path refuses too (it must read the parent manifest)
    with pytest.raises(ProtocolVersionError):
        t2.merge_upsert(_kx(spark, [("a", 2)]), ["k"])


def test_future_writer_requirement_blocks_commits_not_reads(spark, tmp_path):
    t = MTable(spark, str(tmp_path / "fw"))
    t.write(_kx(spark, [("a", 1)]), partition_by="k")
    _edit_manifest(t, 1, min_writer_version=7)
    t2 = MTable(spark, str(tmp_path / "fw"))
    # reads stay available — only new commits are refused
    assert {(r.k, r.x) for r in t2.read().collect()} == {("a", 1)}
    with pytest.raises(ProtocolVersionError, match="writer protocol 7"):
        t2.merge_upsert(_kx(spark, [("a", 2)]), ["k"])
    with pytest.raises(ProtocolVersionError):
        t2.delete("x = 1")
    assert t2.versions() == [1]


def test_writer_requirement_propagates_through_commits(spark, tmp_path):
    # a future-writer table that somehow gains an old-writer-readable
    # version must KEEP refusing old writers: the stamp carries forward as
    # max(parent, build) on every commit
    t = MTable(spark, str(tmp_path / "prop"))
    t.write(_kx(spark, [("a", 1)]), partition_by="k")
    t.merge_upsert(_kx(spark, [("a", 2)]), ["k"])
    raw = json.loads(open(t._manifest_path(2)).read())
    assert raw["min_writer_version"] == 1
    _edit_manifest(t, 2, min_writer_version=1)  # no-op edit keeps shape
    t2 = MTable(spark, str(tmp_path / "prop"))
    t2.merge_upsert(_kx(spark, [("a", 3)]), ["k"])
    raw3 = json.loads(open(t2._manifest_path(3)).read())
    assert raw3["min_writer_version"] == 1
    assert raw3["min_reader_version"] == 1
