"""LogStore commit seam (VERDICT r10 next-round #6): the manifest CAS is a
pluggable put-if-absent, the default Hadoop implementation keeps the
existing semantics, and a conditional-PUT store (the S3 shape) serializes
two racing writers through the same ConcurrentCommit/retry protocol.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from retailfeaturestore_spark.sources.mtable import (
    ConcurrentCommit,
    HadoopLogStore,
    LogStore,
    MTable,
    S3ConditionalPutLogStore,
)


def _kx(spark, rows):
    return spark.createDataFrame(rows, "k string, x long")


class DictConditionalPutStore(LogStore):
    """In-memory conditional-PUT object store: put_if_absent is atomic
    under a lock, exactly the guarantee S3's If-None-Match:* provides.
    Manifest READS still go to the filesystem, so every successful put
    mirrors to disk — the store is the COMMIT arbiter, the FS is the
    storage plane (the Delta DynamoDB-LogStore split)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._keys: set[str] = set()
        self.puts: list[str] = []

    def put_if_absent(self, spark, path: str, data: bytes) -> bool:
        with self._lock:
            self.puts.append(path)
            if path in self._keys or os.path.exists(path):
                return False
            self._keys.add(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        return True


def test_dict_store_two_racers_serialize(spark, tmp_path):
    path = str(tmp_path / "t")
    store = DictConditionalPutStore()
    t1 = MTable(spark, path, log_store=store)
    t1.write(_kx(spark, [("a", 1)]), partition_by="k")
    # two handles race to commit version 2 on the same base
    t2 = MTable(spark, path, log_store=store)
    t1.merge_upsert(_kx(spark, [("a", 2)]), ["k"])  # wins v2
    with pytest.raises(ConcurrentCommit):
        # loser: staged against v1, CAS on v2 must fail through the store
        t2.overwrite_partitions(
            _kx(spark, [("a", 99)]), partition_values=["a"], base_version=1
        )
    # retry on a fresh base succeeds and lands v3
    t2.overwrite_partitions(_kx(spark, [("a", 99)]), partition_values=["a"])
    t3 = MTable(spark, path, log_store=store)
    assert {(r.k, r.x) for r in t3.read().collect()} == {("a", 99)}
    assert t3.versions() == [1, 2, 3]
    # every commit went through the seam
    assert len([p for p in store.puts if "_manifest" in p]) >= 4


def test_hadoop_store_is_the_default_and_wins_once(spark, tmp_path):
    path = str(tmp_path / "h")
    t = MTable(spark, path)
    assert isinstance(t.log_store, HadoopLogStore)
    t.write(_kx(spark, [("a", 1)]), partition_by="k")
    # direct seam probe: second put of the same manifest path loses
    mp = t._manifest_path(1)
    assert t.log_store.put_if_absent(spark, mp, b"{}") is False
    # and the manifest bytes were NOT clobbered by the losing put
    assert json.loads(open(mp).read())["version"] == 1


class FakeS3Client:
    """Mock boto3 S3 client honoring IfNoneMatch=* with a 412 on conflict."""

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        assert IfNoneMatch == "*"
        if (Bucket, Key) in self.objects:
            e = RuntimeError("PreconditionFailed")
            e.response = {
                "Error": {"Code": "PreconditionFailed"},
                "ResponseMetadata": {"HTTPStatusCode": 412},
            }
            raise e
        self.objects[(Bucket, Key)] = Body


def test_s3_conditional_put_contract():
    client = FakeS3Client()
    store = S3ConditionalPutLogStore(client=client)
    p = "s3a://bucket/tbl/_manifest/v0000000001.json"
    assert store.put_if_absent(None, p, b"m1") is True
    assert store.put_if_absent(None, p, b"m2") is False  # lost CAS -> False
    assert client.objects[("bucket", "tbl/_manifest/v0000000001.json")] == b"m1"


def test_s3_store_reraises_non_cas_errors():
    class BrokenClient:
        def put_object(self, **kw):
            e = RuntimeError("AccessDenied")
            e.response = {
                "Error": {"Code": "AccessDenied"},
                "ResponseMetadata": {"HTTPStatusCode": 403},
            }
            raise e

    store = S3ConditionalPutLogStore(client=BrokenClient())
    with pytest.raises(RuntimeError, match="AccessDenied"):
        store.put_if_absent(None, "s3a://b/k", b"x")


def test_s3_store_retries_409_until_definitive():
    """409 = outcome unknown (a racing conditional PUT in flight): retry
    until a definitive 200 (we won) or 412 (lost CAS), never map it
    straight to ConcurrentCommit."""

    class Flaky409Client:
        def __init__(self, outcomes):
            self.outcomes = list(outcomes)
            self.calls = 0

        def put_object(self, **kw):
            self.calls += 1
            o = self.outcomes.pop(0)
            if o == "ok":
                return
            e = RuntimeError(o)
            e.response = {
                "Error": {"Code": o},
                "ResponseMetadata": {
                    "HTTPStatusCode": 409
                    if o == "ConditionalRequestConflict"
                    else 412
                },
            }
            raise e

    # 409, 409, then we win
    c = Flaky409Client(
        ["ConditionalRequestConflict", "ConditionalRequestConflict", "ok"]
    )
    store = S3ConditionalPutLogStore(client=c)
    assert store.put_if_absent(None, "s3a://b/k", b"m") is True
    assert c.calls == 3
    # 409 then definitive 412: lost CAS
    c = Flaky409Client(["ConditionalRequestConflict", "PreconditionFailed"])
    store = S3ConditionalPutLogStore(client=c)
    assert store.put_if_absent(None, "s3a://b/k", b"m") is False
