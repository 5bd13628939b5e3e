"""Online-store sink contract, prediction log round trip, pandas_udf scoring."""

from __future__ import annotations

import json
import glob
import os
from datetime import datetime

from pyspark.sql import functions as F

from retailfeaturestore_spark.ml.scoring import LinearStubModel, ScoredModel, score_batch
from retailfeaturestore_spark.sources.pred_log import log_prediction, write_pred_log
from retailfeaturestore_spark.sources.redis_sink import (
    DictRedis,
    _row_fields,
    materialize_online,
)

from conftest import requires_testdata


def test_redis_field_contract():
    """Exact field map parity: stringified floats, one-hots, meta:* ISO."""
    row = {
        "customer_id": 17,
        "t_ref": datetime(2024, 1, 2, 3, 4, 5),
        "country": "UK",
        "spend_30d": 12.5,
        "txn_count_30d": None,
    }
    fields = _row_fields(row, ["spend_30d", "txn_count_30d"], ["UK", "FR"], "t_ref", "country")
    assert fields["spend_30d"] == "12.5"
    assert fields["txn_count_30d"] == "0.0"      # null -> stringified zero
    assert fields["country__UK"] == "1" and fields["country__FR"] == "0"
    assert fields["meta:t_ref"] == "2024-01-02T03:04:05"
    assert fields["meta:country"] == "UK"
    assert "meta:updated_at" in fields


def test_materialize_online_foreachpartition(spark, tmp_path):
    """True foreachPartition execution: executors append JSON per entity to a
    shared dir (stands in for the Redis pipeline across worker processes)."""
    out_dir = str(tmp_path / "sink")
    os.makedirs(out_dir, exist_ok=True)

    class FileRedis(DictRedis):
        def hset(self, key, mapping):
            with open(f"{out_dir}/{key.replace(':', '_')}.json", "w") as f:
                json.dump({"key": key, **mapping}, f)

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "UK", 10.0), (2, datetime(2024, 1, 2), "FR", 20.0)],
        "customer_id int, t_ref timestamp, country string, spend_30d double",
    )
    materialize_online(
        df, ["spend_30d"], onehot_categories=["UK", "FR"], client_factory=FileRedis
    )
    files = sorted(glob.glob(f"{out_dir}/*.json"))
    assert len(files) == 2
    rec = json.load(open(files[0]))
    assert rec["key"] == "fs:customer:1" and rec["spend_30d"] == "10.0"


def test_pred_log_single_and_bulk(spark, tmp_path):
    p = log_prediction(
        str(tmp_path / "preds"),
        customer_id=5,
        probability=0.7,
        threshold=0.5,
        latency_ms=3.2,
        model_artifact="m1",
        features={"spend_30d": 1.5},
    )
    assert os.path.exists(p) and "/date=" in p and p.endswith(".parquet")
    got = spark.read.parquet(str(tmp_path / "preds")).collect()[0]
    assert got.prediction == 1 and got.feat__spend_30d == 1.5

    bulk = spark.createDataFrame(
        [("2024-01-01T00:00:00+00:00", 1.0, 9, None, 0.5, 0.4, 0, "m1")],
        "ts_served string, latency_ms double, customer_id int, t_ref string,"
        "threshold double, probability double, prediction int, model_artifact string",
    )
    write_pred_log(bulk, str(tmp_path / "bulk"))
    assert spark.read.parquet(str(tmp_path / "bulk")).count() == 1


def test_score_batch_pandas_udf(spark):
    model = ScoredModel(
        model=LinearStubModel(weights=(0.1, 0.2), bias=0.0),
        feature_names=("f1", "f2"),
    )
    df = spark.createDataFrame(
        [(1, 2.0, 1.0), (2, None, 4.0), (3, 20.0, 0.0)],
        "id int, f1 double, f2 double",
    )
    out = {r.id: r for r in score_batch(spark, df, model, threshold=0.5).collect()}
    assert abs(out[1].probability - 0.4) < 1e-12       # 0.1*2 + 0.2*1
    assert abs(out[2].probability - 0.8) < 1e-12       # null f1 -> 0
    assert out[3].probability == 1.0                    # clipped
    assert out[1].prediction == 0 and out[2].prediction == 1


def test_score_batch_fills_missing_contract_columns(spark):
    model = ScoredModel(model=LinearStubModel(weights=(1.0, 1.0)), feature_names=("a", "b"))
    df = spark.createDataFrame([(1, 0.25)], "id int, a double")  # no column b
    out = score_batch(spark, df, model).collect()[0]
    assert abs(out.probability - 0.25) < 1e-12


def test_online_feature_service_typed_decode():
    from retailfeaturestore_spark.serving.feature_service import OnlineFeatureService

    class FakeClient:
        def hgetall(self, key):
            assert key == "fs:customer:7"
            return {
                b"spend_30d": b"12.5",
                b"country__UK": b"1",
                b"meta:t_ref": b"2024-01-02T03:04:05",
                b"weird": b"not-a-float",
            }

    svc = OnlineFeatureService(FakeClient())
    snap = svc.get_snapshot(7)
    assert snap["spend_30d"] == 12.5            # float parse
    assert snap["country__UK"] == 1.0
    assert snap["meta:t_ref"] == "2024-01-02T03:04:05"  # meta stays string
    assert snap["weird"] == "not-a-float"       # string fallback

    class EmptyClient:
        def hgetall(self, key):
            return {}

    assert OnlineFeatureService(EmptyClient()).get_snapshot(1) is None


def test_zscore_per_entity_grouped_map(spark):
    from retailfeaturestore_spark.ml.normalize_features import zscore_per_entity

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0)],
        "customer_id int, spend double",
    )
    out = zscore_per_entity(df, "customer_id", ["spend"]).collect()
    by = {}
    for r in out:
        by.setdefault(r.customer_id, []).append(round(r.spend_z, 6))
    import math
    sd = math.sqrt(((10-20)**2 + 0 + (30-20)**2) / 3)
    assert sorted(by[1]) == [round(-10/sd, 6), 0.0, round(10/sd, 6)]
    assert by[2] == [0.0]  # single row -> zero variance -> 0


def test_weighted_mean_udaf_matches_builtin(spark):
    from retailfeaturestore_spark.functions.python_udfs import weighted_mean_udaf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0, 2.0), (1, 20.0, 0.0), (1, 40.0, 2.0), (2, 5.0, 0.0)],
        "k int, v double, w double",
    )
    got = {
        r.k: r.wm
        for r in df.groupBy("k").agg(weighted_mean_udaf("v", "w").alias("wm")).collect()
    }
    exp = {
        r.k: r.wm
        for r in df.groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.col("v") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0)),
                F.lit(0.0),
            ).alias("wm")
        )
        .collect()
    }
    assert got == exp == {1: 25.0, 2: 0.0}


@requires_testdata
def test_word_ngrams_udtf_matches_column_shingles(spark):
    from retailfeaturestore_spark.functions.python_udfs import WordNGrams
    from retailfeaturestore_spark.functions.text import shingles
    from retailfeaturestore_spark.io import load_table
    from pyspark.sql import functions as F

    spark.udtf.register("word_ngrams", WordNGrams)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    docs.createOrReplaceTempView("docs_50")
    via_udtf = {
        (r.doc_id, r.ngram)
        for r in spark.sql(
            "SELECT d.doc_id, g.ngram FROM docs_50 d, LATERAL word_ngrams(d.text, 3) g"
        ).collect()
    }
    via_columns = {
        (r.doc_id, r.ngram)
        for r in docs.select(
            "doc_id", F.explode(shingles(F.col("text"), 3)).alias("ngram")
        ).collect()
    }
    assert via_udtf == via_columns
    assert len(via_udtf) > 0
