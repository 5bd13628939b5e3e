"""Distributed logistic regression (ml/distributed.py): transform-parity of
the extracted-coefficient wrapper vs pyspark.ml's own scorer, learning on a
separable synthetic, end-to-end on the real training-set build, and
determinism across refits."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from retailfeaturestore_spark.ml.distributed import LogisticModel, fit_lr_distributed
from retailfeaturestore_spark.ml.metrics import exact_auc
from retailfeaturestore_spark.ml.scoring import score_batch

from conftest import TESTDATA_SF, requires_testdata


def _synthetic(spark, n=2000):
    """Deterministic near-separable binary set: y = [2*x1 - x2 + 0.25*noise > 0],
    features derived from the row index so the frame is seedless."""
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 37 % 100) / 10.0 - 5.0).alias("x1"),
        ((F.col("id") * 53 % 100) / 10.0 - 5.0).alias("x2"),
        ((F.col("id") * 71 % 100) / 100.0 - 0.5).alias("noise"),
    )
    return df.withColumn(
        "y", ((2.0 * F.col("x1") - F.col("x2") + 0.25 * F.col("noise")) > 0).cast("int")
    )


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_lr_learns_separable_boundary(spark):
    train = _synthetic(spark)
    scored_model = fit_lr_distributed(train, ["x1", "x2"], "y")
    w1, w2 = scored_model.model.weights
    # the true boundary is 2*x1 - x2 = 0: signs and ~2:1 ratio must recover
    assert w1 > 0 and w2 < 0
    assert 1.2 < w1 / -w2 < 3.0
    out = score_batch(spark, train, scored_model)
    auc = exact_auc(out, "probability", "y").collect()[0]["auc"]
    assert auc > 0.99


def test_wrapper_matches_sparkml_transform(spark):
    """The LogisticModel wrapper must reproduce pyspark.ml's own transform
    probabilities — proves the coefficient extraction loses nothing."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    train = _synthetic(spark, n=500)
    scored_model = fit_lr_distributed(train, ["x1", "x2"], "y", reg_param=0.1, max_iter=50)

    assembled = VectorAssembler(inputCols=["x1", "x2"], outputCol="__features").transform(
        train.select(
            F.col("x1").cast("double"), F.col("x2").cast("double"), F.col("y").cast("double").alias("__label")
        )
    )
    ref = (
        LogisticRegression(
            featuresCol="__features", labelCol="__label", regParam=0.1, maxIter=50, tol=1e-9
        )
        .fit(assembled)
        .transform(assembled)
        .select("x1", "x2", "probability")
        .collect()
    )
    m = scored_model.model
    for r in ref:
        p_ref = float(r["probability"][1])
        p_wrap = float(m.predict_proba(np.array([[r["x1"], r["x2"]]]))[0, 1])
        assert abs(p_ref - p_wrap) < 1e-9


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_refit_is_deterministic(spark):
    train = _synthetic(spark, n=800)
    a = fit_lr_distributed(train, ["x1", "x2"], "y")
    b = fit_lr_distributed(train.repartition(7), ["x1", "x2"], "y")
    assert a.model.weights == pytest.approx(b.model.weights, abs=1e-6)
    assert a.model.bias == pytest.approx(b.model.bias, abs=1e-6)


def test_null_features_zero_filled(spark):
    train = _synthetic(spark, n=300).withColumn(
        "x1", F.when(F.col("id") % 7 == 0, None).otherwise(F.col("x1"))
    )
    scored_model = fit_lr_distributed(train, ["x1", "x2"], "y")
    assert all(np.isfinite(scored_model.model.weights)) and np.isfinite(scored_model.model.bias)


def _xor_frame(spark, n=1200):
    """Nonlinear boundary y = [x1*x2 > 0]: linearly inseparable by
    construction — the case that motivates the tree path."""
    df = spark.range(n).select(
        ((F.col("id") * 37 % 100) / 10.0 - 5.0).alias("x1"),
        ((F.col("id") * 53 % 100) / 10.0 - 5.0).alias("x2"),
    )
    return df.withColumn("y", ((F.col("x1") * F.col("x2")) > 0).cast("int"))


@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_gbt_learns_nonlinear_boundary_where_lr_cannot(spark):
    train = _xor_frame(spark)
    lr = fit_lr_distributed(train, ["x1", "x2"], "y")
    lr_auc = exact_auc(score_batch(spark, train, lr), "probability", "y").collect()[0]["auc"]

    from retailfeaturestore_spark.ml.distributed import fit_gbt_distributed, score_batch_spark

    bundle = fit_gbt_distributed(train, ["x1", "x2"], "y", max_iter=15, max_depth=4)
    out = score_batch_spark(bundle, train)
    gbt_auc = exact_auc(out, "probability", "y").collect()[0]["auc"]
    assert lr_auc < 0.65  # linear model genuinely cannot express the boundary
    assert gbt_auc > 0.95
    # output contract matches score_batch: scalar proba + int decision
    types = dict(out.dtypes)
    assert types["probability"] == "double" and types["prediction"] == "int"


def test_gbt_bundle_save_load_roundtrip(spark, tmp_path):
    from retailfeaturestore_spark.ml.distributed import (
        fit_gbt_distributed,
        load_spark_bundle,
        save_spark_bundle,
        score_batch_spark,
    )

    train = _xor_frame(spark, n=400)
    bundle = fit_gbt_distributed(train, ["x1", "x2"], "y", max_iter=5, max_depth=3)
    paths = save_spark_bundle(bundle, str(tmp_path / "artifact"))
    assert "spark_model" in paths["model"]
    reloaded = load_spark_bundle(str(tmp_path / "artifact"))
    assert reloaded.feature_names == bundle.feature_names
    a = sorted(
        (r["x1"], r["x2"], r["probability"])
        for r in score_batch_spark(bundle, train).collect()
    )
    b = sorted(
        (r["x1"], r["x2"], r["probability"])
        for r in score_batch_spark(reloaded, train).collect()
    )
    assert a == b


def test_score_batch_spark_zero_fills_missing_contract_columns(spark):
    from retailfeaturestore_spark.ml.distributed import fit_gbt_distributed, score_batch_spark

    train = _xor_frame(spark, n=300)
    bundle = fit_gbt_distributed(train, ["x1", "x2"], "y", max_iter=3, max_depth=2)
    out = score_batch_spark(bundle, train.drop("x2"))  # serving frame missing a column
    assert out.count() == 300
    assert "probability" in out.columns and "prediction" in out.columns


@requires_testdata
@pytest.mark.slow  # driver verify-window fit (r14): see pyproject addopts
def test_distributed_fit_on_training_set_build(spark):
    """End-to-end: the engine's own training-set build feeds the distributed
    fit; the fitted model must beat chance on its churn label and flow
    through the SAME score_batch surface as the driver-fit path."""
    from retailfeaturestore_spark.queries import REGISTRY

    ts = REGISTRY["training_set_build"].fn(spark, TESTDATA_SF)
    feature_cols = [
        c for c, t in ts.dtypes
        if c not in ("customer_id", "t_ref", "churn_30d", "is_train") and t in ("double", "bigint", "int")
    ]
    assert feature_cols, f"no numeric feature columns found in {ts.columns}"
    scored_model = fit_lr_distributed(ts, feature_cols, "churn_30d", reg_param=0.01)
    out = score_batch(spark, ts, scored_model)
    row = exact_auc(out, "probability", "churn_30d").collect()[0]
    assert row["n_pos"] > 0 and row["n_neg"] > 0
    assert row["auc"] > 0.55  # trained distributed, better than chance on its own label
