"""Vectorized batch model scoring (SURVEY.md §2.10).

The reference scores row-at-a-time in the serving process
(``model.predict_proba`` per request, ``serving/app.py:47``;
``serving/local_infer.py:82,116`` loops a head-n batch).  The Spark-first
shape is an Arrow-batched pandas_udf with the model broadcast once per
executor: 10-100x over row-at-a-time Python, and the scoring plan is just
``select(predict_udf(*feature_cols))`` — no collect, no driver loop.

LightGBM/sklearn are not installed in this environment, so the model object
is protocol-typed (``predict_proba(X) -> ndarray[n, 2]``): ``LinearStubModel``
is a deterministic logistic-free linear scorer used by tests; a real
lgbm/sklearn pickle drops in unchanged (it satisfies the same protocol).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["LinearStubModel", "score_batch", "ScoredModel"]


@dataclass
class LinearStubModel:
    """Deterministic predict_proba-protocol model: clipped linear blend.

    Avoids transcendentals (no sigmoid) so scores are engine-reproducible;
    weights frozen at construction (the 'artifact').
    """

    weights: tuple[float, ...]
    bias: float = 0.0
    name: str = "linear_stub_v1"

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        raw = X @ np.asarray(self.weights, dtype="float64") + self.bias
        p1 = np.clip(raw, 0.0, 1.0)
        return np.stack([1.0 - p1, p1], axis=1)


@dataclass
class ScoredModel:
    """Bundle of model + ordered feature contract (the engine's
    feature_names.txt analogue, held as code)."""

    model: object
    feature_names: tuple[str, ...]


def score_batch(
    spark: SparkSession,
    features: DataFrame,
    scored: ScoredModel,
    threshold: float = 0.5,
    proba_col: str = "probability",
) -> DataFrame:
    """Append probability + decision columns via a broadcast-model pandas_udf.

    Missing contract columns are zero-filled and column order is enforced —
    the reference's ``row_to_X`` alignment (``serving/feature_service.py:56-59``).
    """
    bc = spark.sparkContext.broadcast(scored.model)
    names = list(scored.feature_names)

    @pandas_udf("double")
    def predict(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype="float64", na_value=0.0) for c in cols])
        return pd.Series(bc.value.predict_proba(X)[:, 1])

    df = features
    for n in names:
        if n not in df.columns:
            df = df.withColumn(n, F.lit(0.0))
    inputs: list[Column] = [F.coalesce(F.col(n).cast("double"), F.lit(0.0)) for n in names]
    return df.withColumn(proba_col, predict(*inputs)).withColumn(
        "prediction", (F.col(proba_col) >= F.lit(threshold)).cast("int")
    )
