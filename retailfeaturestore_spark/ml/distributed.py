"""Distributed model fitting (pyspark.ml) behind the engine's model protocol.

The reference trains LightGBM on a driver-side matrix
(``jobs/make_training_and_train.py:62-93``), and this engine's default path
mirrors that honestly (``training.fit_model`` after the guarded
``collect_training_frame``): the distributed plan shrinks the data, the fit
is single-node.  That is the right trade at feature-store scale (one row
per customer × snapshot), but a 100 TB training set whose matrix does NOT
fit a driver needs the fit itself distributed.  This module is that path:
``pyspark.ml.classification.LogisticRegression`` (ships inside pyspark —
no extra dependency) over the same training frame, with the fitted
coefficients re-wrapped into a plain ``predict_proba``-protocol object so
EVERY downstream surface — Arrow-batched ``score_batch``, the artifact
registry, serving — is byte-identical to the driver-fit path.  Linear
models collapse to their coefficients, so nothing downstream ever needs a
JVM ``Model.transform``; the Spark fit is purely a scale-out of the
estimation.

Scale shape: L-BFGS over ``treeAggregate`` gradient sums — per-iteration
cost is one pass over the partitions with a depth-2 reduce; no stage ever
materializes the matrix driver-side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scoring import ScoredModel

__all__ = ["LogisticModel", "fit_lr_distributed"]


@dataclass
class LogisticModel:
    """predict_proba-protocol logistic scorer: sigmoid(X @ w + b).

    The driver-side twin of a fitted ``LogisticRegressionModel`` — same
    math pyspark.ml applies inside ``transform`` (tested to 1e-9 parity),
    held as plain floats so it pickles into the artifact registry and
    broadcasts into ``score_batch`` exactly like every other model here.
    """

    weights: tuple[float, ...]
    bias: float = 0.0
    name: str = "spark_lr_v1"

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        raw = X @ np.asarray(self.weights, dtype="float64") + self.bias
        p1 = 1.0 / (1.0 + np.exp(-raw))
        return np.stack([1.0 - p1, p1], axis=1)


def fit_lr_distributed(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str,
    reg_param: float = 0.0,
    elastic_net_param: float = 0.0,
    max_iter: int = 100,
    tol: float = 1e-9,
    standardize: bool = True,
) -> ScoredModel:
    """Fit logistic regression DISTRIBUTED and return a ``ScoredModel``
    whose model is a plain :class:`LogisticModel`.

    Nulls in feature columns are zero-filled (the same contract
    ``score_batch`` and serving's ``row_to_vector`` apply — train/serve
    skew guard); the label must be 0/1.  Deterministic: L-BFGS from a zero
    initial vector on a fixed dataset has no randomized state, so repeated
    fits yield identical coefficients.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    cols = [F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c) for c in feature_cols]
    prepared = train.select(*cols, F.col(label_col).cast("double").alias("__label"))
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="__features"
    ).transform(prepared)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
        maxIter=max_iter,
        tol=tol,
        standardization=standardize,
        family="binomial",
    )
    fitted = lr.fit(assembled)
    model = LogisticModel(
        weights=tuple(float(w) for w in fitted.coefficients),
        bias=float(fitted.intercept),
    )
    return ScoredModel(model=model, feature_names=tuple(feature_cols))
