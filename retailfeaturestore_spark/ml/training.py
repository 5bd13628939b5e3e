"""Training-set construction: features ⊕ labels ⊕ encoding ⊕ time split.

Parity with ``jobs/make_training_and_train.py`` (SURVEY.md §3.2), with the
documented corrections (§7.4):
- the label spine is deduped BEFORE the join (the reference's m x n
  duplicate-label blowup on multi-line invoices, ``:46``, is avoided);
- the train/test split is a TRUE event-time cutoff on ``t_ref`` (the
  reference's ``shuffle=False`` split is actually customer-ordered, ``:57-58``);
- one-hot categories come from the frozen contract, not a per-run top-k.

The model fit itself (LightGBM in the reference) happens at the driver on
the aggregated training frame via ``toPandas()`` — after the heavy lifting
(windows, labels, joins) ran distributed, the matrix is small; gradient
boosting does not belong inside the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.encode import onehot_encode

__all__ = ["build_training_set"]


def build_training_set(
    features: DataFrame,
    labels: DataFrame,
    keys: tuple[str, str] = ("customer_id", "t_ref"),
    label_col: str = "churn_30d",
    cat_col: str | None = None,
    cat_categories: list[str] | None = None,
    time_cutoff: str | None = None,
) -> DataFrame:
    """J1 inner equi-join of the feature view with the (deduped) label spine,
    optional frozen-contract one-hot, optional ``is_train`` time-cutoff flag.
    """
    lab = labels.select(*keys, label_col).distinct()
    out = features.join(lab, list(keys), "inner")
    if cat_col is not None and cat_categories:
        out = onehot_encode(out, cat_col, cat_categories)
    if time_cutoff is not None:
        out = out.withColumn(
            "is_train",
            (F.col(keys[1]) < F.lit(time_cutoff).cast("timestamp")).cast("int"),
        )
    return out
