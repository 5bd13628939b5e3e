"""Per-group feature normalization via applyInPandas (grouped-map UDF).

Completes the §2.10 UDF surface: scalar pandas_udf (scoring), mapInPandas
(multimodal), applyInPandasWithState (streaming state) — and here the
grouped-map form: each entity's feature history arrives as ONE pandas frame,
is transformed with full-group context (z-score against the entity's own
history — the personalization normalizer a feature store serves), and
returns Arrow-batched.

Scale: one shuffle on the entity key; group frames must fit worker memory
(bounded by per-entity history length — for whale entities, window-based
running moments replace the grouped map).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["zscore_per_entity"]


def zscore_per_entity(
    features: DataFrame,
    entity_col: str,
    feature_cols: Sequence[str],
) -> DataFrame:
    """Append ``{col}_z`` per feature: (x - entity mean) / entity std
    (ddof=0; zero-variance features normalize to 0.0)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in features.schema.fields
    ) + ", " + ", ".join(f"{c}_z double" for c in feature_cols)

    cols = list(feature_cols)

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            x = pdf[c].astype("float64")
            std = x.std(ddof=0)
            pdf[f"{c}_z"] = 0.0 if (pd.isna(std) or std == 0) else (x - x.mean()) / std
        return pdf

    return features.groupBy(entity_col).applyInPandas(norm, out_schema)
