"""Prediction audit log: append-only, date-partitioned parquet.

Parity with ``serving/pred_logger.py:33-61`` (SURVEY.md §2.1 S4): one row per
prediction with ISO UTC timestamps, latency, threshold/probability/decision,
model artifact name, and the flattened ``feat__*`` vector; files land under
``date=YYYY-MM-DD/`` with collision-free names.

Two writers:
- ``log_prediction``: the serving-path single-row append (pyarrow direct,
  no Spark session needed — a point write must not pay job-launch latency);
  unique ``part-HHMMSS-<uuid8>.parquet`` names exactly like the reference
  (``serving/pred_logger.py:53``).
- ``write_pred_log``: the batch/streaming sink (Spark ``partitionBy`` append)
  for bulk scoring and foreachBatch streaming.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame

__all__ = ["log_prediction", "write_pred_log"]


def log_prediction(
    base_dir: str,
    customer_id: int,
    probability: float,
    threshold: float,
    latency_ms: float,
    model_artifact: str,
    t_ref: datetime | None = None,
    features: dict[str, float] | None = None,
) -> str:
    """Single-row serving append; returns the file path written."""
    now = datetime.now(timezone.utc)
    row = {
        "ts_served": now.isoformat(),
        "latency_ms": float(latency_ms),
        "customer_id": int(customer_id),
        "t_ref": t_ref.isoformat() if t_ref is not None else None,
        "threshold": float(threshold),
        "probability": float(probability),
        "prediction": int(probability >= threshold),
        "model_artifact": model_artifact,
    }
    for name, val in (features or {}).items():
        row[f"feat__{name}"] = float(val)
    day_dir = Path(base_dir) / f"date={now.date().isoformat()}"
    day_dir.mkdir(parents=True, exist_ok=True)
    fname = f"part-{now.strftime('%H%M%S')}-{uuid.uuid4().hex[:8]}.parquet"
    path = day_dir / fname
    pq.write_table(pa.Table.from_pylist([row]), path)
    return str(path)


def write_pred_log(preds: DataFrame, base_dir: str, ts_col: str = "ts_served") -> None:
    """Bulk sink: date-partitioned append (Delta/Iceberg at scale — append
    mode keeps it idempotent per batch with unique task files)."""
    from pyspark.sql import functions as F

    (
        preds.withColumn("date", F.substring(F.col(ts_col), 1, 10))
        .write.mode("append")
        .partitionBy("date")
        .parquet(base_dir)
    )
