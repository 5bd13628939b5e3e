"""Model artifact registry (SURVEY.md §2.1 S8).

Parity with ``jobs/make_training_and_train.py:87-93`` / ``serving/app.py:21-22``:
a pickled model + ``feature_names.txt`` column contract + a metrics sidecar.
joblib/MLflow are not installed here; stdlib pickle is format-compatible for
the protocol-typed models this engine ships, and the MLflow hook is a
documented one-liner where available.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

__all__ = ["save_artifacts", "load_model", "read_feature_names", "write_feature_names"]


def write_feature_names(path: str, names: list[str]) -> None:
    Path(path).write_text("\n".join(names) + "\n")


def read_feature_names(path: str) -> list[str]:
    return [ln for ln in Path(path).read_text().splitlines() if ln]


def save_artifacts(
    out_dir: str,
    model: object,
    feature_names: list[str],
    metrics: dict | None = None,
    mlflow_experiment: str | None = None,
) -> dict[str, str]:
    """Persist model + contract + metrics; optionally mirror to MLflow.

    The MLflow hook (``jobs/make_training_and_train.py:87-93`` logs params/
    metrics/model per run) is import-gated: pass ``mlflow_experiment`` where
    the library and a tracking server exist and the same artifacts are
    logged as a run; absent the import, the local registry is authoritative
    and nothing else changes.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    model_path = out / "model.pkl"
    with open(model_path, "wb") as f:
        pickle.dump(model, f)
    write_feature_names(str(out / "feature_names.txt"), feature_names)
    if metrics is not None:
        (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
    if mlflow_experiment is not None:
        try:
            import mlflow
        except ImportError:
            mlflow = None
        if mlflow is not None:
            mlflow.set_experiment(mlflow_experiment)
            with mlflow.start_run():
                mlflow.log_params({"n_features": len(feature_names)})
                if metrics is not None:
                    mlflow.log_metrics(
                        {k: v for k, v in metrics.items() if isinstance(v, (int, float))}
                    )
                mlflow.log_artifact(str(model_path))
                mlflow.log_artifact(str(out / "feature_names.txt"))
    return {
        "model": str(model_path),
        "feature_names": str(out / "feature_names.txt"),
        "metrics": str(out / "metrics.json") if metrics is not None else "",
    }


def load_model(model_dir: str) -> tuple[object, list[str]]:
    d = Path(model_dir)
    with open(d / "model.pkl", "rb") as f:
        model = pickle.load(f)
    return model, read_feature_names(str(d / "feature_names.txt"))
