"""Serving-time feature lookup: offline (parquet snapshot) + online (hash store).

Parity with ``serving/feature_service.py`` (SURVEY.md §3.3): Spark is the
wrong tool for per-request point lookups, so serving reads the PUBLISHED
snapshot the Spark jobs materialize — exactly the reference's architecture:

- offline: lazily-cached gold parquet -> per-entity as-of filter
  (``serving/feature_service.py:19-46``: full-frame cache ``:26-30``,
  ``refresh()`` ``:32-34``, time-travel filter+last ``:36-46``);
- online: hash-store point get with typed decode — float-parse with string
  fallback, ``meta:*`` extraction (``serving/feature_service.py:69-89``);
- vector alignment ``row_to_X``: one-hot re-derivation from the frozen
  contract, leakage-column drop, missing->0, strict column order
  (``serving/feature_service.py:48-59``).

The cache here is pandas-on-parquet (pyarrow), no Spark session in the
serving process; the offline snapshot directory is whatever
``io.write_date_partitioned`` produced.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd

__all__ = [
    "OfflineFeatureService",
    "OnlineFeatureService",
    "FallbackFeatureService",
    "row_to_vector",
]


class OfflineFeatureService:
    """Point-in-time feature lookup over the published gold parquet."""

    def __init__(self, gold_dir: str, entity_col: str = "customer_id", ts_col: str = "t_ref"):
        self.gold_dir = gold_dir
        self.entity_col = entity_col
        self.ts_col = ts_col
        self._cache: pd.DataFrame | None = None

    def _frame(self) -> pd.DataFrame:
        if self._cache is None:
            files = sorted(Path(self.gold_dir).rglob("*.parquet"))
            if not files:
                raise FileNotFoundError(f"no parquet under {self.gold_dir}")
            self._cache = pd.concat(
                [pd.read_parquet(f) for f in files], ignore_index=True
            ).sort_values([self.entity_col, self.ts_col], kind="stable")
        return self._cache

    def refresh(self) -> int:
        """Drop + reload the snapshot cache; returns row count
        (``serving/feature_service.py:32-34`` / ``/refresh`` endpoint parity)."""
        self._cache = None
        return len(self._frame())

    def row_count(self) -> int:
        return len(self._frame())

    def get_snapshot(self, entity_id, as_of=None) -> dict | None:
        """Latest row for the entity with ``ts <= as_of`` (None -> latest).
        Deterministic tie-break on position after stable sort (the engine's
        materialized gold carries unique (entity, t_ref) keys)."""
        df = self._frame()
        g = df[df[self.entity_col] == entity_id]
        if as_of is not None:
            g = g[g[self.ts_col] <= pd.Timestamp(as_of)]
        if g.empty:
            return None
        return g.iloc[-1].to_dict()


class OnlineFeatureService:
    """Hash-store point get with the reference's typed decode."""

    def __init__(self, client, key_prefix: str = "fs:customer:"):
        self.client = client
        self.key_prefix = key_prefix

    def get_snapshot(self, entity_id) -> dict | None:
        raw = self.client.hgetall(f"{self.key_prefix}{entity_id}")
        if not raw:
            return None
        out: dict = {}
        for k, v in raw.items():
            k = k.decode() if isinstance(k, bytes) else k
            v = v.decode() if isinstance(v, bytes) else v
            if k.startswith("meta:"):
                out[k] = v
            else:
                try:
                    out[k] = float(v)
                except (TypeError, ValueError):
                    out[k] = v  # string fallback (serving/feature_service.py:83-86)
        return out


class FallbackFeatureService:
    """Online-first lookup with offline fallback — the reference's composed
    ``get_snapshot`` chain (``serving/feature_service.py:69-89``): the hash
    store holds only the LATEST snapshot per entity, so a latest-request
    tries it first; a miss OR a historical ``as_of`` falls through to the
    offline parquet snapshot.  A cold key therefore serves from offline
    instead of surfacing "customer not found"."""

    def __init__(self, online: OnlineFeatureService, offline: OfflineFeatureService):
        self.online = online
        self.offline = offline

    def get_snapshot(self, entity_id, as_of=None) -> dict | None:
        if as_of is None:
            raw = self.online.get_snapshot(entity_id)
            if raw is not None:
                # Decode the sink's meta:* contract to row shape (reference
                # :74-86): meta:t_ref -> timestamp, meta:country -> country.
                out = {"customer_id": entity_id}
                for k, v in raw.items():
                    if k == "meta:t_ref":
                        ts = pd.to_datetime(v, utc=True, errors="coerce")
                        out["t_ref"] = None if pd.isna(ts) else ts.tz_localize(None)
                    elif k == "meta:country":
                        out["country"] = v or None
                    elif not k.startswith("meta:"):
                        out[k] = v
                return out
        return self.offline.get_snapshot(entity_id, as_of=as_of)

    def refresh(self) -> int:
        return self.offline.refresh()

    def row_count(self) -> int:
        return self.offline.row_count()


def row_to_vector(
    row: dict,
    feature_names: list[str],
    cat_col: str | None = None,
    drop_cols: tuple[str, ...] = ("country", "t_ref", "churn_30d"),
) -> list[float]:
    """Align a snapshot row to the model's ordered feature contract:
    re-derive one-hots from the contract names (``{cat}__{value}``), drop
    leakage columns, fill missing with 0.0, strict order
    (``serving/feature_service.py:48-59``)."""
    vec: list[float] = []
    cat_val = row.get(cat_col) if cat_col else None
    for name in feature_names:
        if cat_col and name.startswith(f"{cat_col}__"):
            wanted = name.split("__", 1)[1]
            vec.append(1.0 if cat_val == wanted else 0.0)
            continue
        if name in drop_cols:
            vec.append(0.0)
            continue
        v = row.get(name)
        try:
            vec.append(float(v) if v is not None else 0.0)
        except (TypeError, ValueError):
            vec.append(0.0)
    return vec
