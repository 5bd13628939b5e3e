"""RetailFeatureStore-Spark: a PySpark-native feature-store / analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference repo ``pranavv1251/RetailFeatureStore`` (a single-process pandas
retail ML feature store), re-expressed Spark-first:

- declarative DataFrame/SQL logical plans (Catalyst + Tungsten pick physical
  strategies; no hand-scheduled execution),
- event-time range-frame window features (the reference's core:
  ``jobs/build_feature_views.py``),
- point-in-time correctness: as-of lookups, interval existence label joins
  (``jobs/make_training_and_train.py:26-46``),
- partitioned parquet/Delta-style lakehouse IO (``jobs/ingest_xlsx_to_parquet.py:44-51``),
- online materialization sinks (``jobs/materialize_online.py``),
- plus the large-scale training-data-pipeline extensions: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search over embeddings,
  text analysis, and multimodal-column plumbing.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
