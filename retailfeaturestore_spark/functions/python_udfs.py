"""The rest of the Python UDF surface: grouped-agg UDAF and UDTF.

SURVEY.md §2.10: the reference needs only scalar inference UDFs for parity
(covered by ``ml/scoring.score_batch``'s vectorized pandas_udf) — these two
complete the engine's UDF trio as declared extensions:

- ``weighted_mean_udaf``: a **pandas grouped-agg UDAF** (Arrow-batched,
  usable in ``groupBy().agg()`` and unbounded windows).  The slow-path
  escape hatch for aggregations SQL can't express; everything expressible
  with built-ins should stay JVM-side (this module's docstring is the
  warning label).
- ``WordNGrams``: a **Python UDTF** (table function) — one input row to
  many output rows with arbitrary Python logic, used via ``LATERAL`` join
  in SQL.  The explode-with-logic shape; prefer ``F.explode(transform())``
  (pure Column algebra, codegen'd) when the row-expansion is expressible —
  the n-gram case IS expressible (``functions/text.shingles``), so the UDTF
  here is deliberately the same computation for differential testing.

Scale: both run Python workers — Arrow-batched, but still serialize the
columns they touch.  Budget them like any Python boundary: fine in a
side-path or a sink, wrong in the per-row hot path of a 100 TB scan when a
built-in exists.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf

__all__ = ["weighted_mean_udaf", "WordNGrams"]


@pandas_udf("double")
def weighted_mean_udaf(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg UDAF: sum(v*w)/sum(w), 0.0 on zero/empty weight.

    (Expressible with built-ins — kept as the canonical grouped-agg
    example and exercised differentially against the built-in form.)
    """
    denom = weights.sum()
    if denom == 0 or pd.isna(denom):
        return 0.0
    return float((values * weights).sum() / denom)


@udtf(returnType="ngram: string, pos: int")
class WordNGrams:
    """UDTF: emit (ngram, position) rows for every word trigram of ``text``.

    Use from SQL after ``spark.udtf.register("word_ngrams", WordNGrams)``::

        SELECT d.doc_id, g.ngram, g.pos
        FROM documents d, LATERAL word_ngrams(d.text, 3) g
    """

    def eval(self, text: str, n: int = 3):  # noqa: D401
        if not text:
            return
        ws = text.split(" ")
        for i in range(max(len(ws) - n + 1, 0)):
            yield " ".join(ws[i : i + n]), i
