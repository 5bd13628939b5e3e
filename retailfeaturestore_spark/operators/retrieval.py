"""Retrieval operators: BM25 lexical ranking, reciprocal-rank fusion, and
the artifact-backed hybrid search serving path.

Extracted from the certified query implementations (``bm25_retrieval``,
``hybrid_retrieval_rrf`` — both hash-exact vs their DuckDB oracles) so the
same ranking code serves three callers: the oracle-checked queries, ad-hoc
corpus curation searches, and ``hybrid_search_pq`` — the serving
composition that answers a (terms, vector) query from a live documents
table plus a PERSISTED PQ index (``operators/similarity.build_pq_index``)
without touching the float corpus.

Determinism contract (SURVEY.md §5.2): BM25 keeps the exact rational idf
(no log) and quantizes per-term scores to x1e12 longs BEFORE the cross-term
sum; RRF quantizes per-list contributions the same way — both rankings are
engine-exact, not approximately-equal.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "rrf_fuse", "hybrid_search_pq"]


def bm25_topk(
    docs: DataFrame,
    term_queries: Iterable[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k per query over a (query_id, term) bag.

    Scale shape: the token stream is pruned to query terms by a broadcast
    semi-join BEFORE the tf aggregate (the explode never shuffles
    non-matching postings); df and corpus stats are tiny broadcast sides;
    the only wide exchanges are the (doc, term) tf partial agg and the
    per-query top-k window, whose partitions are match-list-sized."""
    spark = docs.sparkSession
    ws = F.split(F.col(text_col), " ")
    qterms = F.broadcast(
        spark.createDataFrame(
            [(int(q), str(t)) for q, t in term_queries], "query_id long, term string"
        )
    )
    stats = F.broadcast(
        docs.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(ws)).cast("long").alias("total_tokens"),
        )
    )
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("dl"),
        F.explode(ws).alias("term"),
    ).where(F.length("term") > 0)
    tok_q = tok.join(
        F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
    )
    tf = tok_q.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.min("dl").alias("dl")
    )
    dfx = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    idf = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        dbl("df") + F.lit(0.5)
    )
    avgdl = dbl("total_tokens") / dbl("n_docs")
    tfn = (dbl("tf") * F.lit(k1 + 1.0)) / (
        dbl("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dbl("dl") / avgdl))
    )
    scored = (
        tf.join(dfx, "term")
        .join(qterms, "term")
        .crossJoin(stats)
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfn * F.lit(1e12)).cast("long").alias("scaled"),
        )
    )
    per_qd = scored.groupBy("query_id", "doc_id").agg(
        F.sum("scaled").cast("long").alias("score_scaled"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id")
    )
    return (
        per_qd.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "n_terms_hit",
            "score_scaled",
            (F.col("score_scaled").cast("double") / F.lit(1e12)).alias("score"),
        )
    )


def rrf_fuse(
    lex: DataFrame, dense: DataFrame, k: int = 10, k0: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): full-outer merge of two
    (query_id, doc_id, rank_*) lists, contributions quantized to x1e12
    longs BEFORE the sum (order-free exact); single-list docs keep a null
    rank on the missing side.  Fusion is top-k-sized regardless of corpus
    size — the scale cost lives entirely in the two input retrievers."""
    contrib = lambda c: F.coalesce(  # noqa: E731
        F.round(F.lit(1e12) / (F.lit(k0) + F.col(c))).cast("long"),
        F.lit(0).cast("long"),
    )
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_scaled", contrib("rank_lex") + contrib("rank_dense")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_scaled").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "rank_lex",
            "rank_dense",
            "rrf_scaled",
            (F.col("rrf_scaled").cast("double") / F.lit(1e12)).alias("rrf"),
        )
    )


def hybrid_search_pq(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    queries: Iterable[tuple[int, Iterable[str], Iterable[float]]],
    k: int = 10,
    k0: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Serve hybrid (lexical + dense) retrieval from artifacts: BM25 over
    the documents table fused with ADC search over the PERSISTED PQ index
    — the float corpus is never touched (the dense half reads only the
    m-byte codes; ``operators/similarity.search_pq_index``).

    ``queries``: ``[(query_id, [term, ...], [float, ...]), ...]`` —
    request-sized by definition.  Index ids must be the document ids
    (build the index with ``vec_id = doc_id``), or the fusion would join
    unrelated identities.  Returns the ``rrf_fuse`` frame."""
    from .similarity import search_pq_index

    queries = [(int(q), list(ts), list(v)) for q, ts, v in queries]
    if not queries:
        raise ValueError("queries must be non-empty")
    lex = bm25_topk(
        docs,
        [(q, t) for q, ts, _ in queries for t in ts],
        k=k,
        text_col=text_col,
        id_col=id_col,
    ).select("query_id", "doc_id", F.col("rank").alias("rank_lex"))
    dense = search_pq_index(
        spark, index_dir, [(q, v) for q, _, v in queries], k_neighbors=k
    ).select(
        F.col("q_id").alias("query_id"),
        F.col("n_id").alias("doc_id"),
        F.col("rank").alias("rank_dense"),
    )
    return rrf_fuse(lex, dense, k=k, k0=k0)
