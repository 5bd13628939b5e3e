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
    max_literal_terms: int = 64,
) -> DataFrame:
    """BM25 top-k per query over a (query_id, term) bag.

    Scale shape (re-planned r11; the pre-r11 path exploded EVERY token,
    shuffled all matched tokens into a (doc, term) aggregate, and re-ran
    that pipeline under TWO broadcast branches — three corpus passes plus
    a token-scale exchange): the query's term set is a DRIVER-SIDE
    literal, so per-doc term frequencies are computed MAP-SIDE — one
    ``isin`` pass shrinks the token array to query-term matches (a
    match-list per doc; CollapseProject keeps the non-cheap HOF alias
    un-inlined), then |terms| cheap counts over that small array; what
    explodes is |terms|+1 pre-aggregated rows per doc, pruned to tf > 0
    before any exchange.  A SENTINEL row per doc (term = "\x00stats",
    tf = dl) lets corpus stats (n_docs, total_tokens) and per-term df all
    fall out of ONE tiny groupBy(term) folded to a single broadcast map
    row — exactly one auxiliary re-execution of the map pipeline, instead
    of one per broadcast branch.  Two corpus scans total, zero
    token-level exchanges; the remaining exchanges are the
    match-list-sized (query, doc) score sum and the per-query top-k
    window.  Floor decomposition (sf0.1, 32 threads): each corpus
    scan+split ≈ 0.18-0.35 s, so the ~1.1 s total is string-throughput
    bound — the embedded columnar engine splits the same 120 MB in
    ~0.1 s; plan shape cannot close that constant-factor gap, only
    engine string SIMD could.  A fully map-side variant (per-query
    F.aggregate, zero groupBy) was A/B'd and LOST: Catalyst re-inlines
    the shared tf array into every query's lambda, multiplying the
    filter work.

    Determinism contract (SURVEY §5.2) unchanged: exact rational idf,
    per-term x1e12 quantization BEFORE the cross-term sum."""
    spark = docs.sparkSession
    ws = F.split(F.col(text_col), " ")
    q_by_id: dict[int, list[str]] = {}
    for q, t in term_queries:
        if str(t):
            q_by_id.setdefault(int(q), []).append(str(t))
    terms = sorted({t for ts in q_by_id.values() for t in ts})
    if not terms:
        # ADVICE r12 #4: x.isin(*terms) with an empty term set throws at
        # plan build; an all-empty query bag has an exact answer — no hits
        return docs.select(
            F.lit(0).cast("long").alias("query_id"),
            F.lit(0).cast("long").alias("rank"),
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("long").alias("n_terms_hit"),
            F.lit(0).cast("long").alias("score_scaled"),
            F.lit(0.0).alias("score"),
        ).where(F.lit(False))
    qterms = F.broadcast(
        spark.createDataFrame(
            [(q, t) for q, ts in sorted(q_by_id.items()) for t in ts],
            "query_id long, term string",
        )
    )
    sent = "\x00stats"  # cannot collide: real terms are whitespace tokens

    def _eq(t: str):
        # closure, NOT a default arg: a second lambda parameter would make
        # F.filter pass the element INDEX into it
        return lambda x: x == F.lit(t)

    if len(terms) <= max_literal_terms:
        # literal map-side path: plan/codegen size and per-doc work grow
        # linearly with |terms| (one F.size(F.filter(...)) struct each),
        # so it is gated at max_literal_terms (ADVICE r12 #4); above the
        # gate the explode+broadcast-semi-join path below handles
        # arbitrary vocabularies at one token-level exchange
        matched = F.filter(ws, lambda x: x.isin(*terms))
        tf_arr = F.concat(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.size(F.filter(F.col("__m"), _eq(t)))
                        .cast("long")
                        .alias("tf"),
                    )
                    for t in terms
                ]
            ),
            # the sentinel's tf must survive a NULL dl (null/absent text):
            # oracle-side n_docs is count(*), so every doc must emit it
            F.array(
                F.struct(
                    F.lit(sent).alias("term"),
                    F.coalesce(F.col("dl"), F.lit(0).cast("long")).alias("tf"),
                )
            ),
        )
        rows = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.size(ws).cast("long").alias("dl"),
                matched.alias("__m"),
            )
            .select("doc_id", "dl", F.explode(tf_arr).alias("__e"))
            .select(
                "doc_id",
                "dl",
                F.col("__e.term").alias("term"),
                F.col("__e.tf").alias("tf"),
            )
            .where((F.col("tf") > 0) | (F.col("term") == sent))
        )
    else:
        # join path for large vocabularies: explode tokens once, keep only
        # query-term matches via a broadcast join (Catalyst pushes the
        # join's term set as a bloom/semi filter), aggregate tf per
        # (doc, term); the per-doc sentinel row unions in from the base
        # scan so corpus stats still fall out of the same tiny groupBy
        term_lit = F.broadcast(
            spark.createDataFrame([(t,) for t in terms], "term string")
        )
        base = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(ws).cast("long").alias("dl"),
            ws.alias("__toks"),
        )
        tf_rows = (
            base.select("doc_id", "dl", F.explode("__toks").alias("term"))
            .join(term_lit, "term")
            .groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .select("doc_id", "dl", "term", "tf")
        )
        sent_rows = base.select(
            "doc_id",
            "dl",
            F.lit(sent).alias("term"),
            F.coalesce(F.col("dl"), F.lit(0).cast("long")).alias("tf"),
        )
        rows = tf_rows.unionByName(sent_rows)
    # `rows` feeds TWO consumers (the aux stats agg and the scoring join);
    # Spark re-executes DataFrame subtrees per consumer, so without
    # materialization the corpus scan+split pipeline runs twice.  A lazy
    # localCheckpoint pins the PRUNED match-list rows (one sentinel +
    # matched terms per doc — query-working-set scale, never the raw
    # corpus), so the second consumer reads blocks instead of re-splitting
    # the corpus.  r12 same-session A/B at sf0.1: a WASH (~0.93 s min both
    # ways — the 120 MB split is cheap enough that materialization
    # overhead cancels the saved pass), kept anyway because at 100 TB the
    # second corpus pass is a full re-scan while the checkpoint is a
    # per-query working set; same pattern as
    # urlops.domain_mixture_weights.
    rows = rows.localCheckpoint(eager=False)
    # per-term (df, tf-mass) + the sentinel's (n_docs, total_tokens), one
    # tiny agg folded to a single broadcast MAP row
    aggterm = rows.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("tf").cast("long").alias("s"),
    )
    aux = F.broadcast(
        aggterm.agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", F.struct("c", "s")))
            ).alias("__tmap")
        )
    )
    tmap = F.col("__tmap")
    n_docs = F.element_at(tmap, sent)["c"].cast("double")
    total_tokens = F.element_at(tmap, sent)["s"].cast("double")
    df_d = F.element_at(tmap, F.col("term"))["c"].cast("double")
    idf = ((n_docs - df_d) + F.lit(0.5)) / (df_d + F.lit(0.5))
    avgdl = total_tokens / n_docs
    tfd = F.col("tf").cast("double")
    tfn = (tfd * F.lit(k1 + 1.0)) / (
        tfd
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    scored = (
        rows.where(F.col("term") != sent)
        .join(qterms, "term")
        .crossJoin(aux)
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
