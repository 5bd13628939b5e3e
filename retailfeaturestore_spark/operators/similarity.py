"""Similarity search over embedding columns (array<float>).

Extension surface (BASELINE.json north star): approximate-nearest-neighbor
over embeddings with a brute-force exact baseline and bucketed scale paths.

Determinism design: cosine is computed in FIXED POINT — each float component
is quantized to an integer ``floor(x * 2^25)`` (power-of-two scaling is exact
in IEEE arithmetic and floor has no rounding-tie cases, so every engine
produces the same integer), and dot products / norms are int64 sums (exact,
order-independent; |x| < 2 and 64 dims keep the sum < 2^58).  The final
``dot / (sqrt(na) * sqrt(nb))`` is three correctly-rounded IEEE ops over
identical integers -> bit-identical doubles across engines and shuffle
orders.  The 2^-25 (~3e-8) quantization is far below any meaningful
similarity difference; decimal-typed accumulation was rejected because
double->decimal casts at high scale are not identically rounded across
engines.

Scale paths:
- ``cosine_topk``: broadcast the (small) query set against the corpus — one
  scan, no shuffle of the corpus, per-partition top-k then global k.
- ``ivf_topk_label``: coarse-bucket restriction (here the ``label`` column as
  the IVF cell id; with real data, a KMeans assignment) — search only the
  matching cell.
- ``sign_lsh_neardup``: random-hyperplane-style LSH using coordinate-sign
  bands; candidates share an 8-bit sign band, then exact cosine filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot_fixed",
    "cosine",
    "cosine_topk",
    "ivf_topk_label",
    "kmeans_cells",
    "ivf_topk_cells",
    "sign_lsh_neardup",
]

FIXED_POINT_SCALE = 2**25


def _quant(x: Column) -> Column:
    return F.floor(x.cast("double") * F.lit(float(FIXED_POINT_SCALE)))


def dot_fixed(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _quant(x) * _quant(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm2_fixed(a: Column) -> Column:
    return dot_fixed(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot_fixed(a, b).cast("double") / (
        F.sqrt(norm2_fixed(a).cast("double")) * F.sqrt(norm2_fixed(b).cast("double"))
    )


def _with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__nn", norm2_fixed(F.col(vec_col)).cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.

    Plan: broadcast(queries) x corpus -> cosine -> per-query row_number.
    The corpus never shuffles; norms are computed once per side.  Self-match
    (same id) is excluded.  Ties broken by neighbor id (deterministic).
    """
    q = F.broadcast(
        _with_norm(queries, vec_col).select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("__qv"),
            F.col("__nn").alias("__qn"),
        )
    )
    c = _with_norm(corpus, vec_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("__cv"), F.col("__nn").alias("__cn")
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            dot_fixed(F.col("__qv"), F.col("__cv")).cast("double")
            / (F.sqrt("__qn") * F.sqrt("__cn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk_label(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: restrict the search to the query's coarse cell
    (``cell_col`` plays the quantizer assignment).  Equi-join on the cell id
    -> the cross product collapses to within-cell pairs; at scale this is the
    difference between O(n*q) and O(n*q / n_cells)."""
    q = F.broadcast(
        _with_norm(queries, vec_col).select(
            F.col(id_col).alias("q_id"),
            F.col(cell_col).alias("__cell"),
            F.col(vec_col).alias("__qv"),
            F.col("__nn").alias("__qn"),
        )
    )
    c = _with_norm(corpus, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col(cell_col).alias("__ccell"),
        F.col(vec_col).alias("__cv"),
        F.col("__nn").alias("__cn"),
    )
    scored = (
        c.join(q, c["__ccell"] == q["__cell"])
        .where(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            dot_fixed(F.col("__qv"), F.col("__cv")).cast("double")
            / (F.sqrt("__qn") * F.sqrt("__cn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def kmeans_cells(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cache_scope: str | None = None,
) -> DataFrame:
    """Deterministic distributed Lloyd's KMeans -> ``(id, cell)`` coarse
    quantizer assignment (the real IVF cell map; ``ivf_topk_label`` uses a
    data column as a stand-in).

    Engine-exact by construction, so a SQL oracle can replay it bit-for-bit:

    - vectors quantized to int64 (``floor(x * 2^25)``), distances are pure
      int64 sums of squared diffs (order-independent; 64 dims x (2^27)^2
      stays < 2^61 — no overflow, no float summation anywhere);
    - init = the ``k`` vectors with the smallest ids (deterministic seed);
    - assignment tie-break: smallest cell id at equal distance;
    - centroid update = per-dimension ``floor(sum/count)`` back onto the
      integer grid (sum < 2^53, so the double division is exact-input and
      correctly rounded — identical across engines);
    - FIXED iteration count (no data-dependent convergence test), so the
      oracle is ``iters`` unrolled CTEs.

    Scale shape per iteration: one broadcast of k centroid rows against the
    corpus (no corpus shuffle) for assignment + one (cell, dim) groupBy for
    the update — both map-side combinable.  k and dims are small by IVF
    design; the corpus is the only big thing and it only ever streams.
    """
    import math

    from pyspark import StorageLevel

    q = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: _quant(x)).alias("__q"),
    )
    # The quantized corpus is read once per Lloyd round plus once for the
    # final assignment — persist it for the duration (id + int64 array, far
    # smaller than the source vectors; disk-backed level, the standard MLlib
    # iterative-working-set pattern).  Registered on the session keyed by
    # (operator, cache_scope) so queries.invalidate_caches can evict it
    # (bench honest-timing, staleness) scoped to one dataset; re-entering
    # with the same key REPLACES the old frame (unpersisting it), so a
    # long-lived session holds at most one quantized corpus per scope
    # instead of accumulating one per call (ADVICE r3).
    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    reg = getattr(vectors.sparkSession, "_rfs_persisted", None)
    if reg is None or isinstance(reg, list):
        reg = vectors.sparkSession._rfs_persisted = {}
    key = ("kmeans_quant_corpus", cache_scope)
    old = reg.pop(key, None)
    if old is not None:
        old.unpersist(blocking=False)
    reg[key] = q
    # init: k smallest ids as seed centroids (cell = seed id).  Centroids
    # live DRIVER-SIDE as literals — k x dims values is tiny by IVF design
    # (that is the whole point of a coarse quantizer), and embedding them in
    # the assignment expression makes each Lloyd iteration a pure map over
    # the corpus: no crossJoin, no per-row argmin window shuffle, no
    # lineage checkpoint.  Per iteration the cluster does ONE map-side-
    # combinable per-cell aggregation; only k*dims summary values return
    # to the driver.  (The previous form broadcast a centroid DataFrame and
    # ranked n*k scored rows through a Window per iteration — an extra
    # corpus-sized shuffle each round that the literal form never pays.)
    seed = (
        q.where(F.col("id") < k)
        .select(F.col("id").alias("cell"), "__q")
        .collect()
    )
    cents = sorted((int(r["cell"]), [int(x) for x in r["__q"]]) for r in seed)

    def assign_col(cents) -> Column:
        arr = ", ".join(
            "named_struct('cell', {c}L, 'v', array({vs}))".format(
                c=c, vs=", ".join(f"{x}L" for x in vec)
            )
            for c, vec in cents
        )
        # argmin over the centroid literal array: int64 distances, ties to
        # the smallest cell id (same semantics as the ranked form).
        # (Measured alternatives, both SLOWER despite smaller expression
        # trees: binding the matrix as one nested-array Literal and reducing
        # with zip_with/element_at costs ~2x at runtime — literal-array
        # element access doesn't constant-fold in the interpreted HOF path —
        # and a column-wise per-cell agg of dims element_at sums loses to
        # the posexplode (cell, dim) rollup below by ~40%.)
        return F.expr(
            f"""
            aggregate(
              transform(array({arr}),
                s -> named_struct(
                  'd', aggregate(zip_with(__q, s.v, (a, b) -> (a - b) * (a - b)),
                                 0L, (acc, x) -> acc + x),
                  'cell', s.cell)),
              cast(null as struct<d: bigint, cell: bigint>),
              (best, x) -> if(best is null or x.d < best.d
                              or (x.d = best.d and x.cell < best.cell), x, best)
            ).cell
            """
        )

    for _ in range(iters):
        stats = (
            q.withColumn("cell", assign_col(cents))
            .select("cell", F.posexplode("__q").alias("i", "__qi"))
            .groupBy("cell", "i")
            .agg(F.sum("__qi").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, int]] = {}
        for r in stats:
            # floor(double(sum)/count): both engines' division is the same
            # correctly-rounded IEEE op (sum < 2^53), so Python replays it.
            by_cell.setdefault(int(r["cell"]), {})[int(r["i"])] = math.floor(
                r["s"] / r["n"]
            )
        cents = sorted(
            (cell, [dims[i] for i in range(len(dims))])
            for cell, dims in by_cell.items()
        )

    return q.withColumn("cell", assign_col(cents)).select("id", "cell")


def ivf_topk_cells(
    corpus: DataFrame,
    query_ids,
    k_neighbors: int = 3,
    n_cells: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cache_scope: str | None = None,
) -> DataFrame:
    """IVF ANN with a REAL trained coarse quantizer: KMeans cells from
    :func:`kmeans_cells`, then cell-restricted exact cosine top-k for the
    query ids (nprobe=1 — the query searches its own cell).  The recall/
    speed knob at scale is (n_cells, nprobe); the corpus never leaves its
    cell partition."""
    cells = kmeans_cells(
        corpus, k=n_cells, iters=iters, vec_col=vec_col, id_col=id_col,
        cache_scope=cache_scope,
    )
    base = _with_norm(corpus, vec_col).join(
        cells.withColumnRenamed("id", id_col), id_col
    )
    q = F.broadcast(
        base.where(F.col(id_col).isin(list(query_ids)))
        .select(
            F.col(id_col).alias("q_id"),
            F.col("cell").alias("__cell"),
            F.col(vec_col).alias("__qv"),
            F.col("__nn").alias("__qn"),
        )
    )
    c = base.select(
        F.col(id_col).alias("n_id"),
        F.col("cell").alias("__ccell"),
        F.col(vec_col).alias("__cv"),
        F.col("__nn").alias("__cn"),
    )
    scored = (
        c.join(q, c["__ccell"] == q["__cell"])
        .where(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            dot_fixed(F.col("__qv"), F.col("__cv")).cast("double")
            / (F.sqrt("__qn") * F.sqrt("__cn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select("q_id", "n_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def sign_lsh_neardup(
    vectors: DataFrame,
    threshold: float = 0.35,
    bands: int = 4,
    band_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs via sign-pattern LSH.

    Band b's key = the sign bits of coordinates [b*band_bits, (b+1)*band_bits).
    Vectors agreeing on ANY full band are candidates (cosine-correlated:
    sign agreement probability rises with angle similarity); candidates then
    pass an exact cosine filter.  Self-join shuffles only (band, 8-char key).
    """
    sig = F.concat_ws(
        "",
        F.transform(
            F.slice(F.col(vec_col), 1, bands * band_bits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )
    base = _with_norm(vectors, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v"), F.col("__nn"), sig.alias("__sig")
    )
    # ONE explode, not a per-band union loop: the loop consumed `base`
    # once per band and Spark does not reuse the duplicated subtrees, so
    # 4 bands cost 4 corpus scans + 4 norm computations PER SELF-JOIN SIDE
    # (audited: 20 parquet scans in the plan; 8 after this rewrite — same
    # banding shape dedup.simhash_pairs already uses).
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("__sig", b * band_bits + 1, band_bits).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    parts = base.select(F.explode(band_structs).alias("__b"), "id").select(
        F.col("__b.band").alias("band"), F.col("__b.band_key").alias("band_key"), "id"
    )
    a = parts.alias("a")
    bb = parts.alias("b")
    # Dedup candidates on ids ONLY (short keys), then re-attach vectors —
    # never shuffle the embedding arrays through the distinct.
    cand_ids = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .distinct()
    )
    va = base.select(
        F.col("id").alias("vec_a"), F.col("__v").alias("__va"), F.col("__nn").alias("__na")
    )
    vb = base.select(
        F.col("id").alias("vec_b"), F.col("__v").alias("__vb"), F.col("__nn").alias("__nb")
    )
    cand = cand_ids.join(va, "vec_a").join(vb, "vec_b")
    return (
        cand.withColumn(
            "cosine",
            dot_fixed(F.col("__va"), F.col("__vb")).cast("double")
            / (F.sqrt("__na") * F.sqrt("__nb")),
        )
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
