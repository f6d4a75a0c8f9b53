"""Similarity search over an embedding column (``array<float>``).

Two physical strategies (SURVEY §7.1 M7):

- brute force: query×corpus join with a JVM-side fold dot product
  (zip_with + aggregate — no Python, no UDF). Correctness baseline;
  fine when |queries| is small or either side broadcasts.
- LSH-bucketed: deterministic random-hyperplane signs derived from
  md5-based pseudo-projections bucket the corpus; candidates only join
  within a bucket (the 100 TB path: shuffle keyed by bucket, corpus
  scanned once). Recall < 1 by construction; the baseline measures it.

All math is double-precision with a left-to-right fold so the DuckDB
oracle (list_cosine_similarity on DOUBLE[]) reproduces ranks exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vec import cosine, dot as _dot  # noqa: F401  (re-exported)
from .util import spread


def topk_bruteforce(
    embeddings: DataFrame, query_ids: DataFrame | Column, k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — exact top-k cosine neighbours
    for each query vector. ``query_ids``: DataFrame with ``vec_id`` or a
    boolean Column over ``embeddings``. The query side is broadcast; the
    corpus is scanned once, ranked with a per-query window."""
    emb = spread(embeddings, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    if isinstance(query_ids, Column):
        q = emb.filter(query_ids)
    else:
        q = emb.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    q = q.select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    pairs = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("sim", cosine(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 6).alias("sim"))
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is
    ±1 by parity of a hash of (plane, j). Public trick: sign-random
    projections only need ± signs for cosine LSH."""
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}:{j}".encode()).hexdigest()
        comps.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
    return comps


def _with_plane_dots(
    embeddings: DataFrame, n_planes: int, dim: int | None = None
) -> DataFrame:
    """(vec_id, vec, dots) — per-vector dot products against the
    ``n_planes`` deterministic hyperplanes. Shared kernel of the
    single- and multi-probe LSH paths: one pass, no shuffle, planes as
    a one-row broadcast table (not ``dim × n_planes`` plan literals).

    ``dim`` is part of the table contract (EMBEDDING_DIM default) —
    plan construction is fully lazy: NO Spark job fires here (the old
    ``.first()`` dim probe ran a job per call). The length guard lives
    INSIDE the vec projection: a mismatched embedding would null-pad
    zip_with, zero every sign, and silently collapse all vectors into
    bucket 0; raise_error in the data path (a standalone assert column
    would be pruned as unused) costs one size() compare per row."""
    from ..sources.tables import EMBEDDING_DIM

    if dim is None:
        dim = EMBEDDING_DIM
    emb = spread(embeddings, "vec_id").select(
        "vec_id",
        F.when(
            F.size("embedding") == F.lit(dim),
            F.col("embedding").cast("array<double>"),
        )
        .otherwise(
            F.raise_error(
                F.format_string(
                    "lsh_buckets: embedding length %s != declared dim "
                    + str(dim),
                    F.size("embedding"),
                )
            )
        )
        .alias("vec"),
    )
    planes_df = embeddings.sparkSession.createDataFrame(
        [([_hyperplane(dim, p) for p in range(n_planes)],)],
        "planes array<array<double>>",
    )
    dots = F.transform(F.col("planes"), lambda pl: _dot(F.col("vec"), pl))
    return emb.crossJoin(F.broadcast(planes_df)).select(
        "vec_id", "vec", dots.alias("dots")
    )


def _bucket_col() -> Column:
    """bucket = Σ_i [dots[i] > 0] · 2^i over the ``dots`` column —
    nested higher-order functions, all JVM-side."""
    signed = F.transform(
        F.col("dots"),
        lambda d, i: F.when(
            d > 0, F.pow(F.lit(2.0), i.cast("double"))
        ).otherwise(F.lit(0.0)),
    )
    return F.aggregate(signed, F.lit(0.0), lambda a, x: a + x).cast("long")


def lsh_buckets(
    embeddings: DataFrame, n_planes: int = 8, dim: int | None = None
) -> DataFrame:
    """(vec_id, bucket) — sign signature over ``n_planes`` deterministic
    hyperplanes; one integer bucket per vector (single pass, no
    shuffle). See :func:`_with_plane_dots` for laziness + dim-guard
    notes."""
    return _with_plane_dots(embeddings, n_planes, dim).select(
        "vec_id", "vec", _bucket_col().alias("bucket")
    )


def topk_lsh(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.
    At scale the corpus side is shuffled once by bucket; each query
    probes exactly one bucket (multi-probe is a k>1 extension)."""
    b = lsh_buckets(embeddings, n_planes)
    if isinstance(query_ids, Column):
        q = b.join(embeddings.filter(query_ids).select("vec_id"), "vec_id", "left_semi")
    else:
        q = b.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    q = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        "bucket",
    )
    cand = b.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 6).alias("sim"))
    )


def topk_lsh_multiprobe(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    n_planes: int = 6,
    n_probe: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its OWN bucket plus the
    ``n_probe − 1`` buckets reached by flipping its lowest-|margin|
    plane bits (the planes the vector sits closest to — where a true
    neighbour most likely landed on the other side). Classic
    multi-probe LSH (Lv et al., VLDB'07 — public technique): recall
    climbs toward brute force with n_probe while the corpus is still
    bucketed ONCE; only the tiny query side fans out ×n_probe.

    Every corpus vector has exactly one bucket and the probe buckets
    are pairwise distinct (XOR with distinct powers of two), so no
    (query, neighbor) pair is scored twice — no dedup stage needed."""
    base = _with_plane_dots(embeddings, n_planes, dim).withColumn(
        "bucket", _bucket_col()
    )
    cand = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec"), "bucket"
    )
    if isinstance(query_ids, Column):
        q = base.join(
            embeddings.filter(query_ids).select("vec_id"), "vec_id", "left_semi"
        )
    else:
        q = base.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    # plane indices ordered by |margin| asc (ties by index) — JVM-side
    # struct sort on the already-computed dots, no extra pass
    order = F.transform(
        F.array_sort(
            F.transform(
                "dots", lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("i"))
            )
        ),
        lambda s: s["i"],
    )
    flips = F.transform(
        F.slice(order, 1, n_probe - 1),
        lambda i: F.col("bucket").bitwiseXOR(
            F.pow(F.lit(2.0), i.cast("double")).cast("long")
        ),
    )
    probes = F.concat(F.array(F.col("bucket")), flips)
    q = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.explode(probes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 6).alias("sim"))
    )


def recall_vs_bruteforce(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    n_planes: int = 6,
    n_probe: int = 1,
    method: str = "lsh",
    n_cells: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """Measure ANN recall@k against the exact baseline (the 'measure,
    don't guess' check for every approximate path). ``method='lsh'``
    with ``n_probe > 1`` measures multi-probe LSH; ``method='ivf'``
    measures the IVF index probing its ``n_probe`` closest cells
    (``n_planes`` is ignored there; ``n_cells``/``refine_iters``
    parameterise the quantizer)."""
    exact = topk_bruteforce(embeddings, query_ids, k).select(
        "query_id", "neighbor_id"
    )
    if method == "pq":
        approx = topk_pq(embeddings, query_ids, k).select(
            "query_id", "neighbor_id"
        )
    elif method == "ivfpq":
        approx = topk_ivfpq(
            embeddings, query_ids, k, n_cells=n_cells, n_probe=n_probe
        ).select("query_id", "neighbor_id")
    elif method == "pq_refined":
        approx = topk_pq_refined(embeddings, query_ids, k).select(
            "query_id", "neighbor_id"
        )
    elif method == "ivf":
        approx = topk_ivf(
            embeddings,
            query_ids,
            k,
            n_cells=n_cells,
            n_probe=n_probe,
            refine_iters=refine_iters,
        ).select("query_id", "neighbor_id")
    elif n_probe > 1:
        approx = topk_lsh_multiprobe(
            embeddings, query_ids, k, n_planes, n_probe
        ).select("query_id", "neighbor_id")
    else:
        approx = topk_lsh(embeddings, query_ids, k, n_planes).select(
            "query_id", "neighbor_id"
        )
    # ONE left join from exact onto approx, then a per-query sum: the
    # exact subtree appears once in the plan (a semi-join + separate
    # distinct-query-list referenced the brute-force top-k twice, and
    # Spark re-evaluated it — 2x the dominant cost). Zero-hit queries
    # MUST appear as recall 0 — dropping them made the mean conditional
    # on "found something" and overstated recall; they survive here
    # because every query keeps its k exact rows through the left join.
    marked = approx.withColumn("_hit", F.lit(1))
    return (
        exact.join(marked, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"))
        .withColumn("recall", F.round(F.col("n_hit") / k, 4))
    )


def _vec_proj(embeddings: DataFrame) -> DataFrame:
    """(vec_id, vec array<double>) — the ONE narrow projection every
    IVF / k-means pass consumes. Factored out so iterative consumers
    (:func:`kmeans`, :func:`topk_ivf`) can persist it once and feed all
    their passes from the cached blocks instead of re-scanning the
    corpus parquet per pass (guide §5: persist exactly the reused
    intermediate; the projection is two columns, never the raw row)."""
    return spread(embeddings, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )


def _persist_proj(df: DataFrame) -> DataFrame:
    """persist() unless ``SPARK_GRAFT_NO_VEC_PERSIST`` is set — the
    paired-A/B escape hatch for the shared-projection persist
    (tools/ab_env.py)."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_VEC_PERSIST"):
        return df
    return df.persist()


def ivf_centroids(
    embeddings: DataFrame, n_cells: int = 16, _proj: DataFrame | None = None
) -> DataFrame:
    """IVF coarse quantizer with deterministic 'training': the centroids
    are the first ``n_cells`` corpus vectors by id (a k-means iteration
    could refine them; determinism matters more here than cell quality,
    and the recall measurement below quantifies the difference).

    ``orderBy().limit()`` compiles to TakeOrderedAndProject — a
    parallel partial top-k per partition, NO global single-partition
    sort of the corpus (the old global row_number window shuffled every
    vector to one task — VERDICT r1 #3). The row_number below runs
    over the already-limited ≤ n_cells rows only.

    ``_proj`` (internal): a pre-built — typically persisted —
    :func:`_vec_proj` of the same embeddings; values identical, the
    scan is shared instead of repeated."""
    emb = _vec_proj(embeddings) if _proj is None else _proj
    top = (
        emb.select("vec_id", F.col("vec").alias("cvec"))
        .orderBy("vec_id")
        .limit(n_cells)
    )
    w = Window.orderBy("vec_id")
    return (
        top.withColumn("_rn", F.row_number().over(w))
        .select((F.col("_rn") - 1).alias("cell"), "cvec")
    )


def ivf_refine(
    embeddings: DataFrame,
    centroids: DataFrame,
    train_sample_mod: int = 1,
    _proj: DataFrame | None = None,
) -> DataFrame:
    """One Lloyd (k-means) iteration: assign every vector to its
    max-cosine centroid, then recentre each cell on the element-wise
    MEAN of its members. Produces measurably better-balanced inverted
    lists than the pick-first-n 'training' while staying fully
    deterministic: the per-component sum folds in vec_id order
    (sort_array before aggregate), so the DuckDB oracle
    (``sum(val ORDER BY vec_id)``) reproduces every double bit-for-bit
    — no rounding needed, no flaky ulp drift from shuffle order.

    Shuffle shape: one (cell, pos)-keyed aggregation over the exploded
    components + one tiny (cell)-keyed rebuild. ``train_sample_mod > 1``
    trains on the deterministic ``vec_id % mod == 0`` sample — the 100 TB
    path (quantizer quality needs a representative sample, not the full
    corpus; assignment of ALL vectors still happens downstream in
    :func:`topk_ivf`). ``_proj`` (internal): pre-built
    :func:`_vec_proj` — see :func:`ivf_centroids`."""
    emb = _vec_proj(embeddings) if _proj is None else _proj
    if train_sample_mod > 1:
        emb = emb.filter(F.col("vec_id") % train_sample_mod == 0)
    assigned = _assign_proj(emb, centroids)
    comps = assigned.select(
        "cell", "vec_id", F.posexplode("vec").alias("pos", "val")
    )
    means = comps.groupBy("cell", "pos").agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                    lambda s: s["val"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("m")
    )
    return means.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine centroid (broadcast the
    tiny centroid table; one pass over the corpus).

    The argmax is ``max_by`` over the composite ordering
    ``(score, -cell)`` — identical to the window tie-break
    (highest score, then LOWEST cell; ``-cell`` is unique per vector so
    the ordering struct never ties and max_by stays deterministic).
    A hash aggregation with map-side combine: the k scored copies of a
    vector collapse to one row BEFORE the shuffle, where the old
    row_number window shuffled and sorted all k — k× less shuffle IO on
    the corpus-sized side."""
    return _assign_proj(_vec_proj(embeddings), centroids)


def _assign_proj(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """:func:`ivf_assign` body over an already-projected
    (vec_id, vec) table — shared so iterative callers reuse one
    persisted projection across passes."""
    scored = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "_s", cosine(F.col("vec"), F.col("cvec"))
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("cell", "vec"),
            F.struct(F.col("_s"), (-F.col("cell")).alias("_nc")),
        ).alias("_b")
    )
    return best.select(
        "vec_id", F.col("_b.vec").alias("vec"), F.col("_b.cell").alias("cell")
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    train_sample_mod: int = 1,
    keep_vec: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """(vec_id, cluster, sim[, v]) — deterministic Lloyd k-means over the
    embedding column: seed = the first ``k`` corpus vectors by id
    (TakeOrderedAndProject — no global sort), ``iters`` rounds of
    assign + recentre (:func:`ivf_refine` folds the per-component sums
    in vec_id order, so the DuckDB oracle reproduces every double
    bit-for-bit), then one final max-cosine assignment of ALL vectors,
    with the similarity to the winning centroid. This is the semantic
    clustering a curation pipeline runs for domain mixing /
    cluster-balanced sampling over a corpus's embeddings.

    Scale shape: centroids stay broadcast-sized (≤ k rows) through every
    step; each iteration is one corpus pass + one (cell, pos)-keyed
    aggregation; the final assignment is one pass with a per-vector
    window. ``train_sample_mod > 1`` recentres on the deterministic
    ``vec_id % mod == 0`` sample — the 100 TB path (the quantizer needs
    a representative sample, not the corpus; assignment still covers
    every vector).

    ``keep_vec=True`` carries the vector itself through the final
    argmax as an extra ``v`` column (every pre-agg row of a vec_id holds
    the same vector, so riding the max_by struct is value-exact): a
    consumer that needs (assignment, vector) — semantic_dedup's pair
    stage — then skips a second corpus scan + vec_id re-join; the same
    bytes cross the one assignment shuffle either way.

    The (vec_id, vec) projection is PERSISTED once and feeds the seed
    pick, every Lloyd pass and the final assignment (guide §5: Lloyd
    re-scans the corpus iters+1 times otherwise — the DuckDB oracle
    unrolls the same arithmetic either way, so sharing the scan is
    plan-shape only, value-exact). Persist lifecycle is CALLER-OWNED
    under the same ``handles`` contract as ``clean_corpus``: pass a
    list to receive the persisted DataFrame and unpersist once the
    output has materialised; the bench/mirror harnesses release all
    pinned blocks between runs."""
    emb = _persist_proj(_vec_proj(embeddings))
    if handles is not None:
        handles.append(emb)
    cents = ivf_centroids(embeddings, k, _proj=emb)
    for _ in range(iters):
        cents = ivf_refine(
            embeddings, cents, train_sample_mod=train_sample_mod, _proj=emb
        )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "_s", cosine(F.col("vec"), F.col("cvec"))
    )
    # max_by argmax with the (score, -cell) composite ordering — same
    # shuffle-halving shape as ivf_assign, scores kept for the output
    payload = [F.col("cell"), F.col("_s")]
    if keep_vec:
        payload.append(F.col("vec"))
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct(*payload),
            F.struct(F.col("_s"), (-F.col("cell")).alias("_nc")),
        ).alias("_b")
    )
    out = [
        F.col("vec_id"),
        F.col("_b.cell").alias("cluster"),
        F.round("_b._s", 6).alias("sim"),
    ]
    if keep_vec:
        out.append(F.col("_b.vec").alias("v"))
    return best.select(*out)


def topk_ivf(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    refine_iters: int = 0,
    train_sample_mod: int = 1,
    handles: list | None = None,
) -> DataFrame:
    """IVF top-k: queries probe their ``n_probe`` closest cells and rank
    only those cells' vectors. The inverted lists are the corpus
    partitioned by ``cell`` — at 100 TB this is the classic
    write-once/probe-many layout (store `assignments` bucketed by cell).

    ``refine_iters`` Lloyd iterations improve the quantizer (see
    :func:`ivf_refine`); 0 keeps the deterministic pick-first seed.
    ``train_sample_mod`` trains the refinement on the deterministic
    ``vec_id % mod == 0`` sample (full-corpus assignment is unchanged).

    The (vec_id, vec) projection is PERSISTED once and feeds the seed
    pick, every refine pass, the corpus assignment AND the query-side
    slice (3 + refine_iters corpus scans shared into one — guide §5;
    value-exact, the arithmetic is untouched). ``handles``: caller-owned
    release, same contract as :func:`kmeans`."""
    emb = _persist_proj(_vec_proj(embeddings))
    if handles is not None:
        handles.append(emb)
    cents = ivf_centroids(embeddings, n_cells, _proj=emb)
    for _ in range(refine_iters):
        cents = ivf_refine(
            embeddings, cents, train_sample_mod=train_sample_mod, _proj=emb
        )
    assigned = _assign_proj(emb, cents)
    if isinstance(query_ids, Column):
        q = emb.filter(query_ids)
    else:
        q = emb.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    qv = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
    )
    probes = (
        qv.crossJoin(F.broadcast(cents))
        .withColumn("_s", cosine(F.col("qvec"), F.col("cvec")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("_s").desc(), F.col("cell"))
            ),
        )
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    cand = assigned.select("cell", F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec2"))
    scored = (
        F.broadcast(probes)
        .join(cand, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qvec"), F.col("cvec2")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 6).alias("sim"))
        .distinct()
    )


# --------------------------------------------------------------------------
# Product Quantization (PQ) — compressed-domain ANN (Jégou et al. 2011)
# --------------------------------------------------------------------------


def _normalized_vec(col) -> Column:
    """Unit-normalize an array<double> column (dot == cosine after this);
    componentwise division so the DuckDB restatement
    (list_transform(v, x -> x / sqrt(list_dot_product(v, v)))) is
    arithmetic-identical."""
    return F.transform(col, lambda x: x / F.sqrt(_dot(col, col)))


def pq_codebooks(
    embeddings: DataFrame, m: int = 8, kc: int = 16, dim: int | None = None
) -> DataFrame:
    """(sub, code, cvec) — per-subspace codebooks for product
    quantization: the embedding space is split into ``m`` contiguous
    subspaces of dim/m components; each subspace's ``kc`` centroids are
    the sub-vectors of the first ``kc`` corpus vectors by id (the same
    deterministic 'training' policy as ivf_centroids — recall is
    measured, not assumed). Vectors are unit-normalized FIRST so
    inner-product scores equal cosine downstream.

    Scale: codebooks are m·kc rows — broadcast-sized by construction
    (that is the entire point of PQ: the corpus is stored as m small
    codes per vector; only codebooks and query tables travel)."""
    from ..sources.tables import EMBEDDING_DIM

    if dim is None:
        dim = EMBEDDING_DIM
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    top = (
        spread(embeddings, "vec_id")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(kc)
    )
    w = Window.orderBy("vec_id")
    coded = top.withColumn("code", F.row_number().over(w) - 1).select(
        "code", _normalized_vec(F.col("v")).alias("nv")
    )
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice("nv", s * dsub + 1, dsub),
    )
    return coded.select(
        "code", F.posexplode(subs).alias("sub", "cvec")
    ).select("sub", "code", "cvec")


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, sub, code) — each vector's per-subspace code: the
    max-inner-product centroid of that subspace (ties break on the
    LOWER code via the (score, -code) max_by composite — the same
    deterministic argmax shape as ivf_assign). One corpus pass against
    the broadcast codebooks; map-side combine collapses the kc scored
    copies per (vector, subspace) before the shuffle."""
    from ..sources.tables import EMBEDDING_DIM

    if dim is None:
        dim = EMBEDDING_DIM
    dsub = dim // m
    emb = spread(embeddings, "vec_id").select(
        "vec_id",
        _normalized_vec(
            F.col("embedding").cast("array<double>")
        ).alias("nv"),
    )
    scored = (
        emb.crossJoin(F.broadcast(codebooks))
        .withColumn(
            "_s",
            _dot(F.slice("nv", F.col("sub") * dsub + 1, dsub), F.col("cvec")),
        )
    )
    return (
        scored.groupBy("vec_id", "sub")
        .agg(
            F.max_by(
                F.col("code"),
                F.struct(F.col("_s"), (-F.col("code")).alias("_nc")),
            ).alias("code")
        )
    )


def topk_pq(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    m: int = 8,
    kc: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — approximate top-k cosine via
    asymmetric distance computation (ADC): the corpus is represented
    ONLY by its m per-subspace codes; each query precomputes an m×kc
    inner-product table against the codebooks, and a candidate's score
    is the table-lookup sum over its codes — no full-vector arithmetic
    on the corpus side at query time.

    100 TB shape: corpus encode is a one-time pass producing m small
    integers per vector (store that, not the floats — the memory
    compression is why PQ exists); the query ADC tables and codebooks
    are broadcast; the scan side touches codes only. The per-subspace
    sum folds in subspace order so the DuckDB oracle
    (``sum(d ORDER BY sub)``) reproduces every double bit-for-bit."""
    cb = pq_codebooks(embeddings, m, kc, dim)
    codes = pq_encode(embeddings, cb, m, dim).groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )
    from ..sources.tables import EMBEDDING_DIM

    d = dim if dim is not None else EMBEDDING_DIM
    dsub = d // m
    if isinstance(query_ids, Column):
        q = spread(embeddings, "vec_id").filter(query_ids)
    else:
        q = embeddings.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    qv = q.select(
        F.col("vec_id").alias("query_id"),
        _normalized_vec(F.col("embedding").cast("array<double>")).alias("qnv"),
    )
    qtab = (
        qv.crossJoin(F.broadcast(cb))
        .withColumn(
            "d",
            _dot(F.slice("qnv", F.col("sub") * dsub + 1, dsub), F.col("cvec")),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "d"))),
                lambda s: s["d"],
            ).alias("tab")
        )
    )
    # ADC stride = the ACTUAL per-subspace code count (= size(tab)/m),
    # not the requested kc: pq_codebooks trains on the first kc corpus
    # vectors, so a corpus smaller than kc yields fewer codes per
    # subspace and a kc-strided lookup would read the wrong cells
    stride = (F.size("tab") / F.lit(m)).cast("int")
    scored = (
        codes.crossJoin(F.broadcast(qtab))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "sim",
            F.aggregate(
                F.transform(
                    "codes",
                    lambda c, s: F.element_at("tab", s * stride + c + F.lit(1)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rk",
            F.round("sim", 6).alias("sim"),
        )
    )


def topk_pq_refined(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    rerank: int = 20,
    m: int = 8,
    kc: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — two-stage PQ search: the ADC
    table-lookup scan shortlists ``rerank`` candidates per query from
    codes alone, then ONLY those candidates' full vectors are fetched
    for exact-cosine re-ranking to the final top-k (the standard
    IVFADC-with-refinement shape: the corpus-wide pass stays in
    compressed space; full-precision vectors are touched for
    |queries|·rerank rows, not the corpus).

    Recall ≥ plain :func:`topk_pq` at the same codebooks (the exact
    re-rank can only fix ADC ordering mistakes inside the shortlist,
    and the shortlist is a superset of ADC's top-k) — measured via
    ``recall_vs_bruteforce(method='pq_refined')``."""
    shortlist = topk_pq(embeddings, query_ids, rerank, m, kc, dim).select(
        "query_id", "neighbor_id"
    )
    emb = spread(embeddings, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    if isinstance(query_ids, Column):
        q = emb.filter(query_ids)
    else:
        q = emb.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    qv = q.select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    cand = shortlist.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("cvec")),
        "neighbor_id",
    )
    scored = cand.join(F.broadcast(qv), "query_id").withColumn(
        "sim", cosine(F.col("qvec"), F.col("cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 6).alias("sim"))
    )


def diversity_report(
    embeddings: DataFrame, sample_mod: int = 25, id_col: str = "vec_id"
) -> DataFrame:
    """One row: (n_sample, mean_cos, min_cos, max_cos) — pairwise-cosine
    diversity of a deterministic corpus sample (``id % mod == 0``), the
    selection-diversity metric curation tracks alongside quality (a
    dedup/sampling change that collapses diversity shows up here as
    mean_cos drifting toward 1).

    The quadratic stage runs on the SAMPLE only (n²/mod² pairs — choose
    mod so the sample stays executor-sized; the corpus itself is
    scanned once for the filter). The mean folds in (id_a, id_b) order
    for the bit-exact cross-engine result."""
    emb = spread(embeddings, id_col).filter(
        F.col(id_col) % sample_mod == 0
    ).select(
        F.col(id_col).alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    a = emb.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).withColumn(
        "cos", cosine(F.col("va"), F.col("vb"))
    )
    n_sample = emb.agg(F.count(F.lit(1)).alias("n_sample"))
    agg = pairs.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("id_a", "id_b", "cos"))
                ),
                lambda s: s["cos"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum"),
        F.count(F.lit(1)).alias("_n"),
        F.round(F.min("cos"), 6).alias("min_cos"),
        F.round(F.max("cos"), 6).alias("max_cos"),
    )
    return agg.crossJoin(F.broadcast(n_sample)).select(
        "n_sample",
        F.round(F.col("_sum") / F.col("_n"), 6).alias("mean_cos"),
        "min_cos",
        "max_cos",
    )


def ivf_search(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — top-k cosine search over a
    PREBUILT inverted index (vec_id, cell, vec), e.g. the output of the
    streaming ``watch_embeddings_ann`` watcher or a persisted batch
    build. Same probe/tie-break semantics as :func:`topk_ivf` (which
    builds its index inline): queries fan out to their ``n_probe``
    best cells only; the corpus-sized index is touched through one
    cell-keyed join."""
    q = spread(queries, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    scored = q.crossJoin(F.broadcast(centroids)).withColumn(
        "_s", cosine(F.col("qv"), F.col("cvec"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("_s"), "cell")
    probes = (
        scored.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cand = (
        probes.join(index, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("vec")))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    return (
        cand.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rk",
            F.round("sim", 6).alias("sim"),
        )
    )


def topk_ivfpq(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    kc: int = 16,
    dim: int | None = None,
    handles: list | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — IVF-PQ with RESIDUAL
    encoding (IVFADC, Jégou et al. 2011 §IV): the production ANN
    layout that combines both compression axes. The corpus is coarsely
    quantized into ``n_cells`` inverted lists; each vector stores only
    its cell id + ``m`` sub-codes of the RESIDUAL (vector − its cell
    centroid); a query probes its ``n_probe`` best cells and scores
    candidates as dot(q, centroid_cell) + Σ_sub ADC_tab[sub, code] —
    the centroid term re-adds what residual coding removed, so
    approximation error is per-residual, much smaller than whole-
    vector PQ at the same code budget.

    Residual codes are argmin SQUARED L2 to the per-subspace codebook
    (the metric residual PQ optimizes; ties break on the lower code),
    codebooks are the residual sub-slices of the first ``kc`` vectors
    by id (the family's deterministic training policy — quality is
    MEASURED via recall_vs_bruteforce, not assumed).

    100 TB shape: centroids (n_cells) and codebooks (m·kc) broadcast;
    the corpus makes two passes (assign, encode) and is thereafter
    carried as (cell, m codes) — store that, not the floats; probes
    and ADC tables are query-side broadcast; the candidate join keys
    on cell (bucket the stored codes by cell and it prunes). Score
    folds in subspace order (DuckDB ``sum(d ORDER BY sub)``,
    bit-for-bit).

    Composes :func:`ivfpq_index` (the persistable build) with
    :func:`ivfpq_search` (serve over a prebuilt index) — the
    build-once/serve-many split, same contract as
    ``ivf_search``/``watch_embeddings_ann``."""
    cents, cb, codes = ivfpq_index(
        embeddings, n_cells, m, kc, dim, handles=handles
    )
    if isinstance(query_ids, Column):
        q = spread(embeddings, "vec_id").filter(query_ids)
    else:
        q = embeddings.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    return ivfpq_search(
        codes, cents, cb, q, k=k, n_probe=n_probe, m=m
    )


def ivfpq_index(
    embeddings: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    kc: int = 16,
    dim: int | None = None,
    handles: list | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(centroids, codebooks, codes) — the persistable IVF-PQ index
    build: centroids (cell, ccvec over NORMALIZED vectors), residual
    codebooks (sub, code, cvec), and the compressed corpus
    (vec_id, cell, codes array<int>) — at 100 TB, write all three to
    parquet (codes bucketed by cell) and serve with
    :func:`ivfpq_search`; the floats never travel again.

    ``handles`` is accepted for API symmetry with :func:`kmeans` but
    currently receives nothing: persisting the ``nrm``/``assigned``
    fan-out points was paired-A/B MEASURED A LOSS here (r15:
    topk_ivfpq 3.72 s persisted vs 2.83 s not, recall_ivfpq 3.07 vs
    2.80 — only 2-3 references each, the materialization barrier costs
    more than the re-computed subtree, unlike kmeans' iters+1 passes),
    so the index build stays barrier-free."""
    from ..sources.tables import EMBEDDING_DIM

    d = dim if dim is not None else EMBEDDING_DIM
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m {m}")
    dsub = d // m
    nrm = spread(embeddings, "vec_id").select(
        "vec_id",
        _normalized_vec(F.col("embedding").cast("array<double>")).alias("nv"),
    )
    # coarse quantizer: first n_cells NORMALIZED vectors by id
    top = nrm.orderBy("vec_id").limit(n_cells)
    cents = (
        top.withColumn("_rn", F.row_number().over(Window.orderBy("vec_id")))
        .select((F.col("_rn") - 1).alias("cell"), F.col("nv").alias("ccvec"))
    )
    scored_cells = nrm.crossJoin(F.broadcast(cents)).withColumn(
        "_s", _dot(F.col("nv"), F.col("ccvec"))
    )
    assigned = (
        scored_cells.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cell", "nv", "ccvec"),
                F.struct(F.col("_s"), (-F.col("cell")).alias("_nc")),
            ).alias("_b")
        )
        .select(
            "vec_id",
            F.col("_b.cell").alias("cell"),
            F.zip_with(
                F.col("_b.nv"), F.col("_b.ccvec"), lambda a, b: a - b
            ).alias("res"),
        )
    )
    # residual codebooks: sub-slices of the first kc vectors' residuals
    rtop = assigned.orderBy("vec_id").limit(kc)
    rcoded = rtop.withColumn(
        "code", F.row_number().over(Window.orderBy("vec_id")) - 1
    )
    cb = rcoded.select(
        "code",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("res", s * dsub + 1, dsub),
            )
        ).alias("sub", "cvec"),
    ).select("sub", "code", "cvec")
    codes = _ivfpq_encode_assigned(assigned, cb, dsub)
    return cents, cb, codes


def _ivfpq_encode_assigned(
    assigned: DataFrame, codebooks: DataFrame, dsub: int
) -> DataFrame:
    """(vec_id, cell, codes) from (vec_id, cell, res) rows: argmin
    squared-L2 per (vector, subspace) against the broadcast codebooks
    (ties: lower code); map-side combine collapses the kc scored
    copies before the shuffle."""
    enc_scored = assigned.crossJoin(F.broadcast(codebooks)).withColumn(
        "_d2",
        F.aggregate(
            F.zip_with(
                F.slice("res", F.col("sub") * dsub + 1, dsub),
                F.col("cvec"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        enc_scored.groupBy("vec_id", "sub")
        .agg(
            F.min_by(F.col("code"), F.struct("_d2", "code")).alias("code"),
            F.first("cell").alias("cell"),
        )
        .groupBy("vec_id")
        .agg(
            F.first("cell").alias("cell"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes"),
        )
    )


def ivfpq_encode(
    embeddings: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, cell, codes) — encode NEW vectors against a FROZEN
    IVF-PQ model (the incremental-maintenance step: a stream/shipment
    encodes with the bootstrap-trained centroids + codebooks, so codes
    stay comparable across epochs — retraining the model re-encodes
    the world; freezing it is the standard serving contract, same
    policy as ``watch_embeddings_ann``'s frozen coarse quantizer)."""
    from ..sources.tables import EMBEDDING_DIM

    d = dim if dim is not None else EMBEDDING_DIM
    dsub = d // m
    nrm = spread(embeddings, "vec_id").select(
        "vec_id",
        _normalized_vec(F.col("embedding").cast("array<double>")).alias("nv"),
    )
    assigned = (
        nrm.crossJoin(F.broadcast(centroids))
        .withColumn("_s", _dot(F.col("nv"), F.col("ccvec")))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cell", "nv", "ccvec"),
                F.struct(F.col("_s"), (-F.col("cell")).alias("_nc")),
            ).alias("_b")
        )
        .select(
            "vec_id",
            F.col("_b.cell").alias("cell"),
            F.zip_with(
                F.col("_b.nv"), F.col("_b.ccvec"), lambda a, b: a - b
            ).alias("res"),
        )
    )
    return _ivfpq_encode_assigned(assigned, codebooks, dsub)


def ivfpq_search(
    codes: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    m: int = 8,
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — IVFADC serving over a
    PREBUILT index (:func:`ivfpq_index`'s three tables, typically read
    back from parquet): queries normalize, probe their ``n_probe``
    best cells, and score candidates from codes alone via the
    broadcast ADC tables. The corpus-sized ``codes`` table is touched
    through one cell-keyed join; full vectors are never read."""
    qv = spread(queries, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        _normalized_vec(F.col("embedding").cast("array<double>")).alias("qnv"),
    )
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .withColumn("_s", _dot(F.col("qnv"), F.col("ccvec")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_s").desc(), F.col("cell")
                )
            ),
        )
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "cell", F.col("_s").alias("cdot"))
    )
    qtab = (
        qv.crossJoin(F.broadcast(codebooks))
        .withColumn(
            "d",
            _dot(
                F.slice(
                    "qnv",
                    F.col("sub") * F.size("cvec") + 1,
                    F.size("cvec"),
                ),
                F.col("cvec"),
            ),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "d"))),
                lambda s: s["d"],
            ).alias("tab")
        )
    )
    stride = (F.size("tab") / F.lit(m)).cast("int")
    scored = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(F.broadcast(qtab), "query_id")
        .withColumn(
            "sim",
            F.col("cdot")
            + F.aggregate(
                F.transform(
                    "codes",
                    lambda c, s: F.element_at("tab", s * stride + c + F.lit(1)),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rk",
            F.round("sim", 6).alias("sim"),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    dup_eps: float = 0.98,
) -> DataFrame:
    """(query_id, neighbor_id, rk, sim) — each query's top-``k`` MOST
    similar NON-duplicate neighbors: contrastive-training hard-negative
    mining (the pairs that teach an embedding model the most are near
    the decision boundary — similar, but not the same content). Near
    duplicates (cosine ≥ ``dup_eps``, rounded-before-threshold like the
    dedup family) are excluded BEFORE ranking: a missed near-dup mined
    as a "negative" is a false negative that actively poisons the loss.

    Same scale shape as :func:`topk_bruteforce` (broadcast queries, one
    corpus scan, per-query rank window); swap the scorer for an ANN
    family's shortlist at billion-vector scale — the eps-exclusion and
    ranking compose unchanged."""
    emb = spread(embeddings, "vec_id").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    if isinstance(query_ids, Column):
        q = emb.filter(query_ids)
    else:
        q = emb.join(query_ids.select("vec_id"), "vec_id", "left_semi")
    q = q.select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    pairs = (
        F.broadcast(q)
        .crossJoin(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("vec").alias("cvec"),
            )
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = pairs.withColumn(
        "sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
    ).filter(F.col("sim") < F.lit(float(dup_eps)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", "sim")
    )


def embedding_drift(emb_a: DataFrame, emb_b: DataFrame) -> DataFrame:
    """One row: (n_a, n_b, mean_cosine, max_dim_shift, l2_shift) —
    drift between two embedding SNAPSHOTS (the shipment-QA gate on the
    vector side, twin of ``text.vocab_drift``): compare the per-
    dimension MEAN vectors of snapshot A and B. An encoder change, a
    preprocessing bug, or a population shift shows up as mean_cosine
    falling from ~1 and the per-dimension shifts spiking — before any
    ANN index built on the new drop silently degrades.

    Determinism: per-dimension means fold component sums in vec_id
    order (the ivf_refine policy — bounded by members per dim-group);
    the dim-sized cross-mean folds order by pos. Degenerate snapshots
    (either side empty → zero-norm means) report NULL metrics instead
    of NaN in BOTH engines.

    Scale shape: each snapshot is one corpus pass collapsing to a
    DIM-sized mean table; everything downstream is dim-sized. The
    counts ride along as one-row broadcast aggregates."""
    def mean_vec(emb: DataFrame) -> DataFrame:
        comps = spread(emb, "vec_id").select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        return comps.groupBy("pos").agg(
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("vec_id", "val"))
                        ),
                        lambda s: s["val"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count(F.lit(1))
            ).alias("m")
        )
    ma = mean_vec(emb_a).withColumnRenamed("m", "ma")
    mb = mean_vec(emb_b).withColumnRenamed("m", "mb")
    j = ma.join(mb, "pos")

    def fold(expr):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), expr.alias("v")))),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    metrics = j.agg(
        fold(F.col("ma") * F.col("mb")).alias("_dot"),
        fold(F.col("ma") * F.col("ma")).alias("_na2"),
        fold(F.col("mb") * F.col("mb")).alias("_nb2"),
        F.max(F.abs(F.col("ma") - F.col("mb"))).alias("_maxd"),
        fold(
            (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
        ).alias("_d2"),
    )
    na = emb_a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = emb_b.agg(F.count(F.lit(1)).alias("n_b"))
    return (
        na.crossJoin(nb)
        .crossJoin(metrics)
        .select(
            "n_a",
            "n_b",
            F.when(
                (F.col("_na2") > 0) & (F.col("_nb2") > 0),
                F.round(
                    F.col("_dot")
                    / (F.sqrt(F.col("_na2")) * F.sqrt(F.col("_nb2"))),
                    6,
                ),
            ).alias("mean_cosine"),
            F.round(F.col("_maxd"), 6).alias("max_dim_shift"),
            F.round(F.sqrt(F.col("_d2")), 6).alias("l2_shift"),
        )
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_id: int,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """(rk, vec_id, relevance, mmr_score) — Maximal Marginal Relevance
    re-ranking (Carbonell & Goldstein 1998): greedily pick ``k``
    results maximizing ``λ·rel(d) − (1−λ)·max_sim(d, selected)`` — the
    standard diversity-aware rerank that keeps a result page (or a
    few-shot example set) from filling up with near-duplicates of the
    top hit.

    Scale shape: the corpus-sized work is the candidate generation —
    one exact top-``n_candidates`` pass here (swap any ANN kernel
    upstream at scale); the greedy loop then runs on the COLLECTED
    candidate table, bounded at ``n_candidates`` rows by construction
    (the bounded-collect pattern of ``fit_quality_classifier``).
    Deterministic cross-engine: relevance and candidate pair-sims are
    left-to-right double cosine folds rounded half-up to 6 dp, MMR
    scores round to 9 dp, ties break on vec_id."""
    from .text import round_half_up  # driver-side twin of F.round

    cands_df = (
        topk_bruteforce(
            embeddings, F.col("vec_id") == query_id, k=n_candidates
        )
        .join(
            embeddings.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            "neighbor_id",
        )
        .select("neighbor_id", "sim", "v")
    )
    cands = sorted(
        ((int(r.neighbor_id), float(r.sim), list(r.v))
         for r in cands_df.collect()),
        key=lambda t: t[0],
    )

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math

    def _cos6(a, b):
        return round_half_up(
            _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b))), 6
        )

    vecs = {i: v for i, _, v in cands}
    rel = {i: s for i, s, _ in cands}
    remaining = [i for i, _, _ in cands]
    picked: list[tuple[int, int, float, float]] = []
    while remaining and len(picked) < k:
        best = None
        for i in remaining:
            maxsim = max(
                (_cos6(vecs[i], vecs[j]) for _, j, _, _ in picked),
                default=0.0,
            )
            score = round_half_up(
                lam * rel[i] - (1.0 - lam) * maxsim, 9
            )
            # argmax with vec_id tiebreak (smaller id wins)
            if best is None or score > best[1] or (
                score == best[1] and i < best[0]
            ):
                best = (i, score)
        picked.append((len(picked) + 1, best[0], rel[best[0]], best[1]))
        remaining.remove(best[0])
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        picked, "rk int, vec_id long, relevance double, mmr_score double"
    )


def mmr_rerank_many(
    embeddings: DataFrame,
    query_ids: DataFrame | Column,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
) -> DataFrame:
    """(query_id, rk, vec_id, relevance, mmr_score) — the query-TABLE
    form of :func:`mmr_rerank` (the serving shape, like
    ``hybrid_search_many``): candidate generation for ALL queries is
    one corpus pass (``topk_bruteforce`` already fans a broadcast
    query table out), then the greedy selection runs per query on the
    collected candidate block — bounded at queries × ``n_candidates``
    rows. Same determinism contract as the single-query form."""
    from .text import round_half_up

    cands_df = (
        topk_bruteforce(embeddings, query_ids, k=n_candidates)
        .join(
            embeddings.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", "sim", "v")
    )
    rows = sorted(
        ((int(r.query_id), int(r.neighbor_id), float(r.sim), list(r.v))
         for r in cands_df.collect()),
        key=lambda t: (t[0], t[1]),
    )

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math

    def _cos6(a, b):
        return round_half_up(
            _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b))), 6
        )

    out: list[tuple[int, int, int, float, float]] = []
    by_q: dict[int, list[tuple[int, float, list]]] = {}
    for qid, nid, sim, v in rows:
        by_q.setdefault(qid, []).append((nid, sim, v))
    for qid in sorted(by_q):
        vecs = {i: v for i, _, v in by_q[qid]}
        rel = {i: s for i, s, _ in by_q[qid]}
        remaining = [i for i, _, _ in by_q[qid]]
        picked: list[int] = []
        while remaining and len(picked) < k:
            best = None
            for i in remaining:
                maxsim = max(
                    (_cos6(vecs[i], vecs[j]) for j in picked), default=0.0
                )
                score = round_half_up(
                    lam * rel[i] - (1.0 - lam) * maxsim, 9
                )
                if best is None or score > best[1] or (
                    score == best[1] and i < best[0]
                ):
                    best = (i, score)
            out.append(
                (qid, len(picked) + 1, best[0], rel[best[0]], best[1])
            )
            picked.append(best[0])
            remaining.remove(best[0])
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        out,
        "query_id long, rk int, vec_id long, relevance double, "
        "mmr_score double",
    )
