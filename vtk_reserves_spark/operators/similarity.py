"""Similarity search over embedding columns (``array<float>``).

North-star additions (SURVEY.md §2.8).  Two paths:

- :func:`cosine_topk` — brute-force exact top-k: the (small) query set
  is broadcast against the corpus, cosine evaluated JVM-side via
  higher-order functions, ranked per query.  Exact baseline; cost is
  O(|queries| · |corpus|) with no corpus shuffle except the final
  per-query top-k (rank window partitioned by query id).
- :func:`lsh_topk` — the scale path: sign-LSH bucketing with
  md5-derived deterministic hyperplanes (constants baked into the
  plan); each query only scans its own bucket, trading recall for a
  ~2^bits reduction in compared pairs.  Same ranking semantics.

Deterministic ordering: ties broken by ascending corpus id, so results
are reproducible and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.vectors import (
    cosine,
    deterministic_hyperplanes,
    dot,
    lsh_bucket,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, sim, rank), self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    max_sim: float | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each
    query, the top-k most-similar corpus vectors whose LABEL differs
    (the negatives that actually teach the model, vs random
    negatives that are trivially separable).  Optional ``max_sim``
    excludes near-duplicate "false negatives" above the cutoff —
    the standard guard against mislabeled positives poisoning the
    batch.

    Returns (query_id, neighbor_id, sim, rank).  Scale shape
    mirrors :func:`cosine_topk`: queries broadcast (the small side
    by construction), corpus streamed once, per-query top-k via
    window — no corpus self-join.  For web-scale corpora swap the
    scorer for :func:`ivf_topk` candidates and keep the same
    label-exclusion filter."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("clabel"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("qlabel") != F.col("clabel"))
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("sim"),
        )
    )
    if max_sim is not None:
        scored = scored.where(F.col("sim") <= F.lit(max_sim))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _check_dim(df: DataFrame, vec_col: str, dim: int, what: str) -> None:
    """Fail loudly when the declared hyperplane dimension doesn't match
    the data: Spark's zip_with pads the shorter array with NULLs, so a
    mismatch silently sends EVERY vector to bucket 0 — LSH collapses to
    a full scan (or one giant GEMM group) with no error pointing here."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).take(1)
    if row and row[0]["n"] != dim:
        raise ValueError(
            f"{what}: embedding length {row[0]['n']} != dim={dim} — pass "
            "the actual vector dimension"
        )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: str = "lsh",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH (OR-construction):
    ``n_tables`` independent bucketings; a corpus vector is a candidate
    if it shares a bucket with the query in ANY table.  Compared pairs
    shrink by ~2^n_bits per table while recall grows with n_tables —
    the classic LSH recall/cost dial.  Ranking semantics (ties by
    ascending id) match :func:`cosine_topk`."""
    _check_dim(corpus, vec_col, dim, "lsh_topk corpus")
    _check_dim(queries, vec_col, dim, "lsh_topk queries")
    tables = [
        deterministic_hyperplanes(n_bits, dim, f"{seed}{t}") for t in range(n_tables)
    ]

    def bucket_keys(vec):
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"), lsh_bucket(vec, planes).alias("b")
                )
                for t, planes in enumerate(tables)
            ]
        )

    qk = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(bucket_keys(F.col(vec_col))).alias("tb"),
    ).select("query_id", "tb.t", "tb.b")
    ck = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(bucket_keys(F.col(vec_col))).alias("tb"),
    ).select("neighbor_id", "tb.t", "tb.b")
    cand = (
        F.broadcast(qk)
        .join(ck, ["t", "b"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: the corpus is
    partitioned into ``n_centroids`` Voronoi cells of a coarse quantizer;
    each query scans only its ``n_probe`` nearest cells, cutting compared
    pairs by ~n_centroids/n_probe while keeping high recall.

    The default quantizer is deterministic — the first ``n_centroids``
    corpus vectors — so the whole pipeline is reproducible and
    SQL-expressible for the oracle.  Pass ``centroids`` (the
    ``(centroid_id, centroid)`` relation :func:`kmeans_fit` returns)
    to use trained k-means cells instead — the assignment, probe and
    rerank stages are identical; only the centroid relation changes
    (``n_centroids`` is then ignored).

    Plan shape: centroids are a broadcast relation; corpus assignment is
    one broadcast join + per-id argmax (window) -> ONE shuffle keyed by
    corpus id, reusable across queries; probing joins the (tiny) query
    probe list against the cell-keyed corpus; exact cosine reranks only
    in-cell candidates."""
    if centroids is not None:
        cent = centroids.select(
            F.col("centroid_id").alias("cid"),
            F.col("centroid").alias("cvec"),
        )
        # materialize the (tiny — n_centroids rows) relation ONCE: the
        # caller often hands the raw kmeans_fit plan, and without the
        # checkpoint the emptiness check below plus the later broadcast
        # would each re-run the full k-means lineage
        cent = cent.localCheckpoint(eager=True)
        # same fail-loud contract as the default quantizer below: an
        # empty centroid relation would silently zero out every stage
        if not cent.take(1):
            raise ValueError("ivf_topk got an empty centroids relation")
    else:
        cent = (
            corpus.where(F.col(id_col) < n_centroids)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        )
        # the deterministic quantizer assumes dense integer ids from 0 —
        # string ids (cast to NULL) or an offset id range would leave the
        # centroid relation EMPTY and every stage would silently return
        # zero rows; fail loudly instead
        if not cent.take(1):
            raise ValueError(
                f"ivf_topk found no corpus rows with {id_col} < "
                f"{n_centroids}: the deterministic quantizer needs dense "
                "integer ids starting at 0 — remap ids or substitute "
                "k-means centroids"
            )

    def assign(df: DataFrame, out_id: str, n_keep: int) -> DataFrame:
        scored = (
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("_v"))
            .join(F.broadcast(cent))
            .select(
                out_id,
                "cid",
                cosine(F.col("_v"), F.col("cvec")).alias("_sim"),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("_sim").desc(), F.col("cid").asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n_keep)
            .select(out_id, "cid")
        )

    corpus_cells = assign(corpus, "neighbor_id", 1)
    query_probes = assign(queries, "query_id", n_probe)
    cand = (
        F.broadcast(query_probes)
        .join(corpus_cells, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec2"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec2")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 4,
    dim: int = 64,
    seed: str = "lsh",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: only
    same-bucket pairs are scored (near-identical vectors collide in
    every bucket with overwhelming probability).

    Pair scoring is ONE numpy GEMM per bucket (``applyInPandas``:
    normalize the bucket matrix, ``U @ U.T``, emit the upper triangle
    over threshold) instead of |bucket|² interpreted per-pair dot
    expressions — ~5× faster at bench scale and the gap widens with
    dimension.  One shuffle, keyed by bucket.  At larger corpora raise
    ``n_bits`` so bucket matrices stay executor-sized (buckets shrink
    ~2× per bit; the GEMM is |bucket|²·dim)."""
    import numpy as np
    import pandas as pd

    planes = deterministic_hyperplanes(n_bits, dim, seed)
    # NULL or wrong-length embeddings would all hash to bucket 0 (the
    # zip_with null-padding poisons every plane's dot product) and then
    # crash the numpy GEMM with an opaque object-array error — drop them
    # here; ``dim`` must match the real embedding length
    keyed = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        u = np.array([np.asarray(v, np.float64) for v in pdf["vec"]])
        norms = np.linalg.norm(u, axis=1, keepdims=True)
        np.divide(u, norms, out=u, where=norms > 0)
        s = u @ u.T
        ia, ib = np.triu_indices(len(ids), k=1)
        vals = s[ia, ib]
        keep = vals >= threshold
        ia, ib, vals = ia[keep], ib[keep], vals[keep]
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": vals})

    return keyed.groupBy("bucket").applyInPandas(
        bucket_pairs, schema="id_a long, id_b long, sim double"
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared Euclidean,
    ties broken by centroid id ascending — deterministic).

    ``centroids`` is the small relation ``(centroid_id, centroid)``
    (extra columns are ignored); it broadcasts, the distance folds
    inside Catalyst (``zip_with`` + ``aggregate``, index order — no
    Python), and one keyed window picks the argmin.  Shuffle is O(n·k)
    rows hashed by ``id_col``; at cluster scale swap the window for
    ``min_by`` if k is large.  Rows whose distance is NULL against
    every centroid (NULL or dimension-mismatched vectors — zip_with
    null-pads the shorter side) are DROPPED, never mis-assigned.
    Returns the input columns plus ``(centroid_id, d2)``."""
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cent = centroids.select("centroid_id", "centroid")
    j = (
        df.crossJoin(F.broadcast(cent))
        .withColumn("_d2", d2)
        .where(F.col("_d2").isNotNull())
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_d2").asc(), F.col("centroid_id").asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "centroid")
        .withColumnRenamed("_d2", "d2")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column — the real
    coarse quantizer for :func:`ivf_topk` (which documents this exact
    seam: swap its deterministic first-k quantizer for trained
    centroids).

    Fully deterministic: initial centroids are the ``k`` lowest-id
    vectors, assignment ties break by centroid id, and every step is a
    fixed expression — so a FIXED iteration count is reproducible in
    SQL (the q:kmeans oracle replays both iterations in CTEs; an
    iterate-to-convergence mode would not be).  A cluster that loses
    all members simply disappears (no re-seeding), the standard Lloyd
    degeneracy, documented rather than hidden.

    Per iteration: one broadcast assignment (no shuffle on the corpus
    beyond the argmin window) and one centroid update — ``posexplode``
    to (cluster, dim) pairs, mean-reduce, regroup to arrays; 2 hash
    aggregations linear in n·d.  Returns ``(centroid_id, n_assigned,
    centroid)`` where ``n_assigned`` counts the final assignment that
    produced each centroid."""
    if k <= 0 or n_iter <= 0:
        raise ValueError("k and n_iter must be positive")
    cent = df.where(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("centroid_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "centroid"
        ),
    )
    # fail loudly on the silent-empty degeneracies (same contract as
    # ivf_topk's default quantizer): no init vectors (non-dense / offset
    # / string ids), or ragged init dimensions; then drop corpus rows
    # that are NULL or off-dimension so they can never fold into a mean
    sizes = [
        r[0]
        for r in cent.select(F.size("centroid")).distinct().take(2)
    ]
    if not sizes:
        raise ValueError(
            f"kmeans_fit found no vectors with {id_col} < {k} for the "
            "deterministic init — ids must be dense integers from 0, or "
            "remap them first"
        )
    if len(sizes) > 1:
        raise ValueError(
            f"kmeans_fit init vectors have mixed dimensions {sizes!r}"
        )
    dim = sizes[0]
    df = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    )
    counts = None
    for _ in range(n_iter):
        a = kmeans_assign(df, cent, id_col, vec_col)
        counts = a.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("n_assigned")
        )
        ex = a.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("_pos", "_x")
        )
        per_dim = ex.groupBy("centroid_id", "_pos").agg(
            F.avg(F.col("_x").cast("double")).alias("_v")
        )
        cent = per_dim.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_v"))),
                lambda s: s["_v"],
            ).alias("centroid")
        )
        # materialize the k-row centroid relation each round (the bpe.py
        # device) once the fit is deep enough to matter: without it
        # iteration i's plan re-derives every earlier assignment pass
        # wherever `cent` is referenced, so final-evaluation work grows
        # combinatorially with n_iter.  At n_iter <= 2 the lazy plan is
        # measurably CHEAPER than paying an eager job per round
        # (isolated best-of-3: 1.85 s lazy vs 2.6 s checkpointed on
        # q:kmeans), so shallow fits keep it.  k rows: metadata sized.
        if n_iter > 2:
            cent = cent.localCheckpoint(eager=True)
    return cent.join(counts, "centroid_id").select(
        "centroid_id", "n_assigned", "centroid"
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings coarsely, then drop
    within-cluster semantic duplicates by cosine similarity.

    The keep rule is PINNED (and SQL-replayable, unlike a greedy
    chain): a vector is dropped iff some LOWER-id vector in the SAME
    cluster has cosine similarity >= ``threshold`` — the keep-first
    convention every dedup operator here uses (`operators/dedup.py`).

    ``centroids`` is the small ``(centroid_id, centroid)`` relation —
    train with :func:`kmeans_fit` or pass fixed seed vectors (the
    oracle-checked query does the latter so DuckDB can replay the
    assignment closed-form).

    Scale shape: one broadcast assignment (`kmeans_assign`), then ONE
    shuffle keyed by cluster; per-cluster scoring is one numpy GEMM in
    ``applyInPandas`` (the `embedding_near_dup_pairs` pattern — never
    |cluster|^2 interpreted expressions, never an all-pairs corpus
    join).  Clusters are ~n/k; raise k so cluster matrices stay
    executor-sized, exactly the SemDeDup paper's own scaling knob.
    Returns ``(id_col, centroid_id, kept)`` for every input vector
    that assigned to a cluster.
    """
    import numpy as np
    import pandas as pd

    assigned = kmeans_assign(df, centroids, id_col, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        "centroid_id",
    )

    def cluster_dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        u = np.array(
            [np.asarray(v, np.float64) for v in pdf["vec"].to_numpy()[order]]
        )
        norms = np.linalg.norm(u, axis=1, keepdims=True)
        np.divide(u, norms, out=u, where=norms > 0)
        s = u @ u.T
        # dropped iff any strictly-lower-id row similar enough
        dup = (np.tril(s >= threshold, k=-1)).any(axis=1)
        return pd.DataFrame(
            {
                "id": ids,
                "centroid_id": pdf["centroid_id"].to_numpy()[order],
                "kept": ~dup,
            }
        )

    out_schema = "id long, centroid_id int, kept boolean"
    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(cluster_dedup, out_schema)
        .withColumnRenamed("id", id_col)
    )


# -------------------------------------------------- product quantization


def _pq_centroid_array(cb_rows):
    """Collected codebook rows -> (m, n_codes, sub) ndarray with
    +inf in absent (subspace, code) holes so argmin never picks a
    dead code."""
    import numpy as np

    if not cb_rows:
        raise ValueError("pq: empty codebook")
    m = max(r["subspace"] for r in cb_rows) + 1
    subs = {len(r["centroid"]) for r in cb_rows}
    if len(subs) != 1:
        raise ValueError("pq: ragged codebook centroids")
    sub = subs.pop()
    n_codes = max(r["code"] for r in cb_rows) + 1
    cents = np.full((m, n_codes, sub), np.inf)
    for r in cb_rows:
        cents[r["subspace"], r["code"]] = r["centroid"]
    return cents


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
) -> DataFrame:
    """Train product-quantizer codebooks (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split
    each vector into ``m`` contiguous subvectors and run the SAME
    deterministic Lloyd's as :func:`kmeans_fit` independently per
    subspace — init = the subvectors of the ``k`` lowest-id vectors,
    ties break by lowest code, fixed iteration count
    (SQL-replayable on degenerate fixtures).

    Returns ``(subspace, code, centroid)`` — at most ``m * k`` rows,
    KBs: the codebook broadcasts everywhere downstream.  Per
    iteration the corpus streams through ONE narrow Arrow-batched
    ``mapInPandas`` pass that emits per-partition PARTIAL sums
    (``partitions * m * k`` tiny rows — a map-side combine with no
    shuffle of vector rows at all); the driver folds partials into
    the next centroids.  Linear in ``n * d``, nothing quadratic, no
    lineage growth across iterations (each pass closes over a plain
    numpy array)."""
    import numpy as np

    init = (
        df.where(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("_c"), vec_col)
        .collect()
    )
    if not init:
        raise ValueError(
            f"pq_train found no init vectors with {id_col} < {k} — "
            "ids must be dense integers from 0, or remap them first"
        )
    # dimension comes from the init vectors (no extra corpus scan);
    # the training pass re-checks every batch, so a ragged corpus
    # still fails with the same error during this call's actions
    dims = {len(r[vec_col]) for r in init if r[vec_col] is not None}
    if len(dims) != 1:
        raise ValueError(
            f"pq: vectors must share one dimension (saw {sorted(dims)!r})"
        )
    d = dims.pop()
    if m <= 0 or d % m:
        raise ValueError(f"pq: dimension {d} not divisible by m={m}")
    sub = d // m
    cents = np.full((m, k, sub), np.inf)
    live = np.zeros((m, k), dtype=bool)
    for r in init:
        c = int(r["_c"])
        cents[:, c, :] = np.asarray(r[vec_col], float).reshape(m, sub)
        live[:, c] = True
    vecs_only = df.select(vec_col)
    for _ in range(n_iter):
        cur = cents.copy()

        def partial(batches, cur=cur):
            import pandas as pd

            sums = np.zeros((m, k, sub))
            cnts = np.zeros((m, k), dtype=np.int64)
            seen = False
            for pdf in batches:
                col = pdf[vec_col].dropna()
                if not len(col):
                    continue
                arr = np.stack([np.asarray(v, float) for v in col])
                if arr.shape[1] != d:
                    raise ValueError(
                        "pq: vectors must share one dimension "
                        f"(saw [{d}, {arr.shape[1]}])"
                    )
                sv = arr.reshape(-1, m, sub)
                # (n, m, k): squared L2 per subvector vs centroid;
                # argmin tie-breaks to the lowest code like
                # min(struct(d2, code))
                d2 = ((sv[:, :, None, :] - cur[None]) ** 2).sum(-1)
                code = d2.argmin(-1)
                for s in range(m):
                    np.add.at(sums[s], code[:, s], sv[:, s, :])
                    np.add.at(cnts[s], code[:, s], 1)
                seen = True
            if seen:
                si, ci = np.nonzero(cnts)
                yield pd.DataFrame({
                    "subspace": si.astype("int32"),
                    "code": ci.astype("int32"),
                    "cnt": cnts[si, ci],
                    "vsum": [sums[a, b].tolist()
                             for a, b in zip(si, ci)],
                })

        parts = vecs_only.mapInPandas(
            partial,
            "subspace int, code int, cnt long, vsum array<double>",
        ).collect()
        sums = np.zeros((m, k, sub))
        cnts = np.zeros((m, k), dtype=np.int64)
        for r in sorted(parts, key=lambda r: (r["subspace"], r["code"])):
            sums[r["subspace"], r["code"]] += np.asarray(r["vsum"])
            cnts[r["subspace"], r["code"]] += int(r["cnt"])
        live = cnts > 0
        cents = np.full((m, k, sub), np.inf)
        cents[live] = sums[live] / cnts[live][:, None]
    rows = [
        (int(s), int(c), [float(x) for x in cents[s, c]])
        for s in range(m) for c in range(k) if live[s, c]
    ]
    return df.sparkSession.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    passthrough: tuple = (),
) -> DataFrame:
    """Vectors -> PQ codes: ``(id, codes array<int>)`` where
    ``codes[s]`` is the nearest codebook entry in subspace ``s``.
    This is the 8-256x compression step — at 100 TB the code table
    (``m`` small ints per vector) is what ships to the search tier,
    not the float vectors.  ONE narrow Arrow-batched mapInPandas
    pass with the KB-scale codebook in closure — no shuffle, no
    extra corpus scan (the dimension comes from the codebook and is
    re-checked per batch).  ``passthrough`` columns of ``df`` ride
    along unchanged (e.g. an IVF list id), saving downstream a
    re-join against the source relation."""
    import numpy as np

    cents = _pq_centroid_array(
        codebooks.select("subspace", "code", "centroid").collect()
    )
    if cents.shape[0] != m:
        raise ValueError(
            f"pq: codebook has {cents.shape[0]} subspaces, "
            f"expected m={m}"
        )
    sub = cents.shape[2]
    d = m * sub
    pt = list(passthrough)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            arr = np.stack([np.asarray(v, float) for v in pdf[vec_col]])
            if arr.shape[1] != d:
                raise ValueError(
                    f"pq: vectors have dimension {arr.shape[1]}, "
                    f"codebook expects {d}"
                )
            sv = arr.reshape(-1, m, sub)
            d2 = ((sv[:, :, None, :] - cents[None]) ** 2).sum(-1)
            codes = d2.argmin(-1).astype("int32")
            out = {
                id_col: pdf[id_col].to_numpy(),
                "codes": list(codes),
            }
            for c in pt:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = f"{id_col} {types[id_col]}, codes array<int>" + "".join(
        f", {c} {types[c]}" for c in pt
    )
    return df.select(id_col, vec_col, *pt).mapInPandas(enc, schema)


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query, the
    distance to every corpus item is the SUM over subspaces of
    ``||q_sub - centroid[codes[sub]]||^2``, looked up in a
    query-local table.

    Scale shape: the LUT is ``queries x m x k`` floats — computed as
    one broadcast expression join and collected (KBs; the queries
    relation is small by contract, like cosine_topk).  The corpus
    pass is ONE ``mapInPandas`` over the codes: numpy gathers the
    LUT rows per subspace and keeps only the per-partition top-k per
    query (argpartition), so the shuffle after the scan is
    ``partitions * queries * k`` rows, never ``n * queries``.  A
    final window takes the global top-k (ties -> ascending id)."""
    import numpy as np

    # both relations are small by contract (codebook m*k rows — and
    # already driver-local after pq_train's materialization; queries
    # like cosine_topk's): build the LUT in numpy with NO Spark jobs
    # beyond the two collects
    cents = _pq_centroid_array(
        codebooks.select("subspace", "code", "centroid").collect()
    )
    m, n_codes, sub = cents.shape
    q_rows = queries.select(query_id, vec_col).collect()
    qids = sorted(r[query_id] for r in q_rows)
    qvecs = {r[query_id]: np.asarray(r[vec_col], float) for r in q_rows}
    bad = [q for q, v in qvecs.items() if v.size != m * sub]
    if bad:
        raise ValueError(
            f"pq: queries {bad} have dimension != {m * sub}"
        )
    lut = np.full((len(qids), m, n_codes), np.inf)
    for qi, q in enumerate(qids):
        qv = qvecs[q].reshape(m, sub)
        # (m, n_codes): squared L2 of each query subvector vs centroid
        lut[qi] = ((cents - qv[:, None, :]) ** 2).sum(axis=2)

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):  # np.stack raises on empty batches
                continue
            ids = pdf[id_col].to_numpy()
            cd = np.stack(pdf["codes"].to_numpy())  # (n, m)
            # gather: scores[q, i] = sum_s lut[q, s, cd[i, s]]
            scores = np.zeros((len(qids), len(ids)))
            for s in range(m):
                scores += lut[:, s, cd[:, s]]
            take = min(k, len(ids))
            out = []
            for qi, q in enumerate(qids):
                # deterministic local cut: (d2, id) lexicographic, so
                # ties can never evict a lower id in one partition
                # that the global window would have kept
                part = np.lexsort((ids, scores[qi]))[:take]
                out.append(pd.DataFrame({
                    query_id: q,
                    id_col: ids[part],
                    "d2": scores[qi][part],
                }))
            yield pd.concat(out, ignore_index=True)

    qid_t = "string" if isinstance(qids[0], str) else "bigint"
    local = codes.mapInPandas(
        adc, f"{query_id} {qid_t}, {id_col} bigint, d2 double"
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("d2").asc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# -------------------------------------------------- scalar quantization


def sq_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) over an embedding column — ONE
    aggregation pass (posexplode -> min/max per dim, d rows to the
    driver); the calibration step of scalar quantization."""
    stats = (
        df.select(F.posexplode(vec_col).alias("_d", "_x"))
        .groupBy("_d")
        .agg(F.min(F.col("_x").cast("double")).alias("_mn"),
             F.max(F.col("_x").cast("double")).alias("_mx"))
        .orderBy("_d")
        .collect()
    )
    if not stats:
        raise ValueError("sq: no vectors to calibrate on")
    return [(float(r["_mn"]), float(r["_mx"])) for r in stats]


def sq_encode(
    df: DataFrame,
    stats: list[tuple[float, float]],
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """INT8-style scalar quantization: each dimension maps to
    ``round((x - min) / (max - min) * 255)`` clamped to [0, 255] —
    the standard uniform quantizer (FAISS SQ8 / the int8 embedding
    dumps vector stores ingest), 4x smaller than float32.  Pure
    Catalyst (zip_with against broadcast literal min/scale arrays,
    HALF_UP rounding via bround+0.5-floor... spark's ``round`` is
    HALF_UP on doubles, matching the closed-form SQL oracle), fully
    deterministic — so encode/decode hash-match SQL end-to-end."""
    # array literals parsed in ONE driver call each (F.lit(list) lowers
    # to per-element lit round-trips — functions/plan_literals)
    from vtk_reserves_spark.functions.plan_literals import lit_double_array

    mins = lit_double_array(mn for mn, _ in stats)
    scales = lit_double_array(
        255.0 / (mx - mn) if mx > mn else 0.0 for mn, mx in stats
    )
    code = F.zip_with(
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            mins, lambda x, mn: x - mn,
        ),
        scales,
        lambda d, sc: F.greatest(
            F.lit(0),
            F.least(F.lit(255), F.round(d * sc, 0).cast("int")),
        ),
    )
    return df.withColumn(out_col, code)


def sq_decode(
    df: DataFrame,
    stats: list[tuple[float, float]],
    codes_col: str = "codes",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse map: ``code / 255 * (max - min) + min`` — the
    reconstruction used at search time; quantization error is
    bounded by half a step per dimension."""
    from vtk_reserves_spark.functions.plan_literals import lit_double_array

    mins = lit_double_array(mn for mn, _ in stats)
    steps = lit_double_array((mx - mn) / 255.0 for mn, mx in stats)
    rec = F.zip_with(
        F.zip_with(
            F.col(codes_col), steps,
            lambda c, st: c.cast("double") * st,
        ),
        mins, lambda v, mn: v + mn,
    )
    return df.withColumn(out_col, rec)


# ------------------------------------------------------------- IVF-PQ


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 4,
    n_probe: int = 2,
    m: int = 4,
    pq_k: int = 16,
    n_iter: int = 1,
) -> DataFrame:
    """FAISS-style IVFADC: coarse k-means lists + product
    quantization of the RESIDUALS (x - centroid), searched by
    asymmetric distance over only the ``n_probe`` lists nearest each
    query.  The composition of :func:`kmeans_fit`/:func:`kmeans_assign`
    and :func:`pq_train`/:func:`pq_encode` — the index layout that
    serves billion-vector corpora.

    Scale shape: training/encoding are the components' own linear
    passes; the coarse centroids AND pq codebooks are driver-collected
    KBs; at search time each query's per-(list, code) LUT broadcasts
    into ONE mapInPandas pass over the code table that (a) skips rows
    whose list is not probed by any query and (b) keeps only a
    (d2, id)-lexicographic per-partition top-k per query — so the
    post-scan shuffle is partitions x queries x k rows.  At 100 TB
    the code table would additionally be BUCKETED by list id so
    probes prune entire files; the seam is the ``codes`` relation.

    Determinism: every stage inherits the components' deterministic
    tie-breaks, so with ``n_centroids=1`` on a closed-form corpus the
    result is exactly brute-force L2 (q:ivfpq_degenerate's oracle)."""
    import numpy as np

    # coarse training IS Lloyd's over whole vectors = pq_train with
    # m=1 (identical deterministic init + ties-to-lowest-code), so
    # the numpy-fused partial-sum trainer serves both quantizer
    # levels; k-means as a user-facing operator stays kmeans_fit
    coarse_rows = [
        {"centroid_id": int(r["code"]), "centroid": list(r["centroid"])}
        for r in pq_train(
            corpus, id_col, vec_col, m=1, k=n_centroids, n_iter=n_iter
        ).collect()
    ]
    cc_ids = np.array([r["centroid_id"] for r in coarse_rows])
    cc = np.stack([
        np.asarray(r["centroid"], float) for r in coarse_rows
    ])

    def res_pass(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            arr = np.stack([np.asarray(v, float) for v in pdf[vec_col]])
            a = ((arr[:, None, :] - cc[None]) ** 2).sum(-1).argmin(1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "centroid_id": cc_ids[a].astype("int32"),
                "_res": list(arr - cc[a]),
            })

    id_t = dict(corpus.dtypes)[id_col]
    residuals = corpus.select(id_col, vec_col).mapInPandas(
        res_pass, f"{id_col} {id_t}, centroid_id int, "
        "_res array<double>",
    )
    # the residual relation is consumed by codebook training AND the
    # encode/search pass: truncate its lineage so each consumer reads
    # materialized partitions instead of re-running the coarse
    # assignment — at index-build scale this is exactly the persist
    # step FAISS-style builders do between stages
    residuals = residuals.localCheckpoint()
    cb = pq_train(
        residuals.select(id_col, F.col("_res").alias(vec_col)),
        id_col, vec_col, m=m, k=pq_k, n_iter=n_iter,
    )
    # the IVF list id rides through the encode pass itself — no
    # re-join of the code table against the residual relation
    codes = pq_encode(
        residuals.select(
            id_col, F.col("_res").alias(vec_col), "centroid_id"
        ),
        cb, id_col, vec_col, m=m, passthrough=("centroid_id",),
    )
    # ---- search: driver-side probe selection + per-(query, list) LUT
    cents = {
        int(r["centroid_id"]): np.asarray(r["centroid"], float)
        for r in coarse_rows
    }
    cb_rows = cb.collect()
    sub = len(cb_rows[0]["centroid"])
    n_codes = max(r["code"] for r in cb_rows) + 1
    pq_cents = np.full((m, n_codes, sub), np.inf)
    for r in cb_rows:
        pq_cents[r["subspace"], r["code"]] = r["centroid"]
    q_rows = queries.select("query_id", vec_col).collect()
    qids = sorted(r["query_id"] for r in q_rows)
    luts: dict = {}  # (qid, cid) -> (m, n_codes) LUT
    probed_lists: set[int] = set()
    for r in q_rows:
        qv = np.asarray(r[vec_col], float)
        order = sorted(
            cents, key=lambda c: (float(((qv - cents[c]) ** 2).sum()), c)
        )[:n_probe]
        for cid in order:
            probed_lists.add(cid)
            qres = (qv - cents[cid]).reshape(m, sub)
            luts[(r["query_id"], cid)] = (
                (pq_cents - qres[:, None, :]) ** 2
            ).sum(axis=2)

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["centroid_id"].isin(list(probed_lists))]
            if not len(pdf):
                continue
            out = []
            for (qid, cid), lut in luts.items():
                part = pdf[pdf["centroid_id"] == cid]
                if not len(part):
                    continue
                ids = part[id_col].to_numpy()
                cd = np.stack(part["codes"].to_numpy())
                scores = np.zeros(len(ids))
                for s_ in range(m):
                    scores += lut[s_, cd[:, s_]]
                take = min(k, len(ids))
                sel = np.lexsort((ids, scores))[:take]
                out.append(pd.DataFrame({
                    "query_id": qid,
                    id_col: ids[sel],
                    "d2": scores[sel],
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    qid_t = "string" if isinstance(qids[0], str) else "bigint"
    local = codes.mapInPandas(
        adc, f"query_id {qid_t}, {id_col} bigint, d2 double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
