"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — JVM-side dot products via
  F.aggregate/zip_with (no Python in the hot path), then a top-k sort.
  The scale baseline: one scan, no shuffle until the final k-row sort.
- hyperplane LSH (SRP): deterministic random-hyperplane signatures assign
  each vector a bucket; probing only the query's bucket turns top-k into a
  fraction-of-corpus scan (the scale path; recall < 1 by construction).
- knn_join: top-k neighbors for each of a small query set via broadcast +
  window rank.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity against one query vector.
    Returns (id, similarity) ordered desc, ties broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col).cast(T.ArrayType(T.DoubleType())), q), 6).alias("similarity"),
    )
    return scored.orderBy(F.col("similarity").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# signed-random-projection LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype("float64")


def srp_bucket_column(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign-bit string of hyperplane dot products, bit-packed
    into a long (bit i set iff dot(plane_i, v) >= 0).

    One Arrow-batched pandas UDF over a closure-shipped (b, dim) numpy
    matrix — NOT b×dim literal-array Columns: at production embedding dims
    (768-1536) × 24 planes the literal form put ~18-37k constants into the
    Catalyst plan, blowing up analysis/codegen before a single row moved.
    The matrix ships once per task (~300 KB worst case), and each Arrow
    batch is one matmul."""
    P = np.ascontiguousarray(planes, dtype="float64")
    weights = np.uint64(1) << np.arange(P.shape[0], dtype=np.uint64)

    @pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype="int64"))
        m = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
        bits = (m @ P.T) >= 0
        return pd.Series((bits.astype(np.uint64) @ weights).astype("int64"))

    return bucket(vec_col)


def cosine_topk_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only vectors whose SRP bucket matches the
    query's. At N vectors and b planes the probed fraction is ~2^-b — the
    100 TB path (recall traded for a 2^b scan reduction)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qsigns = (planes @ np.asarray(query_vec, dtype="float64")) >= 0
    qbucket = int(sum(1 << i for i, s in enumerate(qsigns) if s))
    bucketed = df.withColumn("__bucket", srp_bucket_column(F.col(vec_col), planes))
    probe = bucketed.filter(F.col("__bucket") == qbucket)
    return cosine_topk(probe, query_vec, k, vec_col, id_col)


def ivf_centroids_for(n_rows: int) -> int:
    """Centroid count derived from corpus size: the sqrt(N) rule balances
    list length (N/C rows scanned per probed list) against the centroid
    table the driver holds and every assignment matmul multiplies by.
    Clamped to [16, 1024] — 1024 centroids × dim 1536 float64 is ~12 MB on
    the driver, the collect ceiling."""
    import math

    if n_rows <= 0:
        return 16
    return max(16, min(1024, int(math.isqrt(n_rows))))


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int | None = None,
    nprobe: int = 2,
    seed: int = 42,
    approx_count: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: vectors are assigned to their nearest
    centroid (inverted lists); the query probes only the ``nprobe`` nearest
    lists, scanning ~nprobe/n_centroids of the corpus.

    ``n_centroids=None`` derives sqrt(N) centroids (:func:`ivf_centroids_for`)
    from ``approx_count`` when the caller knows the corpus size (table
    metadata, a prior count — no extra job), else from one count() job.
    A fixed centroid count would leave each inverted list growing linearly
    with the corpus.

    Centroids are a deterministic hash-sample of the corpus itself (seeded;
    no iterative training — at 100 TB a k-means fit would be its own job,
    and spherical IVF with sampled centroids is the standard cheap variant).
    Assignment runs as an Arrow-batched pandas UDF, vectorized over
    rows×centroids with a LEFT-TO-RIGHT accumulation over dims on the RAW
    (unnormalized) vectors: argmax of dot(v, unit-centroid) ranks
    identically to the normalized-row cosine argmax (row norms are
    positive constants per row), and sequential IEEE adds are what an
    ANSI SQL ``+`` chain evaluates — so the cross-engine oracle
    reproduces every list assignment bit-for-bit (the pq_encode trick; a
    BLAS matmul over normalized rows would diverge in the last ulp)."""
    if n_centroids is None:
        n_centroids = ivf_centroids_for(
            approx_count if approx_count is not None else df.count())
    # deterministic sample: first n_centroids ids by murmur-ish hash order
    cand = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    cents = np.asarray([list(r[vec_col]) for r in cand], dtype="float64")
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
        d = np.zeros((len(m), cents.shape[0]))
        for t in range(m.shape[1]):
            d += m[:, None, t] * cents[None, :, t]
        return pd.Series(np.argmax(d, axis=1).astype("int32"))

    q = np.asarray(query_vec, dtype="float64")
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_lists = np.argsort(-(cents @ qn))[:nprobe].tolist()

    assigned = df.withColumn("__list", assign(F.col(vec_col)))
    probed = assigned.filter(F.col("__list").isin([int(x) for x in probe_lists]))
    return cosine_topk(probed, query_vec, k, vec_col, id_col)


def knn_join(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Top-k corpus neighbors for each query row (queries broadcast —
    exact, intended for small query sets): (q_id, vec_id, similarity,
    rank). For query sets too large to broadcast use
    :func:`knn_join_bucketed` (SRP bucket equi-join, approximate)."""
    from pyspark.sql.window import Window

    joined = df.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(
            cosine_similarity(
                F.col(vec_col).cast(T.ArrayType(T.DoubleType())),
                F.col(q_vec_col).cast(T.ArrayType(T.DoubleType())),
            ),
            6,
        ).alias("similarity"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("similarity").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join_bucketed(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    n_planes: int = 8,
    nprobe: int = 2,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate knn join for query sets too large to broadcast — the
    100 TB path ``knn_join`` documents it lacks. Corpus rows land in their
    SRP bucket (``srp_bucket_column``); each query probes its own bucket
    plus the ``nprobe-1`` least-confident bit flips (multi-probe LSH:
    flipping the hyperplane bits with the smallest |dot| first recovers
    most near-boundary misses). Candidates come from an EQUI-join on the
    bucket id — a plain shuffle hash join, never a crossJoin — and are
    ranked per query within the probed union.

    Work is ~nprobe · N/2^b candidate pairs per query instead of N; the
    recall tradeoff is explicit: a true neighbor whose bucket is not
    probed is missed. Raise ``nprobe`` (or lower ``n_planes``) for recall,
    lower them for throughput. Output: (q_id, vec_id, similarity, rank),
    rank <= k within the probed candidates."""
    from pyspark.sql.window import Window

    if dim is None:
        probe_row = queries.select(q_vec_col).first()
        dim = len(probe_row[0])
    planes = _hyperplanes(dim, n_planes, seed)
    P = np.ascontiguousarray(planes, dtype="float64")
    weights = np.uint64(1) << np.arange(P.shape[0], dtype=np.uint64)
    nflip = max(0, min(nprobe - 1, P.shape[0]))

    @pandas_udf(T.ArrayType(T.LongType()))
    def probe_buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype=object))
        m = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
        d = m @ P.T
        bits = (d >= 0).astype(np.uint64)
        base = bits @ weights
        # least-confident planes first: smallest |dot| = closest boundary.
        # kind="stable" breaks exact |dot| ties by ascending plane index —
        # the same order the SQL oracle's (|dot|, index) struct sort uses;
        # the default quicksort is NOT stable and a tie (e.g. a zero dot)
        # would probe different bits per engine
        order = np.argsort(np.abs(d), axis=1, kind="stable")
        out = []
        for i in range(len(m)):
            bs = [int(np.int64(base[i]))]
            for j in range(nflip):
                bs.append(int(np.int64(base[i] ^ (np.uint64(1) << order[i, j].astype(np.uint64)))))
            out.append(bs)
        return pd.Series(out)

    corpus = df.withColumn(
        "__bucket", srp_bucket_column(F.col(vec_col), planes))
    probed = queries.withColumn(
        "__bucket", F.explode(probe_buckets(F.col(q_vec_col))))
    # equi-join on the bucket id: candidates shuffle by bucket, no
    # crossJoin / BroadcastNestedLoopJoin anywhere in the plan
    cand = corpus.join(probed, "__bucket")
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(
            cosine_similarity(
                F.col(vec_col).cast(T.ArrayType(T.DoubleType())),
                F.col(q_vec_col).cast(T.ArrayType(T.DoubleType())),
            ),
            6,
        ).alias("similarity"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("similarity").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------

def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample_size: int = 2048,
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011): split each
    vector into ``m`` subspaces and Lloyd-k-means each to ``k`` centroids.
    Returns an (m, k, d/m) float64 array.

    Training runs driver-side on a BOUNDED deterministic sample
    (xxhash64-ordered ids, <= sample_size rows — the IVF-centroid
    precedent): at 100 TB the fit cost is O(sample), independent of
    corpus size, and the sample is stable across runs/executors.
    Deterministic throughout — seeded init, argmin ties to the lowest
    centroid index, empty clusters keep their previous centroid."""
    rows = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype="float64")
    return _pq_fit(X, m, k, iters, seed)


def _pq_fit(X: np.ndarray, m: int, k: int, iters: int, seed: int) -> np.ndarray:
    """Spark-free Lloyd-k-means core of :func:`pq_train` over an already
    sampled (and xxhash64-ordered) matrix — also used by the driver-side
    oracle builder, which reproduces the sample with the pure-Python
    xxhash64 replica (functions/xxhash64.py) and replays the codebooks as
    SQL literals."""
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, k, dsub))
    for j in range(m):
        Xs = X[:, j * dsub:(j + 1) * dsub]
        init_idx = rng.choice(len(Xs), size=min(k, len(Xs)), replace=False)
        C = Xs[np.sort(init_idx)].copy()
        if len(C) < k:  # degenerate tiny sample: repeat rows
            C = np.resize(C, (k, dsub))
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = Xs[mask].mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): each vector compressed to m small ints — the 100 TB
    memory story (m bytes/vector instead of d floats; a 768-dim float32
    corpus shrinks ~384x at m=8). Arrow-batched pandas UDF, vectorized
    over rows×centroids with an explicit LEFT-TO-RIGHT accumulation over
    the subspace dims: sequential IEEE double adds are what an ANSI SQL
    ``(x1-c1)^2 + ... + (xd-cd)^2`` chain evaluates, so the cross-engine
    oracle reproduces every distance (and hence every argmin code)
    bit-for-bit — numpy's pairwise ``.sum(axis=2)`` would drift in the
    last ulp for >8 dims."""
    books = np.asarray(codebooks)
    m, k, dsub = books.shape

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        Xm = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
        codes = np.zeros((len(Xm), m), dtype="int32")
        for j in range(m):
            Xs = Xm[:, j * dsub:(j + 1) * dsub]
            d2 = np.zeros((len(Xm), k))
            for t in range(dsub):
                d2 += (Xs[:, None, t] - books[j][None, :, t]) ** 2
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query builds an
    (m, k) distance table once on the driver; each row's approximate
    squared distance is m literal-array lookups summed — wholly JVM-side
    whole-stage codegen, NO Python in the scan, and the result is a
    TakeOrderedAndProject (per-partition heap, never a full sort).
    Returns (id, adc_dist) ascending. Approximate by design (like
    ivf_topk): recall is bounded by quantization error, the standard PQ
    trade."""
    books = np.asarray(codebooks)
    m, k, dsub = books.shape
    q = np.asarray(query_vec, dtype="float64")
    tables = [
        ((books[j] - q[j * dsub:(j + 1) * dsub][None, :]) ** 2).sum(axis=1)
        for j in range(m)
    ]
    dist = None
    for j in range(m):
        tab = F.array(*[F.lit(float(x)) for x in tables[j]])
        term = F.element_at(tab, F.col("codes").getItem(j) + 1)
        dist = term if dist is None else dist + term
    return (
        codes_df.select(F.col(id_col), F.round(dist, 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(topk)
    )


# ---------------------------------------------------------------------------
# scalar quantization (int8-style) ANN — NEW r12
# ---------------------------------------------------------------------------

def sq_train(
    df: DataFrame,
    vec_col: str = "embedding",
) -> list[tuple[float, float]]:
    """Scalar-quantizer bounds: per-dimension (min, max) over the corpus
    in ONE distributed aggregate — posexplode streams (dim, value) pairs
    but map-side partial aggregation collapses each partition to ≤dim
    rows before the shuffle, so the exchange is O(partitions·dim), never
    O(rows·dim). min/max of float32 values are exact (no accumulation),
    making the fit engine-independent — the SQ analogue of faiss's
    ScalarQuantizer train (QT_8bit with per-dim bounds)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    )
    by_pos = {r.pos: (float(r.lo), float(r.hi)) for r in rows}
    return [by_pos[i] for i in range(len(by_pos))]


def sq_scales(bounds: list[tuple[float, float]]) -> list[float]:
    """256/(max−min) per dimension (0.0 for constant dimensions — every
    value quantizes to code 0). Plain binary64 division, identical in any
    engine."""
    return [256.0 / (hi - lo) if hi > lo else 0.0 for lo, hi in bounds]


def sq_encode(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    vec_col: str = "embedding",
    out_col: str = "sq_code",
) -> DataFrame:
    """Quantize each component to an 8-bit code, entirely JVM-side:
    q_i = clamp(floor((x_i − min_i) · scale_i), 0, 255). The float32
    element promotes exactly to double, the subtraction/multiply are
    binary64, and floor/clamp are integer-exact — so any ANSI engine
    replaying the same expression over the same literals produces
    bit-identical codes (the PQ-oracle precedent). Codes ship as
    array<int> (Spark has no uint8 array); 64 dims → 64 ints per row,
    still 4× smaller than the float32 vector and integer-dot scorable."""
    mins = F.array(*[F.lit(float(lo)) for lo, _hi in bounds])
    scales = F.array(*[F.lit(s) for s in sq_scales(bounds)])
    diff = F.zip_with(F.col(vec_col), mins, lambda x, m: x - m)
    code = F.zip_with(
        diff, scales,
        lambda d, s: F.least(F.lit(255), F.greatest(
            F.lit(0).cast("long"), F.floor(d * s))).cast("int"))
    return df.withColumn(out_col, code)


def sq_quantize_query(
    qvec: list[float], bounds: list[tuple[float, float]]
) -> list[int]:
    """The query vector through the SAME quantizer, driver-side CPython —
    math.floor over binary64 matches F.floor/duckdb floor bit-for-bit."""
    import math

    scales = sq_scales(bounds)
    return [
        min(255, max(0, math.floor((float(x) - lo) * s)))
        for x, (lo, _hi), s in zip(qvec, bounds, scales)
    ]


def sq_topk(
    codes_df: DataFrame,
    query_codes: list[int],
    topk: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sq_code",
) -> DataFrame:
    """Symmetric-quantized top-k: rank by the INTEGER dot product of the
    8-bit codes (codes are non-negative, so the dot is a monotone cosine
    surrogate on normalized embeddings). Pure codegen — zip_with multiply
    + aggregate fold, no Python, no shuffle — then TakeOrdered. Every
    score is an exact ≤2^25 integer: hash-identical in any engine, no
    float tie ambiguity. Scale: one linear scan; at 100 TB the code
    column is the compact scan target (4× smaller reads than raw
    float32), the classic SQ memory/IO win."""
    qarr = F.array(*[F.lit(int(c)) for c in query_codes])
    prods = F.zip_with(F.col(code_col), qarr,
                       lambda a, b: (a * b).cast("long"))
    score = F.aggregate(prods, F.lit(0).cast("long"),
                        lambda acc, x: acc + x)
    return (
        codes_df.select(F.col(id_col), score.alias("sq_score"))
        .orderBy(F.col("sq_score").desc(), F.col(id_col).asc())
        .limit(topk)
    )
