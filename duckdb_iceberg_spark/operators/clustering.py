"""Embedding clustering + semantic dedup for training-data pipelines.

- kmeans: spherical k-means (cosine geometry — unit-normalized vectors,
  assignment by max dot product) with deterministic hash-sampled init.
  Each Lloyd iteration is one Spark job: Arrow-batched matmul assignment
  on executors, element-wise centroid means via posexplode + groupBy,
  and a bounded k×dim collect of the new centroids to the driver (the
  only driver state; 1024 × 1536 float64 ≈ 12 MB worst case).
- semantic_dedup: SemDeDup (Abbas et al. 2023) — cluster the corpus,
  then drop every vector whose cosine similarity to a LOWER-id member
  of the SAME cluster exceeds the threshold. The cluster partitioning
  bounds the quadratic pair work to within-cluster; each cluster is one
  Arrow group (applyInPandas) doing a single gram-matrix matmul.

Scale: nothing row-shaped reaches the driver except the k centroids;
assignment/pair work is embarrassingly parallel over partitions/groups.
Cluster sizes concentrate around N/k — pick k ≈ sqrt(N) (the IVF rule,
:func:`..similarity.ivf_centroids_for`) so within-cluster pair work
stays ~N total.

Determinism (r9): every reduction the fit depends on is now
order-independent, so the whole pipeline is replayable driver-side and
cross-engine checkable (the last rows-only operators gained real
oracles):

- assignment accumulates dot(raw row, centroid) LEFT-TO-RIGHT over dims
  (the IVF/PQ trick — row norms are positive per-row constants, so the
  argmax equals the unit-row cosine argmax; sequential IEEE adds are
  what any replayer evaluates, where a BLAS matmul would drift in the
  last ulp depending on batch shape);
- centroid updates sum fixed-point micro-units (round6(x·1e6) as LONG)
  — exact integer addition in ANY order, so the distributed partial
  aggregation is bit-reproducible. The 1e-6 quantization is noise for
  clustering (components are O(1)); headroom: 1e6-scale longs overflow
  at ~9e12 rows per (cluster, dim) cell — beyond that switch the sum to
  DECIMAL(38,6), same exactness, more shuffle bytes.

Residual accepted risk, documented: Spark's round(double) goes through
BigDecimal.valueOf (shortest-repr) while the replayer quantizes the
exact binary value — they can disagree only when a product's shortest
repr reads exactly ".5" but its binary value is epsilon below, a
~1e-16-measure event; and semantic_dedup's within-cluster gram matrix
is a BLAS matmul whose last-ulp layout sensitivity only matters if a
pair's cosine sits within ~1e-12 of the threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .similarity import ivf_centroids_for


def _unit_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _assign_rows(m: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmax_j dot(row_i, C_j) with a LEFT-TO-RIGHT accumulation over
    dims (batch-shape-invariant, ties to the lowest j — np.argmax takes
    the first maximum). Raw rows: the row norm is a positive per-row
    constant, so this argmax equals the unit-row cosine argmax against
    unit centroids. Shared by the executor UDF and the oracle builder's
    driver replay — identical IEEE op order is what makes the replay
    bit-exact."""
    d = np.zeros((len(m), C.shape[0]))
    for t in range(m.shape[1]):
        d += m[:, None, t] * C[None, :, t]
    return d.argmax(axis=1).astype("int32")


def _assign_column(centroids: np.ndarray, vec_col):
    """cluster_id Column: one Arrow batch at a time against the
    closure-shipped (k, dim) matrix via :func:`_assign_rows`."""
    C = np.ascontiguousarray(centroids, dtype="float64")

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype="int32"))
        m = np.asarray([np.asarray(v, dtype="float64") for v in vecs])
        return pd.Series(_assign_rows(m, C))

    return assign(vec_col)


_MICRO = 1000000.0


def micro6(x: float) -> int:
    """round-half-up(x * 1e6) as int — the driver replica of Spark's
    ``F.round(col * 1e6).cast("long")``. Spark's round goes through
    BigDecimal.valueOf = Double.toString (shortest round-trip repr) then
    setScale(0, HALF_UP); Python's repr() is the same shortest-repr
    algorithm class, so Decimal(repr(d)) + quantize(HALF_UP) mirrors it
    (Python round() is banker's and would not)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x * _MICRO)).quantize(Decimal(1),
                                                  ROUND_HALF_UP))


def kmeans_replica(
    rows: list[tuple], n_clusters: int, iters: int = 4, seed: int = 42
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side bit-replay of :func:`kmeans` for the cross-engine
    oracle builder: same hash-sampled init (pure-Python xxhash64
    replica), same left-to-right assignment (:func:`_assign_rows`), same
    micro-unit integer centroid sums (:func:`micro6` — order-independent,
    so the driver loop reproduces the distributed partial aggregation
    exactly). Returns (ids, final cluster ids, final centroids) with ids
    in the caller's row order."""
    from ..functions.xxhash64 import spark_xxhash64_long_intlit

    ordered = sorted(rows, key=lambda r: spark_xxhash64_long_intlit(
        int(r[0]), seed))
    centroids = _unit_rows(np.asarray(
        [list(r[1]) for r in ordered[:n_clusters]], dtype="float64"))
    k, dim = centroids.shape
    ids = np.asarray([int(r[0]) for r in rows], dtype="int64")
    M = np.asarray([list(r[1]) for r in rows], dtype="float64")

    for _ in range(iters):
        a = _assign_rows(M, centroids)
        acc = np.zeros((k, dim))
        seen = np.zeros(k, dtype=bool)
        sums: dict[tuple[int, int], int] = {}
        for i in range(len(M)):
            c = int(a[i])
            seen[c] = True
            for t in range(dim):
                key = (c, t)
                sums[key] = sums.get(key, 0) + micro6(float(M[i, t]))
        for (c, t), s in sums.items():
            acc[c, t] = s / _MICRO
        new = centroids.copy()
        if seen.any():
            new[seen] = _unit_rows(acc[seen])
        centroids = new

    return ids, _assign_rows(M, centroids), centroids


def kmeans(
    df: DataFrame,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 4,
    seed: int = 42,
    approx_count: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Spherical k-means. Returns (df + ``cluster_id`` column, centroids
    ndarray (k, dim)). ``n_clusters=None`` derives sqrt(N) from
    ``approx_count`` or one count() job (same sizing rule as IVF).

    Init is a deterministic hash-sample of the corpus (seeded xxhash64
    order — no RNG state, rerun-stable); each of the ``iters`` Lloyd
    rounds runs assignment + element-wise mean + renormalize. Empty
    clusters keep their previous centroid."""
    if n_clusters is None:
        n_clusters = ivf_centroids_for(
            approx_count if approx_count is not None else df.count())
    cand = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(n_clusters)
        .collect()
    )
    centroids = _unit_rows(np.asarray(
        [list(r[vec_col]) for r in cand], dtype="float64"))
    k, dim = centroids.shape

    for _ in range(iters):
        assigned = df.select(
            _assign_column(centroids, F.col(vec_col)).alias("cluster_id"),
            F.col(vec_col).alias("__v"),
        )
        # fixed-point micro-unit sums: exact integer addition in any
        # partition order, so the update is bit-reproducible (and
        # replayable by the oracle builder); the centroid only needs the
        # sum DIRECTION — normalization cancels the /count of the mean
        sums = (
            assigned.select("cluster_id",
                            F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum(
                F.round(F.col("x").cast("double") * F.lit(_MICRO))
                .cast("long")).alias("s"))
            .collect()
        )
        new = centroids.copy()
        acc = np.zeros((k, dim))
        seen = np.zeros(k, dtype=bool)
        for r in sums:
            acc[r["cluster_id"], r["pos"]] = r["s"] / _MICRO
            seen[r["cluster_id"]] = True
        if seen.any():
            new[seen] = _unit_rows(acc[seen])
        centroids = new

    out = df.withColumn(
        "cluster_id", _assign_column(centroids, F.col(vec_col)))
    return out, centroids


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 4,
    seed: int = 42,
    approx_count: int | None = None,
) -> DataFrame:
    """SemDeDup: cluster, then within each cluster drop every vector
    whose cosine to a lower-id member exceeds ``threshold`` (keep-min-id
    — the same survivor rule as the text dedup family). Returns the
    surviving rows of ``df``.

    Each cluster is one Arrow group: sort members by id, one gram
    matrix, mask the upper triangle — a vector is dropped if any
    EARLIER SURVIVOR exceeds the threshold (greedy in id order, so the
    kept set is independent of partitioning)."""
    clustered, _ = kmeans(df, n_clusters, vec_col, id_col, iters, seed,
                          approx_count)

    # output id type follows the input column (ADVICE r5: a string id with
    # a hardcoded LongType would mismatch the declared Arrow group schema)
    schema = T.StructType([T.StructField(id_col, df.schema[id_col].dataType)])

    def drop_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        m = _unit_rows(np.asarray(
            [np.asarray(v, dtype="float64") for v in pdf[vec_col]]))
        sims = m @ m.T
        kept: list[int] = []
        kept_idx: list[int] = []
        for i in range(len(ids)):
            if not kept_idx or sims[i, kept_idx].max() < threshold:
                kept.append(ids[i])
                kept_idx.append(i)
        return pd.DataFrame({id_col: kept})

    keep = clustered.select("cluster_id", id_col, vec_col) \
        .groupBy("cluster_id").applyInPandas(drop_group, schema)
    return df.join(keep, id_col, "left_semi")


def semantic_dedup_replica(
    rows: list[tuple], threshold: float, n_clusters: int,
    iters: int = 4, seed: int = 42,
) -> list[int]:
    """Driver-side replay of :func:`semantic_dedup` for the oracle
    builder: :func:`kmeans_replica` assignments, then the same greedy
    within-cluster drop (sorted by id, one gram matrix per cluster —
    the same matrix the Arrow group sees, so the BLAS product matches;
    see the module docstring for the accepted threshold-adjacency
    caveat). Returns surviving ids sorted ascending."""
    ids, assign, _ = kmeans_replica(rows, n_clusters, iters, seed)
    by_vec = {int(r[0]): np.asarray(list(r[1]), dtype="float64")
              for r in rows}
    survivors: list[int] = []
    for c in sorted(set(int(x) for x in assign)):
        members = sorted(int(ids[i]) for i in range(len(ids))
                         if int(assign[i]) == c)
        m = _unit_rows(np.asarray([by_vec[i] for i in members]))
        sims = m @ m.T
        kept_idx: list[int] = []
        for i in range(len(members)):
            if not kept_idx or sims[i, kept_idx].max() < threshold:
                survivors.append(members[i])
                kept_idx.append(i)
    return sorted(survivors)
