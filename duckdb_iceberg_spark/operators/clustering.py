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
stays ~N total. Float reductions across partitions are not bit-ordered,
so assignments of near-boundary vectors may differ across runs —
inherent to distributed k-means, documented; dedup decisions at sane
thresholds (>= 0.9) are far from boundaries.

These are iterative algorithms with data-dependent float reductions —
genuinely non-SQL-expressible, so their driver queries are rows-only
(no DuckDB oracle), pinned by unit tests on separable fixtures instead.
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


def _assign_column(centroids: np.ndarray, vec_col):
    """cluster_id Column: argmax dot(unit(v), centroid_j) — one matmul
    per Arrow batch against the closure-shipped (k, dim) matrix."""
    C = np.ascontiguousarray(centroids, dtype="float64")

    @pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype="int32"))
        m = _unit_rows(np.asarray(
            [np.asarray(v, dtype="float64") for v in vecs]))
        return pd.Series((m @ C.T).argmax(axis=1).astype("int32"))

    return assign(vec_col)


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
        sums = (
            assigned.select("cluster_id",
                            F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        new = centroids.copy()
        acc = np.zeros((k, dim))
        seen = np.zeros(k, dtype=bool)
        for r in sums:
            acc[r["cluster_id"], r["pos"]] = r["s"]
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
