"""Connected components + transitive duplicate clustering.

The star-algorithm result is checked against a plain union-find replay on
the driver for every graph, including shapes that force multiple
alternating rounds (long paths) — the LSH graphs the operator usually
sees are already star-like and converge immediately, so the paths are the
real algorithmic exercise.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_iceberg_spark.operators.dedup import (
    connected_components,
    duplicate_components,
)


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label every node by its component MIN
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    expected = _union_find(edges, nodes)
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long")
    # both execution paths must agree with the replay: the r15 small-graph
    # gate (driver union-find under the broadcast-class threshold) and the
    # distributed star rounds (local_edge_threshold=0 disables the gate)
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expected
    got_dist = {
        r["node"]: r["component"]
        for r in connected_components(df, local_edge_threshold=0).collect()
    }
    assert got_dist == expected


def test_path_graph_forces_rounds(spark):
    # a 40-node path has diameter 39: naive min-propagation needs ~39
    # rounds, the alternating algorithm collapses it in O(log^2 n)
    _check(spark, [(i, i + 1) for i in range(1, 40)])


def test_two_components_and_duplicate_edges(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (2, 1), (10, 11), (11, 12)])


def test_star_input_is_fixpoint(spark):
    _check(spark, [(1, k) for k in range(2, 20)])


def test_reversed_and_mixed_orientation(spark):
    _check(spark, [(5, 1), (1, 9), (9, 2), (7, 3), (3, 8)])


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_convergence_guard(spark):
    # local_edge_threshold=0: the guard lives in the distributed star
    # loop; under the default gate this graph would be solved driver-side
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_rounds=1, local_edge_threshold=0)


def test_gate_boundary_forces_distributed(spark):
    """A graph one edge OVER the gate takes the star path and still
    matches the replay (r15: the take(N+1) probe must fall through)."""
    edges = [(i, i + 1) for i in range(1, 12)]
    nodes = sorted({x for e in edges for x in e})
    expected = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, local_edge_threshold=len(edges) - 1).collect()
    }
    assert got == expected


def test_over_gate_path_leaves_no_new_persisted_edges(spark):
    """The over-the-gate (distributed star) path must unpersist the probe's
    cached canonical edge frame once the first checkpoint materializes
    (r16, VERDICT r15 task 6): a long-lived session was otherwise left
    holding one cached edge set per call. localCheckpoint blocks are NOT
    counted — the returned frame reads from the final one by design; the
    leak class is `.persist()`ed frames, visible via getPersistentRDDs."""
    def persisted_non_checkpoint_count():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        n = 0
        it = jmap.entrySet().iterator()
        while it.hasNext():
            name = str(it.next().getValue().toString())
            if "LocalCheckpoint" not in name and "Checkpoint" not in name:
                n += 1
        return n

    spark.catalog.clearCache()
    edges = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    before = persisted_non_checkpoint_count()
    # one edge over the gate: the probe persists canon, then falls through
    # to the star rounds — canon must be dropped before returning
    rows = connected_components(
        df, local_edge_threshold=len(edges) - 1).collect()
    assert rows  # the result itself is checked by the gate-boundary test
    assert persisted_non_checkpoint_count() == before


def test_duplicate_components_transitive(spark):
    # A~B and B~C are near-dups but A and C differ more than the
    # threshold allows: pairwise dedup keeps {A, C}; components must
    # still place all three in ONE cluster (transitive closure).
    base = "the quick brown fox jumps over the lazy dog " * 6
    a = base + "alpha alpha alpha"
    b = base + "alpha alpha"
    c = base
    docs = spark.createDataFrame(
        [
            (1, a), (2, b), (3, c),
            (4, a),                      # exact dup of 1
            (10, "something entirely different and unrelated text here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["component_id"]
        for r in duplicate_components(
            docs, num_hashes=32, bands=8, threshold=0.7).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10}
    spark.catalog.clearCache()


def test_keep_best_per_cluster(spark):
    """r13 keep-best curation: one winner per cluster by max score (tie:
    min id), cluster_size carried, singletons keep themselves."""
    from duckdb_iceberg_spark.operators.dedup import keep_best_per_cluster

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [
            (1, base + "alpha alpha alpha", 50),
            (2, base + "alpha alpha", 80),        # best of cluster {1,2,3,4}
            (3, base, 80),                        # ties 2 → larger id loses
            (4, base + "alpha alpha alpha", 10),  # exact dup of 1
            (10, "something entirely different and unrelated here", 5),
        ],
        "doc_id long, text string, score long",
    )
    kept = {r.doc_id: r for r in keep_best_per_cluster(
        docs, "score", num_hashes=32, bands=8).collect()}
    assert set(kept) == {2, 10}
    assert kept[2].cluster_size == 4 and kept[2].component_id == 1
    assert kept[10].cluster_size == 1 and kept[10].component_id == 10
    spark.catalog.clearCache()


def test_connected_components_random_graphs_fuzz(spark):
    """Property fuzz: random graphs (dense, sparse, multi-component,
    self-loopy) against the union-find replay. Deterministic seeds — a
    failure reproduces."""
    import random

    for seed in range(8):
        rng = random.Random(seed)
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [(rng.randint(1, n), rng.randint(1, n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]] or [(1, 2)]
        _check(spark, edges)


def test_null_text_docs_keep_their_rows(spark):
    """NULL-text docs must not vanish from the output (r11 review): they
    fingerprint to one exact group (SQL GROUP BY semantics — the
    recursive-CTE oracle groups NULL fingerprints together too)."""
    from duckdb_iceberg_spark.operators.dedup import duplicate_components

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, None),
         (4, "alpha beta gamma")],
        "doc_id long, text string")
    out = {r.doc_id: r.component_id
           for r in duplicate_components(df, num_hashes=8, bands=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == 1 and out[4] == 1      # exact dups collapse
    assert out[2] == 2 and out[3] == 2      # NULL texts form one group
