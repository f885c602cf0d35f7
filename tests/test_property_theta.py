"""Property tests for the r13 theta-sketch module: estimate accuracy,
union algebra, serialization roundtrips, and the distributed-build
equivalence — over randomized inputs (deterministic hypothesis
profiles, like the suite's other property files)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark.metadata import theta


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=3000),
       st.integers(min_value=8, max_value=256))
def test_exact_mode_is_exact_below_k(n, k):
    vals = [f"v{i}" for i in range(n)]
    sk = theta.ThetaSketch(theta.value_hashes(vals), k=k)
    if n <= k:
        assert not sk.is_estimation and sk.estimate() == n
    rt = theta.ThetaSketch.deserialize(sk.serialize(), k=k)
    assert rt.estimate() == sk.estimate() and rt.theta == sk.theta
    assert np.array_equal(rt.hashes, sk.hashes)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=5_000, max_value=40_000),
       st.sampled_from([256, 1024, 4096]))
def test_estimation_error_bounded(n, k):
    """KMV relative error concentrates around 1/sqrt(k); 8 sigma is a
    practically-never-flakes bound that still catches real math bugs."""
    vals = [f"user-{n}-{i}" for i in range(n)]
    sk = theta.ThetaSketch(theta.value_hashes(vals), k=k)
    rel = abs(sk.estimate() - n) / n
    assert rel < 8.0 / (k ** 0.5), (n, k, sk.estimate())


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=5_000),
       st.integers(min_value=0, max_value=5_000),
       st.integers(min_value=0, max_value=2_000))
def test_union_commutes_and_absorbs_duplicates(na, nb, overlap):
    a = [f"a{i}" for i in range(na)]
    b = [f"b{i}" for i in range(nb)] + a[:overlap]
    k = 512
    sa = theta.ThetaSketch(theta.value_hashes(a), k=k)
    sb = theta.ThetaSketch(theta.value_hashes(b), k=k)
    u1 = theta.ThetaSketch.union([sa, sb], k=k)
    u2 = theta.ThetaSketch.union([sb, sa], k=k)
    assert u1.theta == u2.theta
    assert np.array_equal(u1.hashes, u2.hashes)
    # idempotence
    again = theta.ThetaSketch.union([u1, u1], k=k)
    assert again.estimate() == u1.estimate()
    # true distinct count, when everything is exact
    true_n = len(set(a) | set(b))
    if not u1.is_estimation:
        assert u1.estimate() == true_n


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=20_000),
       st.integers(min_value=1, max_value=9),
       st.sampled_from([64, 512, 4096]))
def test_distributed_equals_single(n, parts, k):
    vals = [f"x{i}" for i in range(n)]
    single = theta.ThetaSketch(theta.value_hashes(vals), k=k)
    cands = [theta.partition_candidates(vals[i::parts], k)
             for i in range(parts)]
    merged = theta.ThetaSketch(theta.merge_candidates(cands, k), k=k)
    assert merged.theta == single.theta
    assert np.array_equal(merged.hashes, single.hashes)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(
    st.text(max_size=20), st.integers(min_value=-2**62, max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False), st.booleans(),
    st.binary(max_size=16)), max_size=200))
def test_value_hashes_total_and_in_domain(vals):
    h = theta.value_hashes(vals)
    assert len(h) == len(vals)
    assert (h >= 1).all() and (h < np.uint64(1) << np.uint64(63)).all()
