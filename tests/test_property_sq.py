"""Property fuzzing for r12 scalar quantization: random float32 vectors
(incl. constant dims, negatives, extremes) — the JVM zip_with codes must
equal the CPython replica bit-for-bit, and top-k must rank by the exact
integer dot with deterministic ties."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _corpus(draw):
    dim = draw(st.integers(2, 6))
    n = draw(st.integers(2, 8))
    vals = st.one_of(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  width=32),
        st.sampled_from([0.0, 1.0, -1.0, 99.5]))
    vecs = [
        (i, [draw(vals) for _ in range(dim)]) for i in range(n)
    ]
    return vecs


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(_corpus())
def test_sq_codes_match_python_replica(spark, vecs):
    from duckdb_iceberg_spark.operators.similarity import (
        sq_encode,
        sq_quantize_query,
        sq_scales,
        sq_topk,
        sq_train,
    )

    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<float>")
    bounds = sq_train(df)
    scales = sq_scales(bounds)
    codes = {r.vec_id: list(r.sq_code)
             for r in sq_encode(df, bounds).collect()}
    # float32 storage: replicate Spark's float->double promotion by
    # round-tripping through float32 first
    import struct

    def f32(x):
        return struct.unpack("<f", struct.pack("<f", x))[0]

    for vid, v in vecs:
        expect = [
            min(255, max(0, math.floor((f32(x) - lo) * s)))
            for x, (lo, _hi), s in zip(v, bounds, scales)]
        assert codes[vid] == expect, (vid, v, bounds)

    q = sq_quantize_query([f32(x) for x in vecs[0][1]], bounds)
    got = [r.vec_id for r in sq_topk(sq_encode(df, bounds), q,
                                     topk=len(vecs)).collect()]
    dots = {vid: sum(a * b for a, b in zip(codes[vid], q))
            for vid, _ in vecs}
    want = sorted(dots, key=lambda v: (-dots[v], v))
    assert got == want
