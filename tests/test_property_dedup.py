"""Property-based fuzz of the MinHash dedup family against a pure-Python
replay of the algorithm (same shingle/signature helpers, same banding
slices, same bucket-min pairing and survivor rules). The Spark plan was
restructured in round 6 (shared corpus state, single merged verify pass,
narrow caches) — these tests pin that every restructure is
result-preserving on arbitrary corpus/batch splits with dense near-dups.

The reference groups LSH buckets by the band's SLICE VALUES where Spark
buckets by F.hash(slice); a 32-bit hash collision merging two buckets
could differ — probability ~1e-9 per pair, accepted (a colliding example
would fail deterministically, not flake)."""

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_iceberg_spark.operators import dedup as D

NUM_HASHES, BANDS, SHINGLE_K, THRESHOLD = 16, 4, 3, 0.5

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10).map(" ".join)


def _fp(t: str) -> str:
    return hashlib.md5(re.sub(r"\s+", " ", t).strip().lower().encode()).hexdigest()


def _sig(t: str) -> tuple:
    a, b = D._hash_params(NUM_HASHES)
    au, bu = a.astype(np.uint64), b.astype(np.uint64)
    sh = D._shingle_hashes(t, SHINGLE_K)
    with np.errstate(over="ignore"):
        vals = au[None, :] * sh[:, None] + bu[None, :]
        return tuple((vals.min(axis=0) >> np.uint64(1)).astype(np.int64))


def _bands(sig: tuple):
    rpb = NUM_HASHES // BANDS
    return [(i, sig[i * rpb:(i + 1) * rpb]) for i in range(BANDS)]


def _jaccard_ok(x: str, y: str) -> bool:
    sa, sb = D._shingle_hashes(x, SHINGLE_K), D._shingle_hashes(y, SHINGLE_K)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    j = inter / union if union else 1.0
    # Spark's F.round is HALF_UP; Python round() is banker's
    return float(Decimal(j).quantize(Decimal("0.000001"),
                                     rounding=ROUND_HALF_UP)) >= THRESHOLD


def _collapse(rows):
    """min-id per fingerprint: (kept rows, fingerprint set)."""
    best: dict[str, tuple[int, str]] = {}
    for i, t in rows:
        f = _fp(t)
        if f not in best or i < best[f][0]:
            best[f] = (i, t)
    return sorted(best.values()), set(best)


def _bucket_min_pairs(rows):
    groups: dict[tuple, list[int]] = {}
    texts = dict(rows)
    for i, t in rows:
        for key in _bands(_sig(t)):
            groups.setdefault(key, []).append(i)
    pairs = set()
    for members in groups.values():
        lo = min(members)
        pairs.update((lo, m) for m in members if m != lo)
    return {(a, b) for a, b in pairs if _jaccard_ok(texts[a], texts[b])}


def _ref_minhash_dedup(rows):
    reps, _ = _collapse(rows)
    losers = {b for _, b in _bucket_min_pairs(reps)}
    return sorted(i for i, _ in reps if i not in losers)


def _ref_incremental(new_rows, corpus_rows):
    corpus_reps, seen = _collapse(corpus_rows)
    batch0 = [(i, t) for (i, t) in _collapse(new_rows)[0]
              if _fp(t) not in seen]
    texts = dict(batch0) | dict(corpus_reps)
    pairs = _bucket_min_pairs(batch0)
    batch_bands: dict[tuple, list[int]] = {}
    for i, t in batch0:
        for key in _bands(_sig(t)):
            batch_bands.setdefault(key, []).append(i)
    for ci, ct in corpus_reps:
        for key in _bands(_sig(ct)):
            for bi in batch_bands.get(key, ()):
                if _jaccard_ok(ct, texts[bi]):
                    pairs.add((ci, bi))
    losers = {b for _, b in pairs}
    return sorted(i for i, _ in batch0 if i not in losers)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc, min_size=1, max_size=12), data=st.data())
def test_minhash_dedup_matches_reference(spark, docs, data):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r.doc_id for r in D.minhash_dedup(
        df, num_hashes=NUM_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
        threshold=THRESHOLD).collect())
    assert got == _ref_minhash_dedup(rows)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_doc, min_size=2, max_size=12), data=st.data())
def test_incremental_minhash_matches_reference(spark, docs, data):
    cut = data.draw(st.integers(min_value=1, max_value=len(docs) - 1))
    corpus = [(i, t) for i, t in enumerate(docs[:cut])]
    batch = [(100 + i, t) for i, t in enumerate(docs[cut:])]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    got = sorted(r.doc_id for r in D.incremental_minhash_dedup(
        bdf, cdf, num_hashes=NUM_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
        threshold=THRESHOLD).collect())
    assert got == _ref_incremental(batch, corpus)


@pytest.mark.parametrize("n", [1])
def test_reference_replay_sanity(n):
    """The replay itself: exact dup collapses, near dup drops, unrelated
    survives — guards against a vacuous reference."""
    rows = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma zeta"), (3, "zeta zeta epsilon")]
    out = _ref_minhash_dedup(rows)
    assert 0 in out and 1 not in out and 3 in out


# ---------------------------------------------------------------------------
# ExactSubstr duplicated-span removal vs pure-Python replay
# ---------------------------------------------------------------------------

_SUB_L = 3


def _ref_substring_dedup(rows, L=_SUB_L, keep_first=True):
    toks = {i: [w for w in re.split(r"\s+", t.strip()) if w] for i, t in rows}
    occ = []  # (gram_text, doc, start) in global (doc, start) order
    for i in sorted(toks):
        tk = toks[i]
        for s in range(len(tk) - L + 1):
            occ.append((" ".join(tk[s:s + L]), i, s))
    by_gram: dict[str, list[tuple[int, int]]] = {}
    for g, i, s in occ:
        by_gram.setdefault(g, []).append((i, s))
    covered: dict[int, set] = {i: set() for i in toks}
    for g, locs in by_gram.items():
        if len(locs) < 2:
            continue
        locs = sorted(locs)
        drop = locs[1:] if keep_first else locs
        for i, s in drop:
            covered[i].update(range(s, s + L))
    out = {}
    for i, tk in toks.items():
        kept = [w for p, w in enumerate(tk) if p not in covered[i]]
        out[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(st.lists(st.sampled_from(_WORDS[:4]), min_size=0,
                              max_size=9).map(" ".join),
                     min_size=1, max_size=8),
       keep_first=st.booleans())
def test_exact_substring_dedup_matches_reference(spark, docs, keep_first):
    """Tiny alphabet + short docs force dense duplicated spans, overlapping
    windows, and within-doc repeats — the replay recomputes the kept text
    per position, so any covered-range or first-occurrence bug diverges."""
    from duckdb_iceberg_spark.operators.dedup import exact_substring_dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
           for r in exact_substring_dedup(
               df, min_len=_SUB_L, keep_first=keep_first).collect()}
    assert got == _ref_substring_dedup(rows, keep_first=keep_first)
