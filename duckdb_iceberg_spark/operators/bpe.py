"""Byte-pair-encoding tokenizer prep (NEW r12): train a mini-BPE merge
table on a bounded deterministic corpus sample, apply it distributed to
count real subword tokens per document — the tokenizer-aware sibling of
the whitespace/regex token counters in :mod:`.text`.

Scale shape (the PQ-codebook precedent): the FIT runs driver-side on a
deterministic xxhash64-ordered sample (≤ ``sample_size`` docs — O(sample)
cost at any corpus size, stable across runs/executors); the APPLY is the
corpus-sized work and runs as an Arrow-batched pandas UDF (BPE's greedy
merge loop is inherently sequential per word — the textbook
python-unavoidable case), one linear pass, no shuffle until the caller
aggregates. Operator and oracle builder execute the SAME CPython
functions, so token counts are engine-exact integers.

Determinism contract (everything the cross-engine oracle relies on):
words = lowercased whitespace split; symbols = unicode characters with a
``</w>`` end-of-word marker; each round merges the pair with the highest
weighted count, ties broken by the lexicographically SMALLEST pair;
apply replays merges greedily by rank (lowest rank first, leftmost
occurrence first — the GPT-2 ``get_pairs``/min-rank loop)."""

from __future__ import annotations

from collections import Counter
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EOW = "</w>"


def _words(text: str) -> list[str]:
    return [w for w in (text or "").lower().split() if w]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_merges: int = 128,
    sample_size: int = 1024,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a deterministic sample.
    Returns the ordered merge list (rank = position)."""
    rows = (
        df.select(id_col, text_col)
        .where(F.col(text_col).isNotNull())
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(sample_size)
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        word_freq.update(_words(r[text_col]))
    return bpe_fit(word_freq, num_merges)


def bpe_fit(word_freq: "Counter[str]", num_merges: int) -> list[tuple[str, str]]:
    """The pure fit: shared verbatim by the oracle builder."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): c for w, c in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            res: list[str] = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            out[key] = out.get(key, 0) + c
        vocab = out
    return merges


def bpe_word_tokens(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under the merge table (greedy min-rank
    loop — the GPT-2 apply)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_count_tokens_py(text: str, ranks: dict) -> int:
    """Per-document token count — the exact function the pandas UDF and
    the oracle builder both run."""
    return sum(bpe_word_tokens(w, ranks) for w in _words(text))


def bpe_token_counts(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, …, bpe_tokens) — the distributed apply. NULL text counts 0
    tokens (a NULL-in/0-out column keeps downstream aggregates total).
    The merge table broadcasts inside the UDF closure (≤ a few KB)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.LongType())
    def _count(texts):
        return texts.map(lambda t: bpe_count_tokens_py(t, ranks),
                         na_action="ignore").fillna(0).astype("int64")

    return df.withColumn(out_col, _count(F.col(text_col)))
