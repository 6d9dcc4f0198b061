"""Real byte-pair encoding: driver-trained merges, distributed encode.

Upgrades the heuristic `text.token_count_bpe` regex with the actual
Sennrich BPE algorithm — the tokenizer family every LM pipeline counts
budget in:

- `train_bpe`: classic iterative pair-merge training over a word
  frequency table built from a BOUNDED deterministic sample (xxhash64
  row order, same driver-safety pattern as the k-means centroids —
  training reads at most `sample_n` docs no matter the corpus size; the
  word-frequency dict the algorithm actually iterates is smaller still).
  Training is CPU-trivial next to a corpus pass; what must scale is
  ENCODING, which is the distributed part.
- `encode_udf`: the learned merge ranks broadcast via closure into an
  Arrow-batched pandas UDF that applies merges greedily by rank
  (identical to the reference BPE encode loop), emitting per-doc token
  counts or token arrays. Map-only.

Determinism: the sample is hash-ordered, ties in pair frequency break
lexicographically, so the same corpus always yields the same vocab —
reproducibility RNG-seeded trainers can't give across cluster sizes.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str, sample_n: int) -> Counter:
    rows = (
        df.select(F.col(text_col).alias("t"))
        .withColumn("__h", F.xxhash64("t"))
        .orderBy("__h")
        .limit(sample_n)
        .collect()
    )
    freqs: Counter = Counter()
    for r in rows:
        for w in (r["t"] or "").lower().split():
            freqs[w] += 1
    return freqs


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    sample_n: int = 4096,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges (Sennrich et al. 2016 algorithm 1)
    from a bounded deterministic corpus sample. Returns the ordered merge
    list — rank == position."""
    freqs = _word_freqs(df, text_col, sample_n)
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): c for w, c in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # deterministic: max count, ties broken lexicographically
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge loop — the standard BPE encoder."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_udf(merges: list[tuple[str, str]], output: str = "count"):
    """Arrow-batched encoder over the learned merges.

    output='count'  -> pandas_udf long        (per-doc BPE token count)
    output='tokens' -> pandas_udf array<string> (the tokens themselves)
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    from pyspark.sql.functions import pandas_udf

    if output == "count":

        @pandas_udf("long")
        def count_tokens(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: sum(
                    len(encode_word(w, ranks)) for w in (t or "").lower().split()
                )
            )

        return count_tokens

    @pandas_udf("array<string>")
    def tokens(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: [
                tok
                for w in (t or "").lower().split()
                for tok in encode_word(w, ranks)
            ]
        )

    return tokens
