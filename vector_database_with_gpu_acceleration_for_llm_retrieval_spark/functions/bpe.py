"""Byte-pair-encoding tokenizer: distributed training + encoding.

The real thing, not a proxy: BPE training (Sennrich et al. 2016 — the
public subword-tokenization algorithm GPT-2/RoBERTa descend from)
iterates "count adjacent symbol pairs → merge the most frequent" until
``n_merges`` rules exist.

Scale split (same pattern as the PQ/IVF codebook trainers: the
corpus-sized pass is distributed, the model-sized loop is not):

* the ONLY corpus-sized stage is the word-frequency aggregation — one
  explode + groupBy(word) shuffle; 100 TB of text reduces to a
  vocabulary-sized (word, freq) table (Heaps' law: ~10⁶ distinct words
  for web-scale corpora, ~10 MB);
* the merge loop then runs classically over that freq table on the
  driver — each round touches only words that still contain the pair,
  cost is vocab-bounded and independent of corpus size;
* encoding distributes again: an Arrow-batched pandas UDF applies the
  frozen merge ranks per word (greedy lowest-rank-first, exactly the
  published algorithm) — stateless, linear, no shuffle.

The driver loop is the honest choice at 100 TB: a fully-distributed
merge loop would run ``n_merges`` tiny shuffled jobs over the SAME
vocab-sized table (the corpus is never touched after the first agg) —
all overhead, no added capacity. If the vocab itself outgrew the
driver, cap it with ``min_freq``/``max_vocab`` (rare words below the
cut can't win a merge anyway, since merge frequency is bounded by word
frequency).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX

__all__ = ["word_freqs", "train_bpe", "bpe_segment_word", "bpe_encode"]

#: end-of-word marker (Sennrich's convention) — lets merges distinguish
#: "est" mid-word from "est" word-finally
EOW = "</w>"


def word_freqs(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """The one corpus-sized stage: (word, freq) via explode + groupBy.
    ``min_freq``/``max_vocab`` bound the table when the corpus is huge
    (deterministic cut: freq desc, word asc)."""
    wf = (
        docs.select(F.explode(TX.tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    if max_vocab is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab)
    return wf


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab: int | None = None,
) -> list[tuple[str, str]]:
    """Train BPE merge rules. Returns the ordered merge list
    ``[(left, right), ...]`` — rank = list position (lower merges
    first), the model artifact a tokenizer ships.

    Deterministic: pair counts tie-break lexicographically, so the
    same corpus always yields the same merges on any partitioning
    (the word-freq agg is exact, and the loop is sequential).
    """
    rows = word_freqs(docs, text_col, min_freq, max_vocab).collect()
    # word → symbol tuple (chars + EOW), weighted by corpus frequency
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(r["word"]) + (EOW,)
        vocab[key] = vocab.get(key, 0) + int(r["freq"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        pair, freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:  # nothing left worth merging
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with frozen merge ranks: repeatedly apply the
    lowest-rank applicable merge (the published greedy inference rule —
    identical output to replaying training merges in order)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed encoding against the frozen merges: Arrow-batched
    ``mapInPandas``, one ranks dict per task (tiny — it rides the task
    closure), per-word memoization within a batch. Returns
    ``(id, n_words, n_bpe_tokens, tokens: array<string>)`` — the
    subword stream a training pipeline feeds the packer with.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_type = dict(docs.dtypes)[id_col]
    schema = f"{id_col} {id_type}, n_words int, n_bpe_tokens int, tokens array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = bpe_segment_word(word, ranks)
            return got

        for pdf in batches:
            if pdf.empty:
                continue
            ids, nw, nt, toks = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                out: list[str] = []
                for w in words:
                    out.extend(enc(w))
                ids.append(rid)
                nw.append(len(words))
                nt.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": nt, "tokens": toks}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
