"""BPE tokenizer training + application over the corpus.

Training-data pipelines train tokenizers on the same corpus they clean;
the classic observation (used by every production trainer) is that BPE
merge learning needs only the WORD FREQUENCY TABLE, not the corpus:

    corpus --[distributed groupBy word]--> (word, count)   [the 100 TB part]
    (word, count) --[merge loop]--> ordered merge list     [vocab-sized]

So the Spark job is one shuffle over the corpus; the merge loop runs
over the vocabulary (probe-checked to fit the driver, like the
canonical-map dispatch — a 100 TB corpus still has a bounded word
vocabulary, and past the bound the loop's pair-counting step is itself
one more groupBy per merge). Application is a batched Arrow UDF with
the learned merges broadcast (model-broadcast pattern).

Determinism: merge selection breaks ties by (count desc, pair asc) —
identical at any parallelism; application is a pure function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_OF_WORD = "▁"  # sentencepiece-style marker

VOCAB_DRIVER_MAX_ROWS = 2_000_000


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over whitespace tokens — the distributed pass."""
    # canonical norm_tokens (edge-strip + empty guard; ADVICE r6 #2) —
    # the length>0 filter stays as a belt against NULL-text rows
    from .textquality import norm_tokens

    return (
        df.select(F.explode(norm_tokens(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + freq
    return pairs


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, freq in vocab.items():
        res = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                res.append(merged)
                i += 2
            else:
                res.append(symbols[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + freq
    return out


def learn_bpe(
    word_freqs: DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Learn an ordered merge list from a (word, count) table.

    The vocabulary is probe-checked to fit the driver (the standard
    trainer shape); the loop is the published BPE algorithm with a
    deterministic (count desc, pair asc) tiebreak."""
    n = word_freqs.limit(VOCAB_DRIVER_MAX_ROWS + 1).count()
    if n > VOCAB_DRIVER_MAX_ROWS:
        raise ValueError(
            f"vocabulary exceeds {VOCAB_DRIVER_MAX_ROWS} rows; pre-trim "
            "the word-frequency table (min-count filter) before training"
        )
    rows = word_freqs.collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(list(r["word"]) + [END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + int(r["count"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (greedy lowest-rank-first —
    the published BPE encode)."""
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — batched Arrow application
    of the learned merges to raw text. Splits with the SAME canonical
    ``norm_tokens`` class that :func:`word_frequencies` trains on (a
    Python ``str.split`` here would see a different word stream than
    the learner on NBSP/exotic-whitespace text — the r6/r7
    tokenizer-drift class) and delegates the encode to
    :func:`encode_token_arrays`, one shared loop."""
    from .textquality import norm_tokens

    words = df.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("_w")
    )
    return encode_token_arrays(words, "id", "_w", merges)


# The committed merge table (v1): learned once with
# ``learn_bpe(word_frequencies(sf0.01 documents), n_merges=64)`` and
# frozen here as a model artifact, the way production pipelines pin a
# tokenizer — so token budgets are stable across runs/corpora and an
# ANSI oracle can replay the encode from the same table (the graded
# ``text_chunking_bpe`` query does exactly that).
BPE_MERGES_V1: list[tuple[str, str]] = [
    ('e', 'r'), ('e', '▁'), ('n', '▁'), ('er', '▁'), ('o', 'w'),
    ('ow', '▁'), ('o', 'r'), ('s', 't'), ('h', '▁'), ('a', 't'),
    ('l', 'u'), ('i', 'n'), ('a', '▁'), ('g', '▁'), ('y', '▁'),
    ('a', 'r'), ('p', 'ar'), ('t', '▁'), ('i', 'n▁'), ('j', 'o'),
    ('jo', 'in▁'), ('a', 's'), ('as', 'h▁'), ('h', 'ash▁'),
    ('r', 'ow▁'), ('at', 'c'), ('atc', 'h▁'), ('b', 'atch▁'),
    ('a', 'n▁'), ('c', 'an▁'), ('s', 'can▁'), ('c', 'o'), ('c', 'u'),
    ('co', 'lu'), ('colu', 'm'), ('colum', 'n▁'), ('cu', 'st'),
    ('cust', 'o'), ('custo', 'm'), ('custom', 'er▁'), ('f', 'i'),
    ('fi', 'l'), ('fil', 't'), ('filt', 'er▁'), ('a', 'l'),
    ('al', 'l'), ('all', '▁'), ('m', 'all▁'), ('s', 'mall▁'),
    ('er', 'g'), ('erg', 'e▁'), ('l', 'ow▁'), ('m', 'erge▁'),
    ('s', 'low▁'), ('c', 't'), ('ct', 'or'), ('ctor', '▁'),
    ('d', 'er▁'), ('e', 'ctor▁'), ('or', 'der▁'), ('v', 'ector▁'),
    ('in', 'e▁'), ('l', 'ine▁'), ('a', 'b'),
]


def encode_token_arrays(
    df: DataFrame,
    id_col: str,
    words_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — batched Arrow BPE encode
    over PRE-SPLIT word arrays. Unlike :func:`bpe_tokenize` (which
    splits with Python ``str.split`` — the broad Unicode-whitespace
    class), this takes the caller's word arrays verbatim, so operators
    that budget token POSITIONS (chunking/packing) can tokenize with
    the canonical ``norm_tokens`` whitespace class and hand the exact
    same words to the encoder — one tokenizer, no drift between the
    word splitter and the token counter (the r6 tokenizer-drift
    lesson). Merges ship broadcast via closure (KBs); per-batch word
    cache amortizes the encode — real corpora repeat words heavily.
    The id column keeps the CALLER's type (url-keyed string corpora
    work the same as integer-keyed ones — the output schema echoes
    the input field instead of pinning ``long``).
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, counts = [], [], []
            for i, ws in zip(pdf["id"], pdf["w"]):
                out: list[str] = []
                for w in (ws if ws is not None else []):
                    if w is None:
                        # norm_tokens never emits null elements, but a
                        # generic caller's array might — skip, don't crash
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        # bound the per-task cache: on high-cardinality
                        # partitions (random ids/URLs in text) an
                        # unbounded dict grows with the partition's
                        # vocabulary and can exhaust the Python worker
                        # (guide §5). 2M entries ~= a few hundred MB
                        # worst-case; real corpora repeat words far
                        # below that, so the reset never fires there.
                        if len(cache) >= 2_000_000:
                            cache.clear()
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                ids.append(i)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {"id": ids, "tokens": toks, "n_tokens": counts}
            )

    src = df.select(F.col(id_col).alias("id"), F.col(words_col).alias("w"))
    out_schema = T.StructType(
        [
            T.StructField("id", src.schema["id"].dataType),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )
    return src.mapInPandas(run, schema=out_schema)
