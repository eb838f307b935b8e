"""BPE trainer/encoder: hand-computed merges, determinism, and the
word-frequency-table formulation (training never touches raw text
twice)."""

from bertseyeview_spark.operators.bpe import (
    END_OF_WORD,
    bpe_tokenize,
    encode_word,
    learn_bpe,
    word_frequencies,
)


def test_learn_bpe_hand_example(spark):
    # classic toy corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    rows = [(0, " ".join(["low"] * 5 + ["lower"] * 2 +
                         ["newest"] * 6 + ["widest"] * 3))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = word_frequencies(docs, "text")
    merges = learn_bpe(wf, n_merges=4)
    # highest-count pair first: ('e','s') occurs 9x (newest+widest)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END_OF_WORD)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks)[-1] == "est" + END_OF_WORD


def test_tokenize_roundtrip_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "the lowest newest widest rates") for i in range(6)],
        "doc_id long, text string",
    )
    merges = learn_bpe(word_frequencies(docs, "text"), n_merges=12)
    merges2 = learn_bpe(word_frequencies(docs, "text"), n_merges=12)
    assert merges == merges2  # deterministic at any parallelism

    out = bpe_tokenize(docs, "doc_id", "text", merges).collect()
    assert len(out) == 6
    for r in out:
        # detokenize: concatenation restores the text + markers
        joined = "".join(r["tokens"]).replace(END_OF_WORD, " ").strip()
        assert joined == "the lowest newest widest rates"
        assert r["n_tokens"] == len(r["tokens"])
