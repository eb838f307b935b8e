"""Dedup + similarity operators vs independent pure-python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bertseyeview_spark.operators import dedup as D
from bertseyeview_spark.operators import similarity as SIM
from bertseyeview_spark.operators.textquality import rolling_fingerprint
from bertseyeview_spark.operators import textquality as TQ


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " extra"),                        # near dup of 0
        (3, "completely different words about spark shuffles and joins here"),
        (4, "another unrelated document regarding window functions and state"),
        (5, base.replace("quick", "slow")),          # near dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark, docs):
    out = {r["rep_id"]: r["n_dups"] for r in D.exact_dedup(docs, "doc_id", "text").collect()}
    assert out[0] == 2  # docs 0 and 1
    assert sum(out.values()) == 6
    assert 1 not in out  # min-id is the representative


def test_exact_substring_spans_planted(spark):
    """Planted cross-document and within-document repeated token runs
    come back as maximal merged spans with exact 0-based positions;
    unique windows and sub-window-length docs produce nothing."""
    rows = [
        # docs 0 and 1 share the 8-token run "a b c d e f g h"
        (0, "a b c d e f g h i j"),
        (1, "p q a b c d e f g h r s"),
        # doc 2 repeats "m n o p" at token offsets 0 and 7 (within-doc)
        (2, "m n o p z y x m n o p"),
        (3, "u v w"),  # shorter than the window -> no rows
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id"], r["span_start"]): (
            r["span_end"], r["n_tokens"], r["n_windows"]
        )
        for r in D.exact_substring_spans(
            df, "doc_id", "text", window=4, min_count=2
        ).collect()
    }
    assert got == {
        # shared run: window starts 0..4 (doc 0) / 2..6 (doc 1) merge
        (0, 0): (7, 8, 5),
        (1, 2): (9, 8, 5),
        # within-doc repeat: two disjoint spans, one window each
        (2, 0): (3, 4, 1),
        (2, 7): (10, 4, 1),
    }

    # raising min_count above the occurrence count silences everything
    assert (
        D.exact_substring_spans(
            df, "doc_id", "text", window=4, min_count=3
        ).count()
        == 0
    )


def test_cut_repeated_spans_planted(spark):
    """Removal stage: per repeated fingerprint the minimal (id, start)
    occurrence survives; every other occurrence is cut; canonical
    windows are protected from overlapping cuts; untouched and
    sub-window docs pass through with 0 cut."""
    rows = [
        (0, "a b c d e f g h i j"),      # canonical home of the run
        (1, "p q a b c d e f g h r s"),  # cross-doc copy -> cut
        (2, "m n o p z y x m n o p"),    # within-doc repeat -> 2nd cut
        (3, "u v w"),                    # shorter than window
        (4, "only unique words appear in this document here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_cut"])
        for r in D.cut_repeated_spans(
            df, "doc_id", "text", window=4, min_count=2
        ).collect()
    }
    assert got == {
        0: ("a b c d e f g h i j", 10, 0),      # canonical survives whole
        1: ("p q r s", 12, 8),                  # copied run removed
        2: ("m n o p z y x", 11, 4),            # second occurrence removed
        3: ("u v w", 3, 0),
        4: ("only unique words appear in this document here", 8, 0),
    }


def test_exact_substring_spans_token_exact(spark):
    """The r7 token-exact contract (Lee et al. boundaries): chained
    overlapping repeats against DIFFERENT partners must come back as
    separate runs with exact start/end tokens — the legacy window-union
    mode merged them into one span that never occurs twice as a whole —
    and runs contained in a longer run of the same doc are pruned."""
    base = " ".join(f"w{i}" for i in range(12)) + " x y z"
    rows = [
        (10, base),                                   # w0..w11 x y z
        (11, "a b w0 w1 w2 w3 w4 w5 w6 c"),           # base[0..6] at 2..8
        (12, "d e f w4 w5 w6 w7 w8 w9 w10 w11 g"),    # base[4..11] at 3..10
        (13, "p q w1 w2 w3 w4 r s t u"),              # base[1..4] at 2..5
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id"], r["span_start"]): (
            r["span_end"], r["n_tokens"], r["n_windows"]
        )
        for r in D.exact_substring_spans(
            df, "doc_id", "text", window=4, min_count=2
        ).collect()
    }
    assert got == {
        # doc 10: TWO exact runs (vs 11 and vs 12), not one [0,11] span;
        # the [1,4] run vs doc 13 is contained in [0,6] -> pruned
        (10, 0): (6, 7, 4),
        (10, 4): (11, 8, 5),
        (11, 2): (8, 7, 4),       # its own copy of base[0..6]
        (12, 3): (10, 8, 5),      # its own copy of base[4..11]
        (13, 2): (5, 4, 1),       # maximal THERE, so it stays
    }
    # the legacy window-union mode is still available and chains the
    # two doc-10 runs into one non-repeating span — pin the difference
    legacy = {
        (r["id"], r["span_start"]): r["span_end"]
        for r in D.exact_substring_spans(
            df, "doc_id", "text", window=4, min_count=2, exact=False
        ).collect()
        if r["id"] == 10
    }
    assert legacy == {(10, 0): 11}


def test_exact_substring_coverage_identity(spark):
    """Token COVERAGE (which tokens sit inside some repeated >=window
    run) is provably identical between the exact and window-union
    modes; only the span segmentation differs. Fuzz a seeded corpus
    with heavy phrase reuse and assert the per-doc covered-token sets
    match exactly."""
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    phrases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9)))
        for _ in range(6)
    ]
    rows = []
    for i in range(20):
        parts = [
            rng.choice(phrases) if rng.random() < 0.6
            else " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 6)))
            for _ in range(rng.randint(2, 5))
        ]
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def coverage(exact):
        cov = {}
        for r in D.exact_substring_spans(
            df, "doc_id", "text", window=4, min_count=2, exact=exact
        ).collect():
            cov.setdefault(r["id"], set()).update(
                range(r["span_start"], r["span_end"] + 1)
            )
        return cov

    assert coverage(True) == coverage(False)


def test_cut_repeated_spans_run_aligned_canonical(spark):
    """Exact-mode keep-one is RUN-aligned: the canonical occurrence of
    a repeated run survives intact even when one of its windows also
    occurs inside different content in a lower-id document (the legacy
    per-window canonical clipped the survivor's edge in that case)."""
    rows = [
        (0, "k1 k2 m1 m2 m3 m4 k3 k4 k5"),            # holds M = m1..m4
        (5, "m1 m2 m3 m4 m5 m6 m7 m8"),               # run Y, canonical
        (6, "z1 m1 m2 m3 m4 m5 m6 m7 m8 z2"),         # copy of Y
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["clean_text"], r["n_tokens"], r["n_tokens_cut"])
        for r in D.cut_repeated_spans(
            df, "doc_id", "text", window=4, min_count=2
        ).collect()
    }
    assert got == {
        # doc 0 is the canonical home of content M -> untouched
        0: ("k1 k2 m1 m2 m3 m4 k3 k4 k5", 9, 0),
        # doc 5 is the canonical home of run Y and survives INTACT —
        # the legacy mode cut its first token because window m1..m4's
        # per-window canonical lived in doc 0
        5: ("m1 m2 m3 m4 m5 m6 m7 m8", 8, 0),
        # doc 6 holds non-canonical occurrences of both M and Y
        6: ("z1 z2", 10, 8),
    }
    # pin the legacy clipping behavior the exact mode fixes
    legacy = {
        r["id"]: r["clean_text"]
        for r in D.cut_repeated_spans(
            df, "doc_id", "text", window=4, min_count=2, exact=False
        ).collect()
    }
    assert legacy[5] == "m2 m3 m4 m5 m6 m7 m8"


def test_exact_substring_pair_budget_probe(spark):
    """The quadratic pair join is guarded by a cost probe computed
    from the hot-fingerprint counts BEFORE any pair materializes."""
    rows = [(i, "dup " * 12) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(ValueError, match="pair_budget"):
        D.exact_substring_spans(
            df, "doc_id", "text", window=4, min_count=2, pair_budget=10
        ).collect()


def test_ngram_jaccard_vs_python(spark, docs):
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    expected = {}
    for i in texts:
        for j in texts:
            if i < j:
                jac = _py_jaccard(texts[i], texts[j])
                if jac >= 0.5:
                    expected[(i, j)] = round(jac, 6)
    assert rows == expected
    assert (0, 1) in rows and rows[(0, 1)] == 1.0


def test_ngram_pair_modes_identical(spark, docs):
    """The broadcast bincount counter (r8) and the exchange join path
    must be row-identical — including under a frequency cap (counting
    on the capped universe, Jaccard on full sizes) and with STRING ids
    (pair orientation must follow Spark's comparator, pinned here by
    ids whose lexicographic order differs from insertion order)."""

    def both(df, **kw):
        a = sorted(
            map(
                tuple,
                D.ngram_jaccard_pairs(df, "doc_id", "text", pair_mode="join", **kw).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                D.ngram_jaccard_pairs(
                    df, "doc_id", "text", pair_mode="broadcast", **kw
                ).collect(),
            )
        )
        return a, b

    a, b = both(docs, n=3, threshold=0.5)
    assert a == b and len(a) > 0
    a, b = both(docs, n=3, threshold=0.3, max_shingle_freq=3, log_dropped=False)
    assert a == b
    sdocs = docs.withColumn(
        "doc_id", F.concat(F.lit("d"), (F.lit(10) - F.col("doc_id")))
    )
    a, b = both(sdocs, n=3, threshold=0.5)
    assert a == b and len(a) > 0
    # auto dispatch: tiny corpora resolve to the broadcast kernel, and a
    # zero-doc ceiling forces the join path — outputs identical either way
    forced_join = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, broadcast_max_docs=0
    )
    assert (
        sorted(map(tuple, forced_join.collect()))
        == sorted(
            map(
                tuple,
                D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect(),
            )
        )
    )


def test_minhash_lsh_finds_near_dups(spark, docs):
    got = {(r["id_a"], r["id_b"]) for r in
           D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_perm=64,
                               bands=16, threshold=0.5).collect()}
    assert (0, 1) in got
    assert (0, 2) in got or (0, 5) in got
    # verified candidates can't include unrelated docs
    assert (3, 4) not in got


def test_simhash_vs_python(spark, docs):
    got = {r["id"]: r["simhash"] for r in
           D.simhash_signatures(docs, "doc_id", "text").collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        assert got[i] == D._simhash64(t)
    # exact dups share the signature; near dups are hamming-close
    assert got[0] == got[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             D.simhash_pairs(docs, "doc_id", "text", max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0


def test_brute_force_topk_vs_numpy(spark):
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    q = df.where(F.col("vec_id") < 3)
    got = SIM.brute_force_topk(df, q, k=5).collect()
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / (
        np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
    )
    for qid in range(3):
        order = [
            int(j)
            for j in sorted(
                (j for j in range(40) if j != qid),
                key=lambda j: (-sims[qid, j], j),
            )[:5]
        ]
        mine = [r["neighbor_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )]
        assert mine == order


def test_lsh_ann_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, q, k=10).collect()
    # weak-neighbor corpus (max cosine ~0.5): use many short bands —
    # 6 bands x 2 bits -> ~94% theoretical recall at cos 0.4
    approx = SIM.lsh_ann_topk(emb, q, dim=64, k=10, n_planes=12, bands=6).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.7, f"ANN recall too low: {recall}"


def test_embedding_neardup_exact(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.04, 0.0]),
            (2, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             SIM.embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


def test_embedding_neardup_banded_matches_exact(spark):
    """The banded branch (r8: pairs kept only at their FIRST agreeing
    band, cosine + threshold filtered in-stage, no pair dedup) must
    emit each qualifying pair exactly once. At saturated banding
    (per-band width 1, miss probability 2^-n_planes on near-identical
    vectors) its output equals the exact self-join; at modest banding
    it must be a subset."""
    rng = np.random.RandomState(17)
    vecs = rng.standard_normal((60, 16))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    # planted near-dups: tiny perturbations of vectors 0..9
    for i in range(10):
        rows.append((100 + i, [float(x + 0.001 * ((i + j) % 5 - 2))
                               for j, x in enumerate(vecs[i])]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = sorted(map(tuple, SIM.embedding_neardup_pairs(
        df, threshold=0.98, dim=16, exact=True).collect()))
    banded = sorted(map(tuple, SIM.embedding_neardup_pairs(
        df, threshold=0.98, dim=16, n_planes=12, bands=12,
        exact=False).collect()))
    assert banded == exact and len(exact) >= 10
    modest = sorted(map(tuple, SIM.embedding_neardup_pairs(
        df, threshold=0.98, dim=16, n_planes=12, bands=3,
        exact=False).collect()))
    assert set(modest) <= set(exact)
    assert len(modest) == len(set(modest))  # no pair emitted twice


def test_fingerprint_vs_python(spark, docs):
    got = {r["id"]: r["fingerprint"] for r in
           TQ.fingerprint(docs, "doc_id", "text").collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == rolling_fingerprint(r["text"])


def test_prefix_filter_output_identical(spark):
    """ppjoin prefix filtering must be a pure candidate-pruning
    optimization: output equals the unfiltered path exactly, including
    near-threshold pairs."""
    import bertseyeview_spark.operators.dedup as D

    texts = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),    # near-dup of 0
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 0
        (3, "one two three four five six seven"),
        (4, "one two three four five six eight"),     # near-dup of 3
        (5, "totally different words here now ok"),
        (6, "alpha beta gamma unrelated tail words"), # partial overlap
        # size-skewed: shares 0's shingles but is much longer — the
        # length filter may prune it as a candidate, and the output
        # must still match the plain path exactly
        (7, "alpha beta gamma delta epsilon zeta plus a very long tail "
            "of extra words that dilute the jaccard far below threshold"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    for thr in (0.5, 0.8):
        plain = {
            tuple(r)
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=thr,
                prefix_filter=False,
            ).collect()
        }
        pref = {
            tuple(r)
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=thr,
                prefix_filter=True,
            ).collect()
        }
        assert pref == plain, f"threshold {thr}"
        assert plain  # non-empty: the comparison is meaningful


def test_prefix_filter_randomized_equality(spark):
    """Randomized corpus with planted near-dups: prefix+length+positional
    filtering must equal the plain path at multiple thresholds."""
    import random

    import bertseyeview_spark.operators.dedup as D

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(60):
        n = rng.randint(3, 15)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    for i in range(60, 90):  # single-token mutations of earlier docs
        base = rows[i - 60][1].split()
        base[rng.randrange(len(base))] = rng.choice(vocab)
        rows.append((i, " ".join(base)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.5, 0.8):
        plain = {
            tuple(r)
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=thr,
                prefix_filter=False,
            ).collect()
        }
        pref = {
            tuple(r)
            for r in D.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=2, threshold=thr,
                prefix_filter=True,
            ).collect()
        }
        assert pref == plain, f"threshold {thr}"


def test_prefix_filter_auto_cost_based(spark):
    """prefix_filter="auto" probes the shingle-join candidate volume:
    tiny corpora take the plain path (no row_number window in the plan)
    and a low threshold forces the pruned path — outputs identical."""
    import bertseyeview_spark.operators.dedup as D

    texts = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "one two three four five six"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    auto_small = {
        tuple(r)
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.5
        ).collect()
    }
    forced_on = {
        tuple(r)
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.5,
            prefix_filter="auto", auto_prefix_candidates=0, auto_min_docs=0,
        ).collect()
    }
    forced_off = {
        tuple(r)
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.5,
            prefix_filter=False,
        ).collect()
    }
    assert auto_small == forced_on == forced_off
    assert auto_small


def test_dedup_releases_shingle_cache(spark):
    """The persisted shingle table must be unpersisted once the result
    is materialized — repeated dedup calls in one session may not
    accumulate cached RDDs (ADVICE r2: storage-memory leak)."""
    import bertseyeview_spark.operators.dedup as D

    sc = spark.sparkContext
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3}") for i in range(20)],
        "doc_id long, text string",
    )
    before = sc._jsc.getPersistentRDDs().size()
    for _ in range(3):
        D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.5
        ).collect()
        D.minhash_lsh_pairs(
            docs, "doc_id", "text", n=2, num_perm=8, bands=4, threshold=0.5
        ).collect()
    after = sc._jsc.getPersistentRDDs().size()
    # localCheckpoint blocks of the returned (tiny) results may linger
    # until GC; the shingle caches themselves are released with
    # blocking=True, so growth is bounded by the 6 checkpoints — not
    # 6 checkpoints + 6 shingle caches
    assert after - before <= 6


def test_simhash_banding_pigeonhole(spark):
    """Bands are derived from the hamming budget (bands = max_hamming
    + 1): a signature pair whose differing bits land in EVERY 16-bit
    quarter — invisible to the old fixed 4x16 banding beyond hamming 3
    — must be found when max_hamming covers it."""
    import bertseyeview_spark.operators.dedup as D

    base = 0x0123456789ABCDEF
    # flip one bit in each 16-bit quarter (bits 0, 16, 32, 48): the old
    # 4-band scheme has NO identical band for this hamming-4 pair
    other = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))

    def to_signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = spark.createDataFrame(
        [(0, to_signed(base)), (1, to_signed(other)), (2, to_signed(0x7777000011112222))],
        "id long, simhash long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_candidates_from_sigs(sigs, max_hamming=4).collect()
    }
    assert got.get((0, 1)) == 4
    # and the guarantee generalizes: any <=10-bit spread is caught at
    # max_hamming=10 (11 bands)
    spread = base ^ sum(1 << (6 * k) for k in range(10))  # bits 0,6,...,54
    sigs2 = spark.createDataFrame(
        [(0, to_signed(base)), (1, to_signed(spread))],
        "id long, simhash long",
    )
    got2 = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_candidates_from_sigs(sigs2, max_hamming=10).collect()
    }
    assert got2.get((0, 1)) == 10
    # old fixed-width behavior is preserved at the default budget:
    # 4 bands of 16 bits
    assert D._band_bounds(64, 4) == [(0, 16), (16, 16), (32, 16), (48, 16)]


def test_decontaminate_flags_benchmark_overlap(spark):
    """Docs sharing an 8-gram with the benchmark are flagged; clean
    docs are not; counts are per-distinct-shingle."""
    from bertseyeview_spark.operators.dedup import decontaminate

    bench_sent = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro words {bench_sent} trailing tail here"),  # hit
            (2, "totally clean document with no benchmark overlap at all ok"),
            (3, bench_sent),                                      # exact hit
            (4, "short doc"),                                     # <8 tokens
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(bench_sent,)], ["text"])
    got = {
        r["id"]: (r["n_hit_shingles"], r["contaminated"])
        for r in decontaminate(docs, "doc_id", "text", bench, "text", n=8).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)
    assert got[4] == (0, False)
    assert len(got) == 4


def test_lm_perplexity_vs_python(spark):
    """Bigram add-alpha perplexity matches an exact python oracle."""
    import math
    from collections import Counter

    from bertseyeview_spark.operators.textquality import lm_perplexity

    texts = {
        1: "a b a b c",
        2: "a b c a b",
        3: "c c a",
        4: "solo",  # 1 token -> no bigrams -> absent from output
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    toks = {i: t.split() for i, t in texts.items()}
    c2 = Counter()
    c1 = Counter()
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for x, y in zip(t, t[1:]):
            c2[(x, y)] += 1
            c1[x] += 1
    a, v = 0.1, len(vocab)
    exp = {}
    for i, t in toks.items():
        bgs = list(zip(t, t[1:]))
        if not bgs:
            continue
        lp = [math.log((c2[bg] + a) / (c1[bg[0]] + a * v)) for bg in bgs]
        exp[i] = (len(bgs), round(math.exp(-sum(lp) / len(lp)), 6))
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in lm_perplexity(docs, "doc_id", "text", alpha=0.1).collect()
    }
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert abs(got[i][1] - exp[i][1]) < 1e-6


def test_kmeans_semdedup_vs_numpy(spark):
    """Deterministic Lloyd's matches an exact numpy replica (same init,
    same rounding), and semdedup keeps one representative per
    within-cluster near-dup group."""
    import numpy as np

    from bertseyeview_spark.operators.similarity import (
        kmeans_embeddings,
        semdedup,
    )

    rng = np.random.RandomState(7)
    dim, n, k, iters = 8, 40, 4, 3
    vecs = rng.standard_normal((n, dim))
    # plant a near-dup pair: vec 30 ~ vec 31
    vecs[31] = vecs[30] + 1e-4 * rng.standard_normal(dim)
    # an all-zero embedding (empty doc) must not abort the job under
    # ANSI mode: it normalizes to itself, dots 0 with every centroid
    # (deterministic cluster 0) and can never be a near-dup
    vecs[39] = 0.0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # numpy oracle: identical algorithm (zero vectors normalize to 0)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    nv = np.divide(vecs, norms, out=np.zeros_like(vecs), where=norms != 0)
    cents = np.round(nv[:k], 9)
    for _ in range(iters):
        sims = nv @ cents.T
        # argmax with min-cluster tie-break == np.argmax (first max)
        assign = np.argmax(sims, axis=1)
        new = []
        for c in range(k):
            m = nv[assign == c]
            new.append(
                np.round(m.mean(axis=0), 9) if len(m) else cents[c]
            )
        cents = np.array(new)
    exp_assign = np.argmax(nv @ cents.T, axis=1)

    got = {
        r["id"]: r["cluster"]
        for r in kmeans_embeddings(df, "vec_id", "embedding", k, iters).collect()
    }
    assert got == {i: int(exp_assign[i]) for i in range(n)}

    sd = {
        r["id"]: (r["cluster"], r["rep_id"], r["is_rep"])
        for r in semdedup(
            df, "vec_id", "embedding", k=k, iterations=iters, threshold=0.999
        ).collect()
    }
    assert len(sd) == n
    # the planted near-dup collapses to rep = NUMERIC min id (id's
    # original type, not the canonicalizer's string-order label)
    assert sd[30] == (int(exp_assign[30]), 30, True)
    assert sd[31] == (int(exp_assign[31]), 30, False)
    # everything else survives as its own representative (incl. the
    # zero vector, which can never reach any cosine threshold)
    assert all(sd[i][2] for i in range(n) if i != 31)


def test_semdedup_split_oversized_guard(spark):
    """Cluster-size guard: a single runaway k-means cluster (forced
    with k=1) holding three well-separated blobs is recursively
    re-split below the size budget before the quadratic pair join,
    each sub-cluster lands on one blob, and planted near-dups still
    collapse to their numeric-min representative."""
    import numpy as np

    from bertseyeview_spark.operators.similarity import (
        _split_oversized,
        semdedup,
    )

    rng = np.random.RandomState(3)
    dim, n = 8, 90
    centers = np.eye(3, dim) * 10.0
    vecs = np.empty((n, dim))
    for i in range(n):
        # ids interleave blobs (blob = id % 3) so the deterministic
        # sub-k-means seeds (smallest ids) span all three blobs
        vecs[i] = centers[i % 3] + 0.1 * rng.standard_normal(dim)
    vecs[87] = vecs[84] + 1e-4 * rng.standard_normal(dim)  # near-dup pair
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # direct guard check: one oversized cluster -> sub-clusters under
    # the budget, each pure (exactly one blob per sub-cluster)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in nv[i]], 0) for i in range(n)],
        "id long, nv array<double>, cluster int",
    )
    split = _split_oversized(vdf, 1, max_cluster_size=35).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in split:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"] % 3)
    assert all(len(blobs) == 1 for blobs in by_cluster.values())
    sizes = {c: sum(1 for r in split if r["cluster"] == c) for c in by_cluster}
    assert max(sizes.values()) <= 35 and sum(sizes.values()) == n

    # end-to-end: guard on, near-dup still collapses, everyone else reps
    sd = {
        r["id"]: (r["rep_id"], r["is_rep"])
        for r in semdedup(
            df, "vec_id", "embedding", k=1, iterations=1,
            threshold=0.99999, max_cluster_size=35,
        ).collect()
    }
    assert len(sd) == n
    assert sd[87] == (84, False)
    assert all(sd[i] == (i, True) for i in range(n) if i != 87)


def test_semdedup_identical_vector_cluster_is_linear(spark):
    """Fully degenerate case: a cluster of byte-identical vectors that
    NO k-means can split (every dot ties). The guard detects zero
    split progress and stops; the exact-duplicate collapse then
    reduces the cluster to ONE delegate, so the pair stage emits O(n)
    member edges instead of an O(n^2) join, and all copies collapse to
    the numeric-min representative."""
    import numpy as np

    from bertseyeview_spark.operators.similarity import semdedup

    dim, n_same = 8, 50
    same = [1.0, 2.0, 3.0] + [0.0] * (dim - 3)
    rng = np.random.RandomState(5)
    rows = [(i, list(same)) for i in range(n_same)] + [
        (100 + j, [float(x) for x in rng.standard_normal(dim)])
        for j in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    sd = {
        r["id"]: (r["rep_id"], r["is_rep"])
        for r in semdedup(
            df, "vec_id", "embedding", k=2, iterations=2,
            threshold=0.99, max_cluster_size=10, max_split_depth=2,
        ).collect()
    }
    assert len(sd) == n_same + 5
    assert sd[0] == (0, True)
    assert all(sd[i] == (0, False) for i in range(1, n_same))
    assert all(sd[100 + j] == (100 + j, True) for j in range(5))


def test_ivf_topk_clustered_full_recall_at_nprobe1(spark):
    """On data WITH cluster structure (the real-corpus shape) IVF
    achieves full recall probing a single list: 4 well-separated
    clusters, queries near the centers -> nprobe=1 equals brute force
    while scanning ~1/4 of the corpus; and on any data nprobe ==
    n_clusters degenerates to exact search."""
    import numpy as np

    from bertseyeview_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(11)
    dim, per = 8, 12
    centers = np.eye(4, dim) * 10.0
    rows = []
    for c in range(4):
        for j in range(per):
            v = centers[c] + 0.1 * rng.standard_normal(dim)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where("vec_id % 12 = 0")  # one query per cluster

    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in brute_force_topk(df, qs, "vec_id", "embedding", k=5).collect()
    }
    got1 = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk(
            df, qs, "vec_id", "embedding", k=5, n_clusters=4, nprobe=1
        ).collect()
    }
    assert got1 == exact
    # saturation: nprobe == n_clusters is exact on ANY data
    got_all = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk(
            df, qs, "vec_id", "embedding", k=5, n_clusters=4, nprobe=4
        ).collect()
    }
    assert got_all == exact


def test_dedup_paragraphs_ccnet_semantics(spark):
    """CCNet/RefinedWeb paragraph dedup: canonical (min (id,pos))
    occurrence survives, normalization merges case/whitespace
    spellings, whitespace-only units are never deduped, fully-duplicate
    docs come back empty, null text behaves as one empty unit."""
    from bertseyeview_spark.operators.dedup import dedup_paragraphs

    rows = [
        (1, "alpha line\nBOILER  plate\nunique one"),
        (2, "boiler plate\nunique two\nboiler plate"),
        (3, "boiler plate"),
        (4, "   \nboiler plate\n   "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (
            r["clean_text"], r["n_paragraphs"], r["n_kept"], r["n_dropped"]
        )
        for r in dedup_paragraphs(df, "doc_id", "text").collect()
    }
    assert got[1] == ("alpha line\nBOILER  plate\nunique one", 3, 3, 0)
    assert got[2] == ("unique two", 3, 1, 2)
    assert got[3] == ("", 1, 0, 1)
    assert got[4] == ("   \n   ", 3, 2, 1)
    assert got[5] == ("", 1, 1, 0)
    # paragraph granularity via sep: intra-doc duplicate paragraph cut
    df6 = spark.createDataFrame(
        [(6, "para one\n\npara one")], ["doc_id", "text"]
    )
    got6 = dedup_paragraphs(df6, "doc_id", "text", sep="\n\n").collect()[0]
    assert (got6["clean_text"], got6["n_kept"]) == ("para one", 1)


def test_dedup_paragraphs_review_edges(spark):
    """r6 review findings: tab-only separator lines are never deduped
    (collapse-before-trim normalization), edge-tab spellings of the
    same paragraph DO dedup, and a regex-metacharacter separator is
    treated literally."""
    from bertseyeview_spark.operators.dedup import dedup_paragraphs

    rows = [(1, "aaa\n\t\nbbb"), (2, "ccc\n\t\nddd"), (3, "\tboiler"),
            (4, "boiler")]
    got = {
        r["id"]: (r["clean_text"], r["n_dropped"])
        for r in dedup_paragraphs(
            spark.createDataFrame(rows, ["doc_id", "text"]), "doc_id", "text"
        ).collect()
    }
    assert got[1] == ("aaa\n\t\nbbb", 0)
    assert got[2] == ("ccc\n\t\nddd", 0)      # '\t' line survives in BOTH
    assert got[3] == ("\tboiler", 0)          # canonical (id 3 < 4)
    assert got[4] == ("", 1)                  # edge-tab spelling deduped
    # sep is literal: '.' must not split on every character
    got6 = dedup_paragraphs(
        spark.createDataFrame([(6, "a.b.a")], ["doc_id", "text"]),
        "doc_id", "text", sep=".",
    ).collect()[0]
    assert (got6["clean_text"], got6["n_paragraphs"], got6["n_kept"]) == (
        "a.b", 3, 2
    )


def test_dedup_paragraphs_invariants_random(spark):
    """Seeded random corpora: count identity (kept + dropped == total),
    corpus-wide uniqueness of surviving normalized units, and
    idempotence (a second pass over the cleaned corpus drops nothing)."""
    import random
    import re

    from bertseyeview_spark.operators.dedup import dedup_paragraphs

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(40):
        lines = [
            " ".join(rng.choices(vocab, k=rng.randint(0, 4)))
            for _ in range(rng.randint(0, 6))
        ]
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_paragraphs(df, "doc_id", "text").collect()
    assert {r["id"] for r in out} == {i for i, _ in rows}
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_paragraphs"], r
    # surviving non-whitespace units are unique corpus-wide
    seen = {}
    for r in out:
        if r["clean_text"] == "":
            continue
        for u in r["clean_text"].split("\n"):
            nrm = re.sub(r"\s+", " ", u.lower()).strip()
            if nrm:
                assert nrm not in seen, (nrm, seen[nrm], r["id"])
                seen[nrm] = r["id"]
    # idempotence
    clean = spark.createDataFrame(
        [(r["id"], r["clean_text"]) for r in out], ["doc_id", "text"]
    )
    out2 = dedup_paragraphs(clean, "doc_id", "text").collect()
    assert all(r["n_dropped"] == 0 for r in out2)
