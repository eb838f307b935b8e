"""Unicode / adversarial-text fuzz for the shared tokenizer surface
(norm_tokens and every consumer: chunking, substring cut, repetition
signals, shingle windows) and the byte-parity extraction path.

The tokenizer is THE shared positional contract (textquality.py
norm_tokens docstring): positions produced by one copy and consumed by
another must agree, and the cross-engine oracles replay the same split
with an explicit ``[ \\t\\n\\x0B\\f\\r]+`` class. None of that had
been exercised with NFC/NFD variants, zero-width characters, CRLF,
emoji, fullwidth forms, or RTL text until this suite (r5 verdict #4):
each graded tokenizer consumer runs Spark-vs-DuckDB on an adversarial
corpus with the SAME normalize-and-compare discipline as the driver
gate (tools/check_oracles.py), so any engine divergence on this class
fails loudly here before it can poison a driver row.

All non-ASCII code points are written as explicit escapes so the test
corpus survives editors/diff tools that normalize invisibles.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from tools.check_oracles import dtype_kinds, normalize  # noqa: E402

# named escapes used below
NBSP = '\xa0'
ZWSP = '\u200b'
ZWJ = '\u200d'
BOM = '\ufeff'
LSEP = '\u2028'
PSEP = '\u2029'
RLM = '\u200f'
LRM = '\u200e'
E_NFC = 'caf\xe9'            # é composed
E_NFD = 'cafe\u0301'           # e + combining acute
LIGFI = '\ufb01le'             # ﬁ ligature + "le"
FW_THE = '\uff34\uff48\uff45'  # fullwidth "The"
TR_I = '\u0130stanbul'         # dotted capital I
SHARP = 'stra\xdfe'
SIGMA_L = '\u03a3\u03af\u03c3\u03c5\u03c6\u03bf\u03c2'
SIGMA_U = '\u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3'
ZALGO = 'z\u0338\u0320\u0308a\u0334\u035a\u035dl\u0336\u0320g\u0337\u032do'
ROCKET = "\U0001f680"
THUMBS = "\U0001f44d\U0001f3fd"
FLAG = "\U0001f1e9\U0001f1ea"
AR = '\u0645\u0631\u062d\u0628\u0627'          # marhaba
AR2 = '\u0628\u0627\u0644\u0639\u0627\u0644\u0645'  # bial'alam
HE = '\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd \u05e9\u05dc\u05d5\u05dd'
MVS = '\u180e'                 # Mongolian vowel separator
IDSP = '\u3000'                # ideographic space

_HANDCRAFTED = [
    # NFC vs NFD of the same word — distinct code points, both engines
    # must treat them as distinct tokens (no implicit normalization)
    f"{E_NFC} menu {E_NFC} menu {E_NFC} menu",
    f"{E_NFD} menu {E_NFD} menu {E_NFD} menu",
    # NFKC-divergent compatibility forms: ligature + fullwidth
    f"{LIGFI} {LIGFI} {LIGFI} system check",
    f"{FW_THE} {FW_THE} {FW_THE} quick fox",
    # zero-width: ZWSP / ZWJ / BOM are NOT whitespace in either engine
    f"zero{ZWSP}width zero{ZWSP}width zero{ZWSP}width space",
    f"family{ZWJ}emoji family{ZWJ}emoji join",
    f"{BOM}bom lead {BOM}bom lead {BOM}bom lead",
    # CRLF and lone CR line endings (repetition dup-line surface)
    "dup line\r\nother text\r\ndup line\r\nmore words here",
    "alpha\rbeta\r\ngamma\nalpha\rbeta",
    # vertical tab and form feed — members of the pinned class
    "a\x0bb c\fd a\x0bb c\fd",
    # NBSP / line sep / para sep / MVS / ideographic space are NOT in
    # the pinned class: they glue tokens identically in both engines
    f"nb{NBSP}sp nb{NBSP}sp nb{NBSP}sp stays one token",
    f"line{LSEP}sep para{PSEP}sep line{LSEP}sep para{PSEP}sep",
    f"a{MVS}b c d e{IDSP}f a{MVS}b",
    # emoji incl. astral plane + skin-tone modifier + flag pair
    f"{ROCKET} rocket {ROCKET} rocket {ROCKET} rocket launch",
    f"thumbs {THUMBS} up thumbs {THUMBS} up",
    f"flag {FLAG} flag {FLAG} flag",
    # RTL scripts + explicit directional marks (RLM/LRM)
    f"{AR} {AR2} {AR} {AR2}",
    f"mixed {RLM}direction{LRM} mixed {RLM}direction{LRM} text",
    HE,
    # case-folding hazards: sharp s; already-lowercase final sigma.
    # (Dotted capital I U+0130 and UPPERCASE final-sigma words are
    # excluded here: lower() itself disagrees across engines on those
    # — pinned by test_lower_divergence_is_engine_level.)
    f"STRASSE {SHARP} STRASSE {SHARP} compare",
    SIGMA_L,
    # combining-mark storms (zalgo)
    f"{ZALGO} {ZALGO}",
    # degenerate whitespace shapes
    "",
    "   ",
    "\r\n",
    "\t\x0b\f\r\n ",
    NBSP,  # NBSP-only: ONE token in both engines (not whitespace)
    "single",
    # shared 8-token phrase ACROSS documents with unicode tokens —
    # exercises the exact-substring canonical-pick + cut across docs
    f"{ROCKET} {E_NFC} {AR} zero one two three four tail alpha",
    f"head {ROCKET} {E_NFC} {AR} zero one two three four coda",
]

_POOL = (
    list("abcdefghij")
    + [" ", "\t", "\n", "\r", "\x0b", "\f", "\r\n"]
    + [NBSP, LSEP, PSEP, ZWSP, ZWJ, BOM]
    + ["é", "é", "ﬁ", "Ｔ", "ß"]
    + [ROCKET, THUMBS, "م", "ש", "́"]
)


def _random_docs(n: int, seed: int = 20260817) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(0, 120)
        out.append("".join(rng.choice(_POOL) for _ in range(k)))
    return out


def _corpus() -> pd.DataFrame:
    texts = _HANDCRAFTED + _random_docs(60)
    return pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["fuzz"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )


@pytest.fixture(scope="module")
def fuzz_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_sf")
    _corpus().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle(fuzz_sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{fuzz_sf_dir}/documents.parquet'"
    )
    return con.sql(sql).df()


def _assert_match(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    ka, kb = dtype_kinds(sdf), dtype_kinds(odf)
    kind = {
        c: (ka.get(c), kb.get(c))
        for c in set(ka) | set(kb)
        if ka.get(c) != kb.get(c)
    }
    assert not kind, f"{name}: dtype-kind mismatch {kind}"
    a, b = normalize(sdf), normalize(odf)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        ix = diff[diff].index[:5]
        msg = [f"{name}: {int(diff.sum())}/{len(a)} mismatched rows"]
        for i in ix:
            msg.append(f"  spark : {a.loc[i].to_dict()!r}")
            msg.append(f"  oracle: {b.loc[i].to_dict()!r}")
        raise AssertionError("\n".join(msg))


@pytest.mark.parametrize(
    "qname",
    [
        "text_chunking",
        "substring_cut",
        "repetition_signals",
        "exact_substring_dedup",
        "token_counts_by_source",
        "lm_perplexity",
    ],
)
def test_tokenizer_consumers_cross_engine_on_adversarial_text(
    spark, fuzz_sf_dir, qname
):
    sdf = E.queries()[qname](spark, fuzz_sf_dir).toPandas()
    odf = _oracle(fuzz_sf_dir, E.oracle_sql()[qname])
    _assert_match(qname, sdf, odf)


def test_empty_docs_yield_no_chunks_and_zero_tokens(spark, fuzz_sf_dir):
    """The r6 norm_tokens empty-guard, pinned on both leak sites the
    r5 advisor named: no phantom chunk, n_tokens == 0."""
    from bertseyeview_spark.operators.dedup import cut_repeated_spans
    from bertseyeview_spark.operators.textquality import chunk_text

    docs = spark.read.parquet(f"{fuzz_sf_dir}/documents.parquet")
    empty_ids = {
        r["doc_id"]
        for r in docs.where("trim(text) = ''").select("doc_id").collect()
    }
    assert empty_ids, "fuzz corpus must contain empty/whitespace docs"
    chunks = chunk_text(docs, "doc_id", "text", size=16, overlap=4)
    assert not (
        {r["id"] for r in chunks.select("id").distinct().collect()} & empty_ids
    )
    cut = cut_repeated_spans(docs, "doc_id", "text", window=8, min_count=2)
    ntok = {r["id"]: r["n_tokens"] for r in cut.collect()}
    assert all(ntok[i] == 0 for i in empty_ids)


def test_lower_divergence_is_engine_level(spark):
    """Pins WHY U+0130 and uppercase final-sigma words are excluded
    from the cross-engine fuzz corpus: ``lower()`` itself disagrees.
    Spark (java.lang.String semantics) maps U+0130 to ``i`` + combining
    dot U+0307 and lowercases a word-final capital sigma to U+03C2;
    DuckDB (utf8proc) maps U+0130 to bare ``i`` and every capital
    sigma to U+03C3 position-blind. If either engine changes and this
    test fails, the exclusions above can be lifted."""
    cases = {TR_I: ("i̇stanbul", "istanbul"),
             SIGMA_U: ("σισυφος", "σισυφοσ")}
    sdf = spark.createDataFrame([(k,) for k in cases], ["c"])
    got_spark = {
        r["c"]: r["l"] for r in sdf.selectExpr("c", "lower(c) AS l").collect()
    }
    con = duckdb.connect()
    for raw, (want_spark, want_duck) in cases.items():
        assert got_spark[raw] == want_spark, repr(raw)
        got_duck = con.sql("SELECT lower(?)", params=[raw]).fetchone()[0]
        assert got_duck == want_duck, repr(raw)


def test_extraction_byte_identity_on_unicode_html(spark):
    """The north-rule byte-parity invariant on adversarial markup: the
    distributed Arrow extract path must return byte-for-byte what the
    pure extractor computes driver-side (UTF-8 survives the Arrow
    round trip; entity unescape and \\s+ collapse are deterministic)."""
    import datetime as dt

    from bertseyeview_spark.operators.extract import extract_one, extract_text

    bodies = _HANDCRAFTED + _random_docs(20, seed=7)
    rows = []
    for i, body in enumerate(bodies):
        html = (
            "<html><head><title>t&amp;é " + str(i) + "</title></head>"
            "<body><nav>skip me</nav><article><p>" + body + "</p>"
            "<p>second   paŕt</p></article>"
            "<footer>no</footer></body></html>"
        )
        rows.append(
            (
                f"https://u/{i}",
                dt.datetime(2024, 1, 1, 0, i % 60),
                html.encode("utf-8"),
                "en",
            )
        )
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "html", "lang"])
    got = {r["url"]: r["text"] for r in extract_text(pages).collect()}
    assert len(got) == len(rows)
    for i, (url, _, html_bytes, _) in enumerate(rows):
        expected, _links = extract_one(html_bytes)
        assert got[url].encode("utf-8") == expected.encode("utf-8"), url


def test_norm_tokens_edge_whitespace(spark):
    """r6 review finding: trim() strips only 0x20, so edge tabs/CRLF
    used to leave phantom empty tokens ('\\tfoo' -> ['', 'foo']). The
    edge strip now uses the full pinned class on both engines."""
    from bertseyeview_spark.operators.textquality import norm_tokens

    rows = [(0, "\tfoo"), (1, "foo\t"), (2, "\t"), (3, "\r\nfoo bar\r\n"),
            (4, None), (5, NBSP)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", norm_tokens("text").alias("t")).collect()
    }
    assert got == {
        0: ["foo"], 1: ["foo"], 2: [], 3: ["foo", "bar"],
        4: [], 5: [NBSP],  # NBSP is not whitespace: one real token
    }
