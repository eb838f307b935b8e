"""Property-based fuzzing (hypothesis) for the pure codecs and taggers —
the byte-parity surfaces where a crash or a drifting invariant at
web scale means a poisoned partition."""

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from bertseyeview_spark.functions import codecs as C
from bertseyeview_spark.operators.dedup import _simhash64
from bertseyeview_spark.operators.mentions import _compile_matcher, tag_text
from bertseyeview_spark.operators.textquality import rolling_fingerprint
from bertseyeview_spark.plans.kg_fused import _page_edges  # noqa: F401

_year_texts = st.from_regex(r"[A-Za-z0-9 /\-]{0,10}[1-3][0-9]{3}[A-Za-z0-9 /\-]{0,10}", fullmatch=True)


class TestDateFuzz:
    @given(_year_texts)
    @settings(max_examples=200, deadline=None)
    def test_preprocess_never_crashes_with_year(self, raw):
        # reference-faithful: garbage like '//1000' yields '' (the
        # reference's range-split arithmetic does too) — the invariant
        # is "no exception", not "non-empty"
        out = C.preprocess_date(raw)
        assert isinstance(out, str)

    @given(st.sampled_from(["NA", ""]))
    def test_sentinels(self, raw):
        assert C.preprocess_date(raw) == "1900 Jan 1"


class TestAnnotationFuzz:
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet=string.ascii_letters + " ", min_size=1, max_size=12),
                st.sampled_from(["Gene", "Disease", "Chemical", "Species"]),
                st.text(alphabet=string.digits + "MESH:D", min_size=1, max_size=10),
            ),
            max_size=12,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_build_annotation_invariants(self, rows):
        out = C.build_annotation_string(rows)
        parts = out.split("|")
        assert len(parts) == 6  # fixed concept order, always 6 slots
        # no slot starts or ends with a stray comma
        for p in parts:
            assert p == "Null" or (not p.startswith(",") and not p.endswith(","))

    @given(
        st.lists(
            st.tuples(
                st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
                st.sampled_from(["Gene"]),
                st.text(alphabet=string.digits, min_size=1, max_size=6),
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_contains_all_unique(self, rows):
        out = C.build_annotation_string(rows)
        parsed = C.parse_annotation_string(out)
        got = {(c, n, s) for c, n, s, _ in parsed}
        want = {(c, n, s) for s, c, n in rows}
        # first-win dedup may DROP duplicates but never invents entries
        assert got <= want


class TestTaggerFuzz:
    @given(st.text(alphabet=string.printable, max_size=400))
    @settings(max_examples=150, deadline=None)
    def test_tag_text_offsets_valid(self, text):
        matcher = _compile_matcher(["sod1", "als", "tumor", "liver regeneration"])
        for surface, start, end, sent_start, sentence in tag_text(text, matcher):
            assert text.lower()[start:end] == surface
            assert 0 <= sent_start <= start
            # the mention lies inside its sentence
            rel = start - sent_start
            assert sentence.lower()[rel : rel + len(surface)] == surface


class TestHashFuzz:
    @given(st.text(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_simhash_signed_64(self, text):
        h = _simhash64(text)
        assert -(1 << 63) <= h < (1 << 63)

    @given(st.text(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_fingerprint_range_and_determinism(self, text):
        a, b = rolling_fingerprint(text), rolling_fingerprint(text)
        assert a == b
        assert 0 <= a < (1 << 61) - 1


class TestAuthorsFuzz:
    @given(
        st.lists(
            st.one_of(
                st.fixed_dictionaries({"name": st.text(max_size=20)}),
                st.dictionaries(st.text(max_size=3), st.integers(), max_size=2),
                st.integers(),
            ),
            max_size=6,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_author_string_never_crashes(self, author_list):
        out = C.get_author_string(author_list)
        assert isinstance(out, str)
        if author_list:
            assert out.startswith("'") and out.endswith("'")
        else:
            assert out == "NA"
