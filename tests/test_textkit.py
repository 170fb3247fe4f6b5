"""Byte-exactness of text kernels vs the reference implementations
(executed at test time from /root/reference via reference_oracle), plus
scalar↔Arrow equivalence property tests."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import reference_oracle as ro
from newslookout_ray.functions import textkit as tk

# text alphabet biased toward the interesting replacement tokens
_DIRTY = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from(
            list("₹$€—–’‘”“​\t\n\r.-_ ")
            + ["â", "™", "🙂", "क", "ा", "\x93", "\x81", "\xa0", " "]
        ),
    ),
    max_size=120,
)


class TestCleanTextParity:
    CASES = [
        "",
        "a",
        "ab",
        "Hello â€™ world â test ™ done\tx",
        " Addl.  M/s. m/s. Rs. ₹100 $5 €9 — – ’ ‘ ” “ ​ end",
        "in the morning.A total of Rs.500",
        "increased to Rs 167.75.Earlier, the spokesman said",
        "क य स mixed हिंदी text",
        "  padded  \n",
        "a.B",
        "ab.Cd.Ef",
        "x\x93y\x94z\x81\xe0\xaa\x9c",
        "price is $5.Now what",
        "🙂🙂 smiley",
    ]

    def test_fixture_cases(self):
        ref = ro.reference_clean_text()
        for case in self.CASES:
            assert tk.clean_text(case) == ref(case), repr(case)

    def test_none_passthrough(self):
        ref = ro.reference_clean_text()
        assert tk.clean_text(None) == ref(None) is None

    @settings(max_examples=300, deadline=None)
    @given(_DIRTY)
    def test_property_parity(self, text):
        assert tk.clean_text(text) == ro.reference_clean_text()(text)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(_DIRTY, max_size=8))
    def test_arrow_equivalence(self, texts):
        arr = pa.array(texts, type=pa.string())
        assert tk.clean_text_arrow(arr).to_pylist() == [tk.clean_text(t) for t in texts]


class TestFilterRepeatedChars:
    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=list("ab .-_\t\n\r"), max_size=80))
    def test_parity(self, text):
        ref = ro.reference_scraper_utils()["filterRepeatedchars"]
        assert tk.filter_repeated_chars(text) == ref(text, list(tk.REPEAT_CHAR_LIST))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(alphabet=list("ab .-_\t\n\r"), max_size=60), max_size=6))
    def test_arrow_equivalence(self, texts):
        arr = pa.array(texts, type=pa.string())
        out = tk.filter_repeated_chars_arrow(arr).to_pylist()
        assert out == [tk.filter_repeated_chars(t) for t in texts]


class TestFixSentenceGaps:
    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=list("aBc. xY"), max_size=60))
    def test_parity(self, text):
        assert tk.fix_sentence_gaps(text) == ro.reference_scraper_utils()["fixSentenceGaps"](text)


class TestSmallKernels:
    def test_crc32_parity(self):
        ref = ro.reference_scraper_utils()["calculateCRC32"]
        for v in ["hello", b"bytes", None, 123, "caf\xe9", ""]:
            assert tk.crc32_hex(v) == ref(v)

    def test_dedupe_preserves_order(self):
        assert tk.dedupe_list([3, 1, 3, 2, 1]) == [3, 1, 2]
        assert tk.dedupe_list("not-a-list") == "not-a-list"
        ref = ro.reference_scraper_utils()["deDupeList"]
        assert tk.dedupe_list(["b", "a", "b"]) == ref(["b", "a", "b"])

    def test_cut_between_tags(self):
        ref = ro.reference_scraper_utils()["cutStrBetweenTags"]
        for args in [("a<b>x</b>c", "<b>", "</b>"), ("no tags", "<b>", "</b>"), ("<b>x", "<b>", "</b>")]:
            assert tk.cut_str_between_tags(*args) == ref(*args)

    def test_quotes_and_utf8(self):
        su = ro.reference_scraper_utils()
        assert tk.remove_start_trail_quotes("\"'x'\"") == su["removeStartTrailQuotes"]("\"'x'\"")
        for v in ["ok", b"\xff\xferaw", None, 5]:
            assert tk.clean_non_utf8(v) == su["clean_non_utf8"](v)


class TestKeywordFlags:
    def test_regex_pack_identical_to_reference(self):
        assert tk.KEYWORD_FLAG_REGEX == ro.reference_keyword_flag_regex()

    def test_reference_flag_sentences_fixture(self):
        """Each sentence of the reference's fixture should trip >=1 flag."""
        path = "/root/reference/test-data/flag_keywords_test_sentences.txt"
        with open(path, encoding="utf-8") as fh:
            sentences = [ln.strip() for ln in fh if ln.strip()]
        assert sentences
        hit_any = 0
        for s in sentences:
            flags = tk.keyword_flags(s)
            assert set(flags) == set(tk.KEYWORD_FLAG_REGEX)
            hit_any += any(flags.values())
        assert hit_any >= len(sentences) * 0.8

    def test_batch_matches_scalar(self):
        texts = ["labour strike at the plant", "nothing here", "director appointed today"]
        batch = tk.keyword_flags_batch(texts)
        for i, t in enumerate(texts):
            scalar = tk.keyword_flags(t)
            for k in scalar:
                assert batch[k][i] == scalar[k], (t, k)

    def test_arrow_kernel_matches_python_re(self):
        """The RE2-vectorized pack must flag EXACTLY like the Python re
        loop — on the reference fixture sentences plus hostile edges
        (None, empty, newlines inside a potential match, unicode,
        uppercase-only triggers)."""
        import pyarrow as pa

        path = "/root/reference/test-data/flag_keywords_test_sentences.txt"
        with open(path, encoding="utf-8") as fh:
            texts = [ln.strip() for ln in fh if ln.strip()]
        texts += [
            None, "", "   ", "LABOUR STRIKE AT THE PLANT",
            "labour\nstrike disrupt", "strike.\nviolence elsewhere",
            "déjà vu strike at the plant ünion problem",
            "a" * 10000 + " dividend declared",
        ]
        ref = tk.keyword_flags_batch(texts)
        got = tk.keyword_flags_batch_arrow(pa.array(texts, pa.string()))
        assert set(got) == set(ref)
        for k in ref:
            assert (got[k] == ref[k]).all(), k

    def test_arrow_kernel_null_block(self):
        import pyarrow as pa

        got = tk.keyword_flags_batch_arrow(pa.array([None, None]))
        for k, v in got.items():
            assert (v == 0).all()
