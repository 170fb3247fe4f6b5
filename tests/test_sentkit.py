"""Punkt-parity sentence segmentation (functions/sentkit.py).

nltk is not installed in this sandbox, so exact sent_tokenize parity
cannot be executed here; instead the suite locks (a) the vendored
parameters extracted from the reference's punkt pickle
(test-data/nltk_data/tokenizers/punkt/english.pickle), (b) hand-derived
punkt decisions on abbreviation-heavy fixtures (each case traces the
published Kiss & Strunk procedure over the real parameters), and
(c) golden sentence counts on the reference's own fixture articles via
the same extraction kernel the crawl uses. When nltk IS importable,
sentkit.sent_tokenize delegates to it, so parity is by construction.
"""

from __future__ import annotations

import bz2
import os

import pytest

from newslookout_ray.functions import sentkit

FIXTURE_DIR = "/root/reference/test-data"


@pytest.fixture(scope="module")
def seg():
    return sentkit.PunktSegmenter(sentkit.PunktParams.load_vendored())


class TestVendoredParams:
    def test_sizes_match_reference_pickle(self):
        p = sentkit.PunktParams.load_vendored()
        # extracted from the reference's vendored english.pickle — these
        # counts ARE the model identity
        assert len(p.abbrev_types) == 156
        assert len(p.collocations) == 37
        assert len(p.sent_starters) == 39
        assert len(p.ortho_context) == 20366

    def test_known_members(self):
        p = sentkit.PunktParams.load_vendored()
        assert {"dr", "mr", "p.m", "u.s", "corp", "inc", "jan"} <= p.abbrev_types
        assert "however" in p.sent_starters
        assert ("j", "aron") in p.collocations


class TestPunktDecisions:
    """Each case is the traced punkt decision over the real params."""

    def test_abbreviations_do_not_break(self, seg):
        got = seg.tokenize("dr. smith went to washington. he arrived at 5 p.m. today.")
        assert got == [
            "dr. smith went to washington.",
            "he arrived at 5 p.m. today.",
        ]

    def test_multi_period_abbrev_and_corp(self, seg):
        got = seg.tokenize("the u.s. economy grew. mr. jones of acme corp. said so.")
        assert got == [
            "the u.s. economy grew.",
            "mr. jones of acme corp. said so.",
        ]

    def test_question_exclaim_split_off(self, seg):
        assert seg.tokenize("hello world? yes! and no.") == [
            "hello world?",
            "yes!",
            "and no.",
        ]

    def test_decimal_numbers_do_not_break(self, seg):
        got = seg.tokenize("prices rose 3.5 points in january. volumes fell.")
        assert got == ["prices rose 3.5 points in january.", "volumes fell."]

    def test_realign_trailing_quote(self, seg):
        got = seg.tokenize('"we are done." he said. (finally.)')
        assert got == ['"we are done."', "he said.", "(finally.)"]

    def test_abbrev_then_frequent_starter_capitalized_breaks(self, seg):
        # 4.1.3: next word capitalized + in sent_starters -> break after
        # the abbreviation; lowercased it stays attached (4.2 no-break)
        cased = seg.tokenize("he works at acme corp. However he is happy.")
        assert cased == ["he works at acme corp.", "However he is happy."]
        lowered = seg.tokenize("he works at acme corp. however he is happy.")
        assert lowered == ["he works at acme corp. however he is happy."]

    def test_initial_followed_by_surname_no_break(self, seg):
        # 4.3 initials: "j." + "aron" is also a known collocation
        got = seg.tokenize("goldman's j. aron unit traded. profits rose.")
        assert got == ["goldman's j. aron unit traded.", "profits rose."]

    def test_ellipsis_not_a_break_midsentence(self, seg):
        got = seg.tokenize("it went on... and on without end. then it stopped.")
        assert got == [
            "it went on... and on without end.",
            "then it stopped.",
        ]

    def test_empty_and_no_terminal(self, seg):
        assert seg.tokenize("") == []
        assert seg.tokenize("no terminal punctuation") == [
            "no terminal punctuation"
        ]

    def test_determinism(self, seg):
        t = "dr. smith met mr. jones. they spoke at 5 p.m. about u.s. policy."
        assert seg.tokenize(t) == seg.tokenize(t) == sentkit.sent_tokenize(t)


@pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not present"
)
class TestReferenceFixtureCounts:
    """Golden sentence counts on the reference's own fixture articles,
    lowercased exactly like mod_eventclass.py:165 does before punkt."""

    CASES = [
        ("mod_en_in_ecotimes_73837853.html.bz2", "ECOTIMES_PROFILE",
         "https://economictimes.indiatimes.com/markets/expert-view/"
         "a-reasonable-budget-but-still-unclear-on-fiscal-deficit-front-swaminathan-aiyar/"
         "articleshow/73837853.cms", 34),
        ("mod_en_in_hindu_30713792.html.bz2", "HINDU_PROFILE",
         "https://www.thehindu.com/business/budget/"
         "16-point-action-plan-for-agriculture-evokes-mixed-response/article30713792.ece", 15),
        ("mod_en_in_ndtv_2373245.html.bz2", "NDTV_PROFILE",
         "https://www.ndtv.com/business/"
         "dollar-rises-on-us-recovery-hopes-bitcoin-hits-near-record-52-640-2373245", 41),
    ]

    def test_fixture_sentence_counts(self):
        from newslookout_ray.stages import profiles as prof_mod
        from newslookout_ray.stages.extract import process_fetched_page
        from newslookout_ray.stages.profiles import CompiledProfile

        for fx, prof_name, url, want in self.CASES:
            html = bz2.decompress(
                open(os.path.join(FIXTURE_DIR, fx), "rb").read()
            )
            rec = process_fetched_page(
                CompiledProfile(getattr(prof_mod, prof_name)), url, html
            )
            sents = sentkit.sent_tokenize(rec["text"].lower())
            assert len(sents) == want, fx
            # boundaries partition the text: rejoining loses only the
            # inter-sentence whitespace
            assert sum(len(s) for s in sents) <= len(rec["text"])
            assert all(s.strip() for s in sents)
