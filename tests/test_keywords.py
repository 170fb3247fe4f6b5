"""T12: deterministic tf-keyword ranking (newspaper nlp.keywords analogue)."""

from __future__ import annotations

from newslookout_ray.functions import keywords as kw


class TestSplitWords:
    def test_strips_specials_and_lowercases(self):
        assert kw.split_words("Hello, World! It's 2021.") == [
            "hello", "world", "its", "2021"
        ]

    def test_empty(self):
        assert kw.split_words("") == []
        assert kw.split_words(None) == []


class TestKeywordScores:
    def test_tf_ranking_and_formula(self):
        text = "market market market rally rally bank the the a of"
        scores = kw.keyword_scores(text)
        # num_words counted BEFORE stopword filter = 10
        assert set(scores) == {"market", "rally", "bank"}
        assert abs(scores["market"] - (3 / 10 * 1.5 + 1)) < 1e-12
        assert abs(scores["bank"] - (1 / 10 * 1.5 + 1)) < 1e-12
        # ranking order: count desc, then token desc
        assert list(scores) == ["market", "rally", "bank"]

    def test_tie_breaks_lexicographically_descending(self):
        scores = kw.keyword_scores("zebra apple zebra apple mango")
        assert list(scores)[:2] == ["zebra", "apple"]  # tie on 2 → 'z' first

    def test_top_n_cap(self):
        text = " ".join(f"tok{i}" for i in range(50))
        assert len(kw.keyword_scores(text)) == kw.NUM_KEYWORDS

    def test_stopwords_excluded(self):
        assert kw.keyword_scores("the and of to in") == {}


class TestArticleKeywords:
    def test_title_first_then_text_first_occurrence(self):
        out = kw.article_keywords("Banks rally", "The rally continues in banks today")
        assert out[0] in ("banks", "rally")  # title ranking leads
        assert out == kw.article_keywords("Banks rally", "The rally continues in banks today")
        assert len(out) == len(set(out))

    def test_deterministic_across_calls(self):
        t, x = "Strike at the plant", "Workers strike again. Strike disrupts output."
        assert kw.article_keywords(t, x) == kw.article_keywords(t, x)


class TestMergeKeywords:
    def test_reference_concatenation_order(self):
        merged = kw.merge_keywords(["alpha", "beta"], ["beta", "gamma", " alpha ", ""])
        assert merged == ["alpha", "beta", "gamma"]
