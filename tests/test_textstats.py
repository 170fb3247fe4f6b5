"""Text-stats operators vs straightforward Python reimplementations."""

from __future__ import annotations

import re

import pytest

from newslookout_ray.pipelines import textstats

TEXTS = [
    "the quick brown fox",
    "  padded   with   spaces  ",
    "",
    "digits 123 and symbols !!! here",
    "le chat et la souris est dans le jardin",
    "der hund ist nicht mit das auto",
    "singleword",
]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t, "lang": "xx"} for i, t in enumerate(TEXTS)]
    )


@pytest.mark.usefixtures("ray_session")
class TestTokenCount:
    def test_matches_python_re(self, docs_ds):
        got = textstats.run_token_count(docs_ds).to_pandas().set_index("doc_id")
        for i, t in enumerate(TEXTS):
            ws = 0 if not t.strip() else len(re.split(r"\s+", t.strip()))
            bpe = len(re.findall(textstats.BPE_TOKEN_PATTERN, t))
            assert got.loc[i, "n_ws_tokens"] == ws, t
            assert got.loc[i, "n_bpe_tokens"] == bpe, t


@pytest.mark.usefixtures("ray_session")
class TestQuality:
    def test_score_formula(self, docs_ds):
        got = textstats.run_quality(docs_ds).to_pandas().set_index("doc_id")
        for i, t in enumerate(TEXTS):
            n_chars = len(t)
            digits = len(re.findall(r"[0-9]", t))
            symbols = len(re.findall(r"[^A-Za-z0-9\s]", t))
            ws = 0 if not t.strip() else len(re.split(r"\s+", t.strip()))
            expect = max(
                0,
                min(
                    100,
                    60 + min(ws, 200) // 5
                    - digits * 100 // max(n_chars, 1)
                    - symbols * 100 // max(n_chars, 1),
                ),
            )
            assert got.loc[i, "quality"] == expect, t


@pytest.mark.usefixtures("ray_session")
class TestLangId:
    def test_predictions(self, docs_ds):
        got = textstats.run_lang_id(docs_ds).to_pandas().set_index("doc_id")["predicted_lang"]
        assert got[0] == "en"
        assert got[4] == "fr"
        assert got[5] == "de"
        assert got[6] == "und"  # no stopword hits


@pytest.mark.usefixtures("ray_session")
class TestFingerprint:
    def test_deterministic_and_distinct(self, docs_ds):
        a = textstats.run_fingerprint(docs_ds).to_pandas().set_index("doc_id")["fingerprint"].sort_index()
        b = textstats.run_fingerprint(docs_ds).to_pandas().set_index("doc_id")["fingerprint"].sort_index()
        assert (a == b).all()
        assert a[0] != a[3]
        assert a[2] == 0  # empty text
