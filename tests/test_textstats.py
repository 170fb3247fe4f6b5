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


PII_TEXTS = [
    "contact john.doe+spam@example.co.uk or call +1 (415) 555-0199 now",
    "server at 192.168.1.254 logged ssn 123-45-6789 twice",
    "no pii here, just the year 2021 and a 5k run",
    "dotted 10.0.0.1 then phone 0212-555-0134 then bob@x.io",
    "",
]


@pytest.mark.usefixtures("ray_session")
class TestPiiRedact:
    def _run(self, texts):
        import ray.data

        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        return textstats.run_pii_redact(ds).to_pandas().set_index("doc_id")

    def test_counts_and_redaction(self):
        got = self._run(PII_TEXTS)
        assert got.loc[0, "n_email"] == 1
        assert "<EMAIL>" in got.loc[0, "redacted"]
        assert "john.doe" not in got.loc[0, "redacted"]
        assert got.loc[1, "n_ipv4"] == 1
        assert got.loc[1, "n_ssn"] == 1
        assert "<IP>" in got.loc[1, "redacted"]
        assert "<SSN>" in got.loc[1, "redacted"]
        # plain prose: nothing redacted
        assert got.loc[2, "redacted"] == PII_TEXTS[2]
        assert got.loc[2, ["n_email", "n_ssn", "n_ipv4", "n_phone"]].sum() == 0
        assert got.loc[3, "n_email"] == 1
        assert got.loc[3, "n_ipv4"] == 1
        assert got.loc[3, "n_phone"] >= 1
        assert "0212-555-0134" not in got.loc[3, "redacted"]
        assert got.loc[4, "redacted"] == ""

    def test_matches_duckdb_on_pii_fixtures(self):
        """The generated oracle SQL and the Arrow kernel agree on
        REAL PII content (the sf tables carry none, so this is the
        strong cross-engine check)."""
        import duckdb
        import pandas as pd

        from newslookout_ray import api

        got = self._run(PII_TEXTS).reset_index()
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame({"doc_id": range(len(PII_TEXTS)), "text": PII_TEXTS}),
        )
        want = con.execute(api.oracle_sql()["pii_redact"]).df()
        got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
        want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False
        )


@pytest.mark.usefixtures("ray_session")
class TestRepetition:
    def test_against_python(self):
        import ray.data

        texts = [
            "a b c a b c a b c",        # 7 grams, 3 distinct
            "x y z w",                   # 2 grams, 2 distinct
            "one two",                   # <3 tokens -> 0
            "",
            "t t t t t",                 # 3 grams, 1 distinct
        ]
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        got = textstats.run_repetition(ds).to_pandas().set_index("doc_id")
        for i, t in enumerate(texts):
            toks = t.split(" ")
            grams = [
                " ".join(toks[j : j + 3]) for j in range(max(len(toks) - 2, 0))
            ]
            n, d = len(grams), len(set(grams))
            assert got.loc[i, "n_ngrams"] == n, t
            assert got.loc[i, "n_distinct"] == d, t
            assert got.loc[i, "dup_ppm"] == ((n - d) * 1_000_000 // n if n else 0), t


@pytest.mark.usefixtures("ray_session")
class TestTermTopk:
    def test_counts_rank_and_ties(self):
        import collections

        import ray.data

        texts = [
            "apple banana apple cherry",
            "banana apple  date",  # double space -> empty token dropped
            "cherry cherry banana",
        ]
        ds = ray.data.from_items([{"text": t} for t in texts])
        got = textstats.term_topk(ds, k=3)
        counts = collections.Counter(
            tok for t in texts for tok in t.split(" ") if tok
        )
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert list(got["term"]) == [t for t, _ in want]
        assert list(got["n"]) == [n for _, n in want]
        assert list(got["rank"]) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestBoilerplateNgrams:
    TEXTS = [
        "all rights reserved contact us today " + "alpha beta gamma delta epsilon",
        "all rights reserved contact us today " + "zeta eta theta iota kappa",
        "completely unique words nothing shared here at all ever once",
        "tiny",  # <5 tokens -> dropped (no grams)
    ]

    def _python_truth(self, texts, n=5, min_df=2):
        import collections

        per_doc = []
        for t in texts:
            toks = t.split(" ")
            grams = {
                " ".join(toks[j : j + n]) for j in range(max(len(toks) - n + 1, 0))
            }
            per_doc.append(grams)
        df = collections.Counter(g for grams in per_doc for g in grams)
        out = {}
        for i, grams in enumerate(per_doc):
            if not grams:
                continue
            nb = sum(1 for g in grams if df[g] >= min_df)
            out[i] = (len(grams), nb, nb * 1_000_000 // len(grams))
        return out

    def _check(self, got):
        want = self._python_truth(self.TEXTS)
        got = got.to_pandas().set_index("doc_id").sort_index()
        assert set(got.index) == set(want)
        for i, (nd, nb, ppm) in want.items():
            assert got.loc[i, "n_distinct"] == nd
            assert got.loc[i, "n_boiler"] == nb
            assert got.loc[i, "boiler_ppm"] == ppm

    def _ds(self):
        import ray.data

        return ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(self.TEXTS)]
        )

    def test_broadcast_path(self):
        from newslookout_ray.pipelines import textstats as ts

        self._check(ts.boilerplate_ngrams(self._ds(), n=5, min_df=2))

    def test_join_path_matches(self):
        from newslookout_ray.pipelines import textstats as ts

        self._check(
            ts.boilerplate_ngrams(self._ds(), n=5, min_df=2, broadcast_limit=0)
        )


@pytest.mark.usefixtures("ray_session")
class TestFingerprintGolden:
    def test_sf0001_content_hash_pinned(self):
        """fingerprint is deterministic (rolling polynomial hash), just
        not SQL-expressible — so the driver's check is rows-only. This
        pin turns "returns rows" into "returns the SAME rows": any
        silent drift in the hash math fails here."""
        from newslookout_ray import api

        from _golden import canon_hash

        got = api.queries()["fingerprint"]("/root/testdata/sf0.001").to_pandas()
        assert canon_hash(got) == "3605c37d5e833ac6"
