"""S6 (GDELT zipped-TSV ingestion) and S7 (zip archive expander) tests —
S6 runs against the reference's own fixture archive."""

from __future__ import annotations

import io
import os
import zipfile

import pandas as pd
import pytest

from newslookout_ray.sources import archives as ar

GDELT_FIXTURE = "/root/reference/test-data/mod_in_gdelt_20210203.zip"


class TestGdeltKernel:
    def test_fixture_matches_reference_semantics(self):
        """Same rows the reference's pandas flow keeps: col 51 == 'IN',
        col 57 stripped, first-occurrence deduped."""
        with open(GDELT_FIXTURE, "rb") as fh:
            payload = fh.read()
        got = ar.extract_urls_from_gdelt_zip(payload, "IN")

        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            df = pd.read_csv(
                io.BytesIO(zf.read(zf.namelist()[0])),
                delimiter="\t", header=None, low_memory=False,
            )
        want_all = [u.strip() for u in df[df.iloc[:, 51] == "IN"].iloc[:, 57].values]
        want, seen = [], set()
        for u in want_all:
            if u not in seen:
                seen.add(u)
                want.append(u)
        assert got == want
        assert len(got) == 215  # fixture ground truth

    def test_other_country_code(self):
        with open(GDELT_FIXTURE, "rb") as fh:
            payload = fh.read()
        us = ar.extract_urls_from_gdelt_zip(payload, "US")
        assert us and us != ar.extract_urls_from_gdelt_zip(payload, "IN")


@pytest.mark.usefixtures("ray_session")
class TestGdeltPipeline:
    def test_distributed_matches_kernel_order(self):
        with open(GDELT_FIXTURE, "rb") as fh:
            payload = fh.read()
        want = ar.extract_urls_from_gdelt_zip(payload, "IN")
        got = ar.gdelt_urls([GDELT_FIXTURE, GDELT_FIXTURE], "IN").to_pandas()
        # duplicate archive contributes nothing new; order = first appearance
        assert got["url"].tolist() == want


def _nse_zip(tmp_path) -> str:
    announce = (
        "HEADER LINE\n"
        "Some Company Ltd  SYMB1  : won a contract for road works\n"
        "Another Corp  SYMB2  : approved the merger\n"
        "continuation line without colon marker\n"
        "Nav Fund  SYMB3  : declaration of nav of the scheme\n"
        "Weird line without separator\n"
    )
    path = os.path.join(tmp_path, "PR020321.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("An020321.txt", announce)
        zf.writestr("Bm020321.csv", "a,b\n1,2\n")
        zf.writestr("Bc020321.csv", "c,d\n3,4\n")
        zf.writestr("Pd020321.csv", "e,f\n5,6\n")
        zf.writestr("corpbond020321.csv", "g\n7\n")
        zf.writestr("Xx020321.dat", "opaque")
        zf.writestr("Readme.txt", "do not extract me")
    return path


class TestNseExpander:
    def test_prefix_rename_map(self):
        assert ar.nse_member_filename("An020321.txt", "2021-03-02", "m") == "equity_nse_announce_2021-03-02.txt"
        assert ar.nse_member_filename("Bm020321.csv", "2021-03-02", "m") == "equity_nse_boardmeet_2021-03-02.csv"
        assert ar.nse_member_filename("Bc020321.csv", "2021-03-02", "m") == "equity_nse_corp_action_2021-03-02.csv"
        assert ar.nse_member_filename("Pd020321.csv", "2021-03-02", "m") == "equity_nse_2021-03-02.csv"
        assert ar.nse_member_filename("corpbond1.csv", "2021-03-02", "m") == "debt_nse_2021-03-02.csv"
        assert ar.nse_member_filename("Xx1.dat", "2021-03-02", "mod") == "mod_Xx1.dat"

    def test_expand_and_parse(self, tmp_path):
        path = _nse_zip(str(tmp_path))
        with open(path, "rb") as fh:
            payload = fh.read()
        out_dir = os.path.join(str(tmp_path), "out")
        written, recs, size = ar.expand_zip_archive(
            payload, out_dir, "2021-03-02", "https://x/PR020321.zip"
        )
        names = {os.path.basename(w) for w in written}
        assert "equity_nse_announce_2021-03-02.txt" in names
        assert "debt_nse_2021-03-02.csv" in names
        assert not any("Readme" in n for n in names)
        assert size > 0
        # announcement parsing: header skipped, excluded phrase skipped,
        # continuation line joined, prefix regex applied
        assert [r["unique_id"] for r in recs] == ["SYMB1", "SYMB2"]
        assert recs[0]["title"] == "NSE Announcement for Some Company Ltd"
        assert recs[0]["industries"] == ["SYMB1"]
        assert "continuation line" in recs[1]["text"]
        # idempotent re-expand: files untouched, same records
        mtimes = {w: os.path.getmtime(w) for w in written}
        _, recs2, size2 = ar.expand_zip_archive(
            payload, out_dir, "2021-03-02", "https://x/PR020321.zip"
        )
        assert [r["unique_id"] for r in recs2] == ["SYMB1", "SYMB2"]
        assert size2 == 0  # nothing rewritten
        assert all(os.path.getmtime(w) == m for w, m in mtimes.items())


class TestBseVariant:
    def test_unique_id_from_url_matches_reference(self):
        # the reference's own assert (test_mod_in_bse.py:109-114)
        url = "https://www.bseindia.com/download/BhavCopy/Equity/EQ_ISINCODE_140520.zip"
        date, uid = ar.bhavcopy_unique_id_from_url(url, module="mod_in_bse")
        assert uid == "140520"
        assert (date.year, date.month, date.day) == (2020, 5, 14)
        # NSE pattern variant (mod_in_nse.py:87)
        date, uid = ar.bhavcopy_unique_id_from_url(
            "https://www1.nseindia.com/archives/equities/bhavcopy/pr/PR020321.zip",
            module="mod_in_nse",
        )
        assert uid == "020321" and date.day == 2 and date.month == 3

    def test_unique_id_fallback_is_todays_ddmmyy(self):
        import datetime

        now = datetime.datetime(2021, 6, 10)
        date, uid = ar.bhavcopy_unique_id_from_url(
            "https://other.example.com/x.zip", module="mod_in_bse", now=now
        )
        assert date is None and uid == "100621"

    def test_member_rename_and_expand(self, tmp_path):
        assert (
            ar.bse_member_filename("EQ_ISINCODE_140520.CSV", "2020-05-14", "mod_in_bse")
            == "equity_bse_2020-05-14.csv"
        )
        assert (
            ar.bse_member_filename("notes.txt", "2020-05-14", "mod_in_bse")
            == "mod_in_bse_notes.txt"
        )
        path = os.path.join(str(tmp_path), "EQ_ISINCODE_140520.zip")
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("EQ_ISINCODE_140520.CSV", "SC_CODE,ISIN\n1,INE1\n")
            zf.writestr("Readme.txt", "skip me")
        with open(path, "rb") as fh:
            payload = fh.read()
        out_dir = os.path.join(str(tmp_path), "out")
        written, recs, size = ar.expand_zip_archive(
            payload, out_dir, "2020-05-14", "https://x/EQ.zip", module="mod_in_bse"
        )
        names = {os.path.basename(w) for w in written}
        assert names == {"equity_bse_2020-05-14.csv"}
        assert recs == [] and size > 0

    def test_business_day_urls_bse_template(self):
        import datetime

        from newslookout_ray.sources.feeds import business_day_urls

        urls = business_day_urls(
            "https://www.bseindia.com/download/BhavCopy/Equity/EQ_ISINCODE_%d%m%y.zip",
            datetime.date(2021, 6, 10),
            3,
        )
        assert all(u.startswith("https://www.bseindia.com/download/") for u in urls)
        # round-trips through the id extractor
        for u in urls:
            date, uid = ar.bhavcopy_unique_id_from_url(u, module="mod_in_bse")
            assert date is not None and u.endswith(uid + ".zip")


@pytest.mark.usefixtures("ray_session")
class TestNsePipeline:
    def test_expand_archives_dataset(self, tmp_path):
        path = _nse_zip(str(tmp_path))
        out = ar.expand_archives(
            [{"path": path, "publish_date_str": "2021-03-02", "url": "https://x/PR020321.zip"}],
            os.path.join(str(tmp_path), "root"),
        ).to_pandas()
        assert out["unique_id"].tolist() == ["SYMB1", "SYMB2"]
        assert os.path.isfile(
            os.path.join(str(tmp_path), "root", "2021-03-02", "equity_nse_2021-03-02.csv")
        )


@pytest.mark.usefixtures("ray_session")
class TestMasterData:
    def test_load_and_broadcast_lookup(self, tmp_path):
        """S8: per-file broadcast side tables + per-worker cached lookup
        used inside a map_batches enrichment (no shuffle join)."""
        import ray
        import ray.data

        mdir = str(tmp_path / "master")
        os.makedirs(mdir)
        with open(os.path.join(mdir, "mod_in_nse_EQUITY_L.csv"), "w") as fh:
            fh.write("SYMBOL,COMPANY\nSYMB1,First Co\nSYMB2,Second Co\n")
        with open(os.path.join(mdir, "mod_in_nse_namechange.csv"), "w") as fh:
            fh.write("OLD,NEW\nSYMB0,SYMB1\n")
        refs = ar.load_master_data(mdir)
        assert set(refs) == {"mod_in_nse_EQUITY_L", "mod_in_nse_namechange"}

        eq_ref = refs["mod_in_nse_EQUITY_L"]

        def enrich(batch):
            import pyarrow as pa

            names = ar.master_lookup(eq_ref, "SYMBOL", "COMPANY")
            col = pa.array([names.get(s, "") for s in batch["sym"].to_pylist()])
            return batch.append_column("company", col)

        out = (
            ray.data.from_items([{"sym": "SYMB2"}, {"sym": "SYMB1"}, {"sym": "NOPE"}])
            .map_batches(enrich, batch_format="pyarrow")
            .to_pandas()
            .sort_values("sym")
        )
        assert out["company"].tolist() == ["", "First Co", "Second Co"]
