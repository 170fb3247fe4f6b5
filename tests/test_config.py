"""Config-driven plugin enable/priority (config.py:297-325,
queue_manager.py:675-719 operational surface)."""

from __future__ import annotations

import textwrap

from newslookout_ray import config as cfg
from newslookout_ray.stages.profiles import HINDU_PROFILE


def _write(tmp_path, body):
    p = tmp_path / "newslookout.conf"
    p.write_text(textwrap.dedent(body))
    return str(p)


class TestReadEnabledPlugins:
    def test_parse_name_priority(self, tmp_path):
        path = _write(tmp_path, """
            [plugins]
            plugin01 = mod_en_in_hindu | 2
            plugin02 = 'mod_dataprep | 1'
            plugin03 = mod_keywordflags
            plugin04 = mod_dedupe | notanint
            other_key = ignored
        """)
        enabled = cfg.read_enabled_plugins(path)
        assert enabled == {
            "mod_en_in_hindu": 2,
            "mod_dataprep": 1,
            "mod_keywordflags": cfg.DEFAULT_PRIORITY,
            "mod_dedupe": cfg.DEFAULT_PRIORITY,
        }

    def test_no_plugins_section(self, tmp_path):
        path = _write(tmp_path, "[operation]\nx = 1\n")
        assert cfg.read_enabled_plugins(path) == {}


class TestResolve:
    def test_profiles_chain_and_unknown(self, tmp_path):
        path = _write(tmp_path, """
            [plugins]
            plugin01 = mod_en_in_hindu | 2
            plugin02 = mod_dataprep | 3
            plugin03 = mod_keywordflags | 1
            plugin04 = mod_nosuchthing | 5
        """)
        profiles, chain, unknown = cfg.load_config(path)
        assert profiles == [HINDU_PROFILE]
        assert unknown == ["mod_nosuchthing"]
        # chain re-prioritized from config: keyword_flags(1) before dataprep(3)
        assert [c[1] for c in chain] == ["keyword_flags", "dataprep"]
        assert [c[0] for c in chain] == [1, 3]

    def test_disabled_stages_dropped(self, tmp_path):
        path = _write(tmp_path, """
            [plugins]
            plugin01 = mod_dataprep | 1
        """)
        _, chain, _ = cfg.load_config(path)
        assert [c[1] for c in chain] == ["dataprep"]  # no sentiment/dedup


class TestScalarHelpers:
    """§2.9 parity: decodeSecret / saveObjToJSON (scraper_utils.py:164-187)."""

    def test_decode_secret_byte_parity(self):
        import base64

        for secret in ("hunter2", "p@ss wörd ✓", ""):
            enc = base64.b64encode(secret.encode("utf-8")).decode("ascii")
            # reference: encode('ascii') → b64decode → decode('utf-8')
            want = base64.b64decode(enc.encode("ascii")).decode("utf-8")
            assert cfg.decode_secret(enc, key_value="ignored") == want == secret

    def test_decode_secret_failure_returns_empty(self):
        # reference catches ALL errors and returns "" (logs, never raises)
        assert cfg.decode_secret("not-base64!!!") == ""
        assert cfg.decode_secret("café") == ""  # non-ascii input
        assert cfg.decode_secret(None) == ""

    def test_save_obj_to_json_byte_parity(self, tmp_path):
        import json

        obj = {"b": 2, "a": [1, "x", None], "nested": {"k": True}}
        p = tmp_path / "out.json"
        cfg.save_obj_to_json(str(p), obj)
        # reference writes json.dumps(obj) with default separators, utf-8
        assert p.read_text(encoding="utf-8") == json.dumps(obj)
        assert json.loads(p.read_text()) == obj

    def test_save_obj_to_json_raises(self, tmp_path):
        # "lets it bubble up" — unserializable objects raise
        import pytest as _pytest

        with _pytest.raises(TypeError):
            cfg.save_obj_to_json(str(tmp_path / "bad.json"), {"x": object()})
