"""Test-time oracle: execute selected PURE functions from the read-only
reference checkout (/root/reference) to compare outputs byte-for-byte.

The reference modules import heavy scraping deps (nltk, tld, bs4,
newspaper, requests adapters) that are absent in this sandbox and
irrelevant to the pure text kernels, so we exec the reference source
inside a namespace with stub modules injected. This file is test
infrastructure only — no engine code imports it, and no reference code
is copied into the engine.
"""

from __future__ import annotations

import ast
import sys
import types
from pathlib import Path

REF = Path("/root/reference/src/newslookout")


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs():
    """Inject stub modules for the reference's heavy imports (idempotent)."""
    if "tld" not in sys.modules or not getattr(sys.modules["tld"], "_is_oracle_stub", False):
        tld = _stub_module("tld", get_tld=lambda *a, **k: None)
        tld._is_oracle_stub = True
        sys.modules["tld"] = tld
    if "bs4" not in sys.modules:
        sys.modules["bs4"] = _stub_module("bs4", BeautifulSoup=object)
    if "nltk" not in sys.modules:
        nltk = _stub_module("nltk")
        nltk.data = _stub_module("nltk.data", find=lambda *a, **k: None)
        nltk.download = lambda *a, **k: True
        sys.modules["nltk"] = nltk


_scraper_utils_ns = None


def reference_scraper_utils():
    """Exec the whole reference scraper_utils.py with stubbed imports and
    return its namespace (pure functions only are safe to call)."""
    global _scraper_utils_ns
    if _scraper_utils_ns is None:
        _install_stubs()
        src = (REF / "scraper_utils.py").read_text(encoding="utf-8")
        ns = {"__name__": "reference_scraper_utils"}
        exec(compile(src, str(REF / "scraper_utils.py"), "exec"), ns)
        _scraper_utils_ns = ns
    return _scraper_utils_ns


_clean_text_fn = None


def reference_clean_text():
    """Extract and exec only NewsEvent.cleanText from news_event.py.

    news_event.py imports newspaper/other plugins at module level; we lift
    just the @staticmethod cleanText function body via AST so the oracle
    stays faithful to the reference source without importing the module.
    """
    global _clean_text_fn
    if _clean_text_fn is None:
        su = reference_scraper_utils()
        src = (REF / "news_event.py").read_text(encoding="utf-8")
        tree = ast.parse(src)
        fn_node = None
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef) and node.name == "NewsEvent":
                for item in node.body:
                    if isinstance(item, ast.FunctionDef) and item.name == "cleanText":
                        fn_node = item
        assert fn_node is not None, "cleanText not found in reference news_event.py"
        fn_node.decorator_list = []
        mod = ast.Module(body=[fn_node], type_ignores=[])
        ast.fix_missing_locations(mod)
        import logging

        ns = {
            "scraper_utils": types.SimpleNamespace(clean_non_utf8=su["clean_non_utf8"]),
            "fixSentenceGaps": su["fixSentenceGaps"],
            "logger": logging.getLogger("reference_oracle"),
        }
        exec(compile(mod, "<reference news_event.cleanText>", "exec"), ns)
        _clean_text_fn = ns["cleanText"]
    return _clean_text_fn


_flag_regex = None


def reference_keyword_flag_regex():
    """Lift the keyword_flag_regex dict literal from mod_keywordflags.py."""
    global _flag_regex
    if _flag_regex is None:
        src = (REF / "plugins" / "mod_keywordflags.py").read_text(encoding="utf-8")
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef) and node.name == "mod_keywordflags":
                for item in node.body:
                    if isinstance(item, ast.Assign) and any(
                        getattr(t, "id", None) == "keyword_flag_regex" for t in item.targets
                    ):
                        expr = ast.Expression(item.value)
                        ast.fix_missing_locations(expr)
                        # the dict literal uses r'..' + r'..' concatenation,
                        # which literal_eval rejects — eval with empty globals
                        _flag_regex = eval(compile(expr, "<flags>", "eval"), {})
        assert _flag_regex is not None
    return _flag_regex
