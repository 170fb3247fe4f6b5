"""Config-driven plugin enable/priority — the reference's operational
surface over the engine's registry.

The reference reads an INI file whose ``[plugins]`` section lists
enabled plugins as ``pluginNN = <name> | <priority>`` (config.py:
297-325 ``processItemInSection``: keys starting with 'plugin', value
split on '|', quotes stripped, missing/bad priority → 999) and the
queue manager runs data-processing plugins in ascending priority
(queue_manager.py:675-719). This module reproduces that surface:

  * :func:`read_enabled_plugins` — the exact parse semantics;
  * :func:`resolve_profiles`      — site-scraper names → SiteProfile
    registry entries (the crawl side);
  * :func:`resolve_chain`         — data-processing names → processor
    chain entries ordered by the configured priority (the NLP side).

Unknown names are reported, not silently dropped — the reference logs
and skips them at import time.
"""

from __future__ import annotations

import configparser

from .functions.textkit import remove_start_trail_quotes
from .stages.profiles import PROFILES

DEFAULT_PRIORITY = 999

#: data-processing plugin name → DEFAULT_CHAIN stage name
#: (mod_dedupe's marks stage is the near-dedup slot; mod_eventclass is
#: the sentiment slot — mod_eventclass.py / mod_dedupe.py)
PROCESSOR_PLUGINS = {
    "mod_dataprep": "dataprep",
    "mod_keywordflags": "keyword_flags",
    "mod_eventclass": "sentiment",
    "mod_dedupe": "near_dedup",
}


def read_enabled_plugins(path: str) -> dict:
    """{plugin_name: priority} from the INI's [plugins] section,
    matching config.py:297-325: keys starting with 'plugin', value
    ``name | priority``, quote-stripped, bad/missing priority → 999."""
    cp = configparser.ConfigParser(interpolation=None)
    cp.read(path)
    enabled: dict = {}
    if "plugins" not in cp.sections():
        return enabled
    for key, item in cp["plugins"].items():
        if not key.startswith("plugin"):
            continue
        name_priority = remove_start_trail_quotes(item.strip()).split("|")
        plugin_name = name_priority[0].strip()
        priority = DEFAULT_PRIORITY
        if len(name_priority) > 1:
            try:
                priority = int(name_priority[1].strip())
            except (TypeError, ValueError):
                priority = DEFAULT_PRIORITY
        enabled[plugin_name] = priority
    return enabled


def resolve_profiles(enabled: dict):
    """(site profiles for the crawl, unknown names). Site-scraper
    plugins are the ``mod_*`` names present in the profile registry."""
    profiles, unknown = [], []
    for name in enabled:
        if name in PROFILES:
            profiles.append(PROFILES[name])
        elif name not in PROCESSOR_PLUGINS:
            unknown.append(name)
    return profiles, unknown


def resolve_chain(enabled: dict, base_chain=None):
    """Processor chain restricted to the enabled data-processing
    plugins, re-prioritized from the config (ascending priority order,
    queue_manager.py:675-719). Stages absent from the config are
    dropped — the reference only runs enabled plugins."""
    if base_chain is None:
        from .pipelines.processors import DEFAULT_CHAIN as base_chain  # noqa: N806
    by_stage = {name: (stage, kind) for _p, name, stage, kind in base_chain}
    chain = []
    for plugin, prio in enabled.items():
        stage_name = PROCESSOR_PLUGINS.get(plugin)
        if stage_name and stage_name in by_stage:
            stage, kind = by_stage[stage_name]
            chain.append((prio, stage_name, stage, kind))
    return sorted(chain, key=lambda c: c[0])


def load_config(path: str):
    """One-call operational surface: (profiles, chain, unknown)."""
    enabled = read_enabled_plugins(path)
    profiles, unknown = resolve_profiles(enabled)
    return profiles, resolve_chain(enabled), unknown


def decode_secret(encoded_text, key_value=None) -> str:
    """decodeSecret parity (scraper_utils.py:164-174): base64-decode the
    ascii-encoded secret; ``key_value`` is accepted and ignored exactly
    as the reference ignores it; ANY failure (bad padding, non-ascii,
    non-utf8 payload, None input) returns '' instead of raising."""
    import base64

    try:
        return base64.b64decode(encoded_text.encode("ascii")).decode("utf-8")
    except Exception:  # noqa: BLE001 — reference logs and returns ""
        return ""


def save_obj_to_json(json_file_name: str, obj_to_save: dict) -> None:
    """saveObjToJSON parity (scraper_utils.py:177-187): json.dumps with
    default separators, utf-8 text write; exceptions bubble up, as the
    reference documents."""
    import json

    with open(json_file_name, "wt", encoding="utf-8") as fp:
        fp.write(json.dumps(obj_to_save))
