"""Text-cleaning kernels with byte-exact reference semantics.

Reimplements (from scratch, semantics verified by test-time comparison
against the reference source) the text operators that define the
"byte-identical extracted text per url" contract:

  T1 clean_non_utf8          — reference scraper_utils.py:132-151
  T2 clean_text              — reference news_event.py:259-314 (NewsEvent.cleanText)
  T3 fix_sentence_gaps       — reference scraper_utils.py:259-282
  T4 filter_repeated_chars   — reference scraper_utils.py:285-297
  T5 remove_start_trail_quotes — reference scraper_utils.py:154-161
  T6 cut_str_between_tags    — reference scraper_utils.py:300-312
  T13 keyword flags          — reference plugins/mod_keywordflags.py:57-133
  U8 dedupe_list             — reference scraper_utils.py:234-245
  U13 crc32_hex              — reference scraper_utils.py:531-550

Each scalar function is the exact per-string semantics; the ``*_arrow``
wrappers are vectorized pyarrow.compute equivalents for use in
``map_batches(batch_format="pyarrow")`` hot paths. Equivalence between
the scalar and vectorized forms is property-tested (tests/test_textkit.py).
"""

from __future__ import annotations

import re
import zlib
from collections import OrderedDict

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# T1 — clean_non_utf8
# ---------------------------------------------------------------------------


def clean_non_utf8(input_text) -> str:
    """bytes → str via utf-8 errors='replace'; str → encode/decode scrub.

    Exact semantics of reference scraper_utils.py:132-151 (None → '').
    """
    if input_text is None:
        return ""
    if isinstance(input_text, bytes):
        return input_text.decode("utf-8", errors="replace")
    if isinstance(input_text, str):
        return input_text.encode("utf-8", errors="replace").decode("utf-8", errors="replace")
    return str(input_text)


# ---------------------------------------------------------------------------
# T3 — fix_sentence_gaps
# ---------------------------------------------------------------------------

_SENTENCE_GAP_RE = re.compile(r"(\b[a-zA-Z]{2,})(\.)([A-Z][a-zA-Z])")
# RE2-compatible form of the same pattern for pyarrow / DuckDB replication.
SENTENCE_GAP_PATTERN = r"(\b[a-zA-Z]{2,})(\.)([A-Z][a-zA-Z])"


def fix_sentence_gaps(input_text: str) -> str:
    """Insert a space after a full stop that glues two sentences together.

    Exact semantics of reference scraper_utils.py:259-282: non-overlapping
    global substitution of ``(\\b[a-zA-Z]{2,})(\\.)([A-Z][a-zA-Z])`` with
    ``\\1\\2 \\3``.
    """
    return _SENTENCE_GAP_RE.sub(lambda m: m.group(1) + m.group(2) + " " + m.group(3), input_text)


# ---------------------------------------------------------------------------
# T4 — filter_repeated_chars
# ---------------------------------------------------------------------------

#: The char list the reference passes at its only production call site
#: (mod_en_in_ecotimes.py:778, identical in every content plugin).
REPEAT_CHAR_LIST = [" ", "\t", "\n", "\r\n", "-", "_", "."]


def filter_repeated_chars(base_text: str, char_list=None) -> str:
    """Collapse runs of each (possibly multi-char) token in ``char_list``.

    Exact while-loop semantics of reference scraper_utils.py:285-297:
    for each token, repeatedly replace doubled occurrences until none
    remain, in list order. (Equivalent to collapsing maximal runs; the
    loop form is kept as the semantic definition, the vectorized Arrow
    form below uses the proven-equivalent regex.)
    """
    if char_list is None:
        char_list = REPEAT_CHAR_LIST
    clean = base_text
    for single in char_list:
        doubled = single + single
        while clean.find(doubled) > -1:
            clean = clean.replace(doubled, single)
    return clean


# ---------------------------------------------------------------------------
# T5 / T6
# ---------------------------------------------------------------------------


def remove_start_trail_quotes(text_string: str) -> str:
    """Strip double quotes, then single quotes (reference scraper_utils.py:154-161)."""
    return text_string.strip('"').strip("'")


def cut_str_between_tags(source_str: str, start_tag: str, end_tag: str) -> str:
    """Substring strictly between the first start_tag and the next end_tag.

    Exact semantics of reference scraper_utils.py:300-312 ('' when either
    tag is absent).
    """
    raw_pos = source_str.find(start_tag)
    if raw_pos > -1:
        snipped = source_str[raw_pos + len(start_tag):]
        end_pos = snipped.find(end_tag)
        if end_pos > -1:
            return snipped[:end_pos]
    return ""


# ---------------------------------------------------------------------------
# T2 — clean_text (NewsEvent.cleanText)
# ---------------------------------------------------------------------------

#: Phase 1: tokens replaced by a single space (order matters: the 3-byte
#: mojibake 'â€™' is consumed before the bare 'â').
#: Data table transcribed from reference news_event.py:265-268.
CLEAN_REPLACE_WITH_SPACE_1 = ["â€™", "🙂", "â", "™", "\t"]

#: Phase 2: ordered (old, new) pairs, reference news_event.py:270-289.
#: Several entries repeat the same codepoint via its escape — kept verbatim
#: (the duplicates are no-ops but the order is part of the contract).
CLEAN_REPLACE_PAIRS = [
    (" Addl. ", " Additional "),
    (" M/s.", " Messers"),
    (" m/s.", " Messers"),
    (" Rs.", " Rupees "),
    ("₹", " Rupees "),
    ("$", " Dollars "),
    ("€", " Euros "),
    ("—", "-"),
    ("—", "-"),
    ("–", "-"),
    ("–", "-"),
    ("’", "'"),
    ("’", "'"),
    ("‘", "'"),
    ("‘", "'"),
    ("”", "'"),
    ("”", "'"),
    ("“", "'"),
    ("“", "'"),
    ("​", "'"),  # zero-width space — reference replaces it with a quote
]

#: Phase 3: chars replaced by a single space after the utf-8 scrub
#: (Devanagari chars + stray control bytes), reference news_event.py:294-299.
CLEAN_REPLACE_WITH_SPACE_2 = [
    "क", "य", "स", "च", "ु", "ा", "आ",
    "ब", "ा", "ं", "ग", "थ", "म", "ण",
    "र", "ई", "द", "ल", "अ", "भ", "त",
    "स", "प", "त", "उ", "ज", "ो", "ी",
    "​", "\U0001f642", "\x93", "\x94", "\x81", "\xe0", "\xaa", "\x9c",
]


def clean_text(text_input: str) -> str:
    """Byte-exact reimplementation of NewsEvent.cleanText (news_event.py:259-314).

    Pass-through when input is None or has length <= 1. Note: phase 1+2
    run before the utf-8 scrub, phase 3 + fix_sentence_gaps + strip after.
    """
    if text_input is None or len(text_input) <= 1:
        return text_input
    clean = text_input
    for tok in CLEAN_REPLACE_WITH_SPACE_1:
        clean = clean.replace(tok, " ")
    for old, new in CLEAN_REPLACE_PAIRS:
        clean = clean.replace(old, new)
    clean = clean_non_utf8(clean)
    for tok in CLEAN_REPLACE_WITH_SPACE_2:
        clean = clean.replace(tok, " ")
    clean = fix_sentence_gaps(clean)
    return clean.strip()


# ---------------------------------------------------------------------------
# U8 — dedupe_list / U13 — crc32_hex
# ---------------------------------------------------------------------------


def dedupe_list(input_list):
    """Order-preserving exact dedup (reference scraper_utils.py:234-245)."""
    if type(input_list) == list:  # noqa: E721  — reference checks exact type
        return list(OrderedDict.fromkeys(input_list))
    return input_list


def crc32_hex(text) -> str:
    """zlib CRC32 as ``hex()`` string, reference scraper_utils.py:531-550.

    str is encoded UTF-8 with errors='ignore'; None → "0".
    """
    if text is None:
        return "0"
    if isinstance(text, str):
        data = text.encode("UTF-8", errors="ignore")
    elif isinstance(text, bytes):
        data = text
    else:
        data = str(text).encode("UTF-8")
    return hex(zlib.crc32(data) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# T13 — keyword trigger-word flags
# ---------------------------------------------------------------------------

#: The 20 fixed flag regexes, transcribed as data from reference
#: plugins/mod_keywordflags.py:57-91 (they define WHAT to match; matching
#: is re.search over the lowercased article text → 0/1 per flag,
#: mod_keywordflags.py:124-133). RE2-compatible (no backrefs/lookarounds),
#: so the same patterns drive the DuckDB oracle SQL.
KEYWORD_FLAG_REGEX = {
    "FLAG_EVENT_STRIKE": (
        r"((labo[u]*r|employee.+)[ \-]+(strike|unrest|protest|.+disrupt|.+stay away)"
        r"|strike.+violen|violen.+strike|(man.*power|union).+problem|recalcitrant labo[u]*r|"
        r"accident.+fine|union.+petition)"
    ),
    "FLAG_EVENT_LAYOFFS": r"(employee (attrition|problem)|attrition.+employee|lay[ \-]*off)",
    "FLAG_EVENT_DIR_CHNG": r"(director.+[ \-]*appoint|appoint.+director|change of director|director change)",
    "FLAG_EVENT_FINE": r"(fined|fine of|impose.+fine|(fine|penalty).+impose)",
    "FLAG_EVENT_RESIGN": (
        r"(director.+(quit|resign|step.+down|withdraw|retire|stand aside|bow out|cessation)|"
        r"withdraw.+director)"
    ),
    "FLAG_EVENT_CUSTSATISFY": r"(customer.+dis[\-]*satisf)",
    "FLAG_EVENT_REGULATION": (
        r"(regulatory (impact|change)|impact of regula|duty.+(hike|increase)|"
        r"(hike|increase).+(duty|tax))"
    ),
    "FLAG_EVENT_OBSOLETE": r"(obsolete product|obsolescence|outdate.+product|product.+(outdate|obsolete))",
    "FLAG_EVENT_FRAUD": (
        r"(fraud|funds.+(diver|siphon)|suspect.+fraud|swindl|(diver|siphon).+fund|"
        r"fraud.+audit|money launder|red flag.+acc|audit.+suspect|forensic audit)"
    ),
    "FLAG_EVENT_TAXRAID": (
        r"((notice|raid|penalty|sanction|puni|forfeit|trial|sentence).+"
        r"(authorit|government|court|regulat)|(authorit|government|court).+"
        r"(sanction|puni|penalty|fine|))"
    ),
    "FLAG_EVENT_LATEPAY": r"(delay.+(payment|dues|statutary)|(pay.+statutary))",
    "FLAG_EVENT_CUSTLOSS": r"(los[set].+customer|customer.+cancel)",
    "FLAG_EVENT_NONCORE": (
        r"(business.+expan.+[non\- core]{1,}|diversif.+non[\- ]core|incorporat|"
        r"acqui[resition]{2,}|merge|joint venture|organic grow|key opportunit|"
        r"(additional|unforeseen) cost|recall|ban order|diversif.+business)"
    ),
    "FLAG_EVENT_DISPUTE": (
        r"(promoter.+(dispute|disagree|feud|conflict)|(dispute|conflict|feud).+"
        r"(promoter|management|director|partner)|infight)"
    ),
    "FLAG_EVENT_PRODREJECT": (
        r"(consignment.+reject|product.+reject|brand value.+(diminish|low|reduc)|"
        r"withdraw.+(product|good))"
    ),
    "FLAG_EVENT_AUDITRESIGN": r"((replace|change|in place of).+audit|auditor.+(change))",
    "FLAG_EVENT_SPONSWTHDR": (
        r"(funds.+(decline|withdraw)|(not have|no longer|has no).+funds|disinvest|"
        r"withdraw.+from.+project|delay [ofin]{2}.+subsidy|subsidy.+stop)"
    ),
    "FLAG_EVENT_YOYCAPDEC": r"(low capacity utili|capacity expansion.+(hold|stop))",
    "FLAG_EVENT_UTILDISRUPT": (
        r"((water|electric|power|utility).+(violation|disrupt|los[st])|"
        r"pollution control|los[st].+(water|electric|power|utility))"
    ),
    "FLAG_EVENT_PROMOTPERSLOAN": r"(promoter|director|founder|partner).+(personal loan)",
}

_COMPILED_FLAGS = None


def _compiled_flags():
    global _COMPILED_FLAGS
    if _COMPILED_FLAGS is None:
        _COMPILED_FLAGS = {k: re.compile(v.strip()) for k, v in KEYWORD_FLAG_REGEX.items()}
    return _COMPILED_FLAGS


def keyword_flags(text: str) -> dict:
    """0/1 flag per trigger-word regex, searched in lowercased text.

    Exact semantics of reference mod_keywordflags.identifyTriggerWordFlags
    (mod_keywordflags.py:124-133).
    """
    lowered = text.lower()
    return {k: (1 if pat.search(lowered) else 0) for k, pat in _compiled_flags().items()}


# ---------------------------------------------------------------------------
# Vectorized Arrow forms (hot-path equivalents, property-tested vs scalars)
# ---------------------------------------------------------------------------


#: Exactly the character set Python's str.strip() removes (ch.isspace()),
#: so the Arrow trim matches the scalar clean_text's final .strip().
_PY_STRIP_WHITESPACE = "".join(chr(i) for i in range(0x3001) if chr(i).isspace())


def _escape_rx(tok: str) -> str:
    return re.escape(tok)


def fix_sentence_gaps_arrow(arr: pa.Array) -> pa.Array:
    """Vectorized T3 over a string array (RE2 global replace, \\1-rewrites)."""
    return pc.replace_substring_regex(
        arr, pattern=SENTENCE_GAP_PATTERN, replacement=r"\1\2 \3"
    )


def filter_repeated_chars_arrow(arr: pa.Array, char_list=None) -> pa.Array:
    """Vectorized T4: collapse maximal runs of each token, in list order."""
    if char_list is None:
        char_list = REPEAT_CHAR_LIST
    out = arr
    for tok in char_list:
        out = pc.replace_substring_regex(
            out, pattern="(?:%s){2,}" % _escape_rx(tok), replacement=tok
        )
    return out


def clean_text_arrow(arr: pa.Array) -> pa.Array:
    """Vectorized T2 over a string array.

    Arrow string arrays are valid UTF-8 by construction, so the
    clean_non_utf8 phase is an identity here (the scalar path proves
    this: encode/decode of a valid str is a no-op). The length<=1
    pass-through of the scalar form is restored at the end.
    """
    if pa.types.is_null(arr.type):
        # an all-null block infers as null type; string kernels reject it
        return arr.cast(pa.string())
    out = arr
    for tok in CLEAN_REPLACE_WITH_SPACE_1:
        out = pc.replace_substring(out, pattern=tok, replacement=" ")
    for old, new in CLEAN_REPLACE_PAIRS:
        out = pc.replace_substring(out, pattern=old, replacement=new)
    for tok in CLEAN_REPLACE_WITH_SPACE_2:
        out = pc.replace_substring(out, pattern=tok, replacement=" ")
    out = fix_sentence_gaps_arrow(out)
    out = pc.utf8_trim(out, characters=_PY_STRIP_WHITESPACE)
    # restore pass-through for len<=1 inputs (and propagate nulls)
    short = pc.less_equal(pc.utf8_length(arr), 1)
    return pc.if_else(short, arr, out)


def keyword_flags_batch(texts, flag_keys=None) -> dict:
    """Per-text 0/1 flags as numpy arrays, keyed by flag name.

    Python re loop per pattern over the batch — patterns are compiled once
    per process; for map_batches hot paths wrap in an actor stage.
    """
    import numpy as np

    flags = _compiled_flags()
    if flag_keys is None:
        flag_keys = list(flags.keys())
    lowered = [t.lower() if t is not None else "" for t in texts]
    out = {}
    for k in flag_keys:
        pat = flags[k]
        out[k] = np.fromiter(
            (1 if pat.search(t) else 0 for t in lowered), dtype=np.int8, count=len(lowered)
        )
    return out


def keyword_flags_batch_arrow(arr, flag_keys=None) -> dict:
    """Vectorized T13 over an Arrow string array: one RE2
    ``match_substring_regex`` pass per pattern — measured 10× the Python
    ``re`` loop on the bench texts (0.015 ms/text vs 0.15). The pack uses
    only constructs where RE2 and ``re`` agree (alternation, classes,
    bounded/unbounded repeats; no backreferences or lookaround), and
    flag-for-flag equality with :func:`keyword_flags_batch` is
    property-tested (test_textkit). Nulls flag as 0, like the scalar
    form's ``None`` → ``""``."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    if flag_keys is None:
        flag_keys = list(KEYWORD_FLAG_REGEX.keys())
    lowered = pc.utf8_lower(pc.fill_null(arr, ""))
    out = {}
    for k in flag_keys:
        m = pc.match_substring_regex(lowered, KEYWORD_FLAG_REGEX[k].strip())
        out[k] = m.to_numpy(zero_copy_only=False).astype(np.int8)
    return out
