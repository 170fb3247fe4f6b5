"""Punkt-parity sentence segmentation — the M1 sentence splitter.

The reference's event-classification plugin segments article text with
nltk's punkt tokenizer before per-sentence scoring
(mod_eventclass.py:165 ``sent_tokenize(textValue.lower())``) using the
vendored model at ``test-data/nltk_data/tokenizers/punkt/english.pickle``
(mod_eventclass.py:36-40). A ``(?<=[.!?])\\s+`` regex diverges from it on
abbreviation-heavy news text ("Dr. Smith", "5 p.m. today", "U.S. ties"),
which changes sentence counts and therefore per-article probability sums.

This module implements the punkt DECISION procedure — the published
Kiss & Strunk (2006) unsupervised sentence-boundary algorithm, as
specified by the public nltk ``tokenize.punkt`` API — over the same
LEARNED PARAMETERS the reference ships: abbreviation types,
collocations, frequent sentence starters and orthographic contexts,
extracted from that pickle into the vendored
``data/punkt_en_params.json.gz`` so the repo stays standalone (no nltk,
no reference checkout needed at runtime). When a real nltk installation
IS importable, :func:`sent_tokenize` delegates to it (exact parity by
construction); the built-in engine covers this sandbox and
dependency-light deployments.

Decision procedure implemented (paper section numbers):
  - first pass: lone sentence-end chars break; ellipses and known
    abbreviations (incl. hyphen-tail lookup) don't; other period-final
    tokens do;
  - 4.1.2 collocation heuristic (abbr + never-break on known pairs);
  - 4.2 abbreviation reclassification via 4.1.1 orthographic evidence
    and 4.1.3 frequent-sentence-starter evidence;
  - 4.3 initials/ordinals reclassification via orthography, with the
    unknown-orthography initials special case;
  - boundary realignment (trailing quotes/brackets attach left).
"""

from __future__ import annotations

import gzip
import json
import os
import re
import threading

# --------------------------------------------------------------------------
# orthographic-context flags (bit layout is part of the trained model's
# on-disk contract — ortho_context values are meaningless without it)
# --------------------------------------------------------------------------

_ORTHO_BEG_UC = 1 << 1
_ORTHO_MID_UC = 1 << 2
_ORTHO_UNK_UC = 1 << 3
_ORTHO_BEG_LC = 1 << 4
_ORTHO_MID_LC = 1 << 5
_ORTHO_UNK_LC = 1 << 6
_ORTHO_UC = _ORTHO_BEG_UC | _ORTHO_MID_UC | _ORTHO_UNK_UC
_ORTHO_LC = _ORTHO_BEG_LC | _ORTHO_MID_LC | _ORTHO_UNK_LC

# --------------------------------------------------------------------------
# English language vars: the word tokenizer and period-context patterns
# --------------------------------------------------------------------------

_SENT_END_CHARS = (".", "?", "!")
_RE_SENT_END = "[.?!]"
_RE_WORD_START = r"[^\(\"\`{\[:;&\#\*@\)}\]\-,]"
_RE_NON_WORD = r"(?:[?!)\";}\]\*:@\'\({\[])"
_RE_MULTI_CHAR_PUNCT = r"(?:\-{2,}|\.{2,}|(?:\.\s){2,}\.)"

_WORD_TOKENIZE_RE = re.compile(
    r"""(
        %(MultiChar)s
        |
        (?=%(WordStart)s)\S+?        # word chars until an end sequence
        (?=
            \s|$|
            %(NonWord)s|%(MultiChar)s|
            ,(?=$|\s|%(NonWord)s|%(MultiChar)s)
        )
        |
        \S
    )"""
    % {
        "MultiChar": _RE_MULTI_CHAR_PUNCT,
        "WordStart": _RE_WORD_START,
        "NonWord": _RE_NON_WORD,
    },
    re.UNICODE | re.VERBOSE,
)

_PERIOD_CONTEXT_RE = re.compile(
    r"""
    \S*                              # some word material
    %(SentEndChars)s                 # a potential sentence ending
    (?=(?P<after_tok>
        %(NonWord)s                  # either other punctuation
        |
        \s+(?P<next_tok>\S+)         # or whitespace and some other token
    ))"""
    % {"SentEndChars": _RE_SENT_END, "NonWord": _RE_NON_WORD},
    re.UNICODE | re.VERBOSE,
)

_BOUNDARY_REALIGN_RE = re.compile(r'["\')\]}]+?(?:\s+|(?=--)|$)', re.MULTILINE)

_RE_ELLIPSIS = re.compile(r"\.\.+$")
_RE_NUMERIC = re.compile(r"^-?[\.,]?\d[\d,\.-]*\.?$")
_RE_INITIAL = re.compile(r"[^\W\d]\.$", re.UNICODE)

_PUNCT = (";", ":", ",", ".", "!", "?")


class _Tok:
    """One word token with its boundary annotations."""

    __slots__ = ("tok", "type", "period_final", "sentbreak", "abbr", "ellipsis")

    def __init__(self, tok: str):
        self.tok = tok
        self.type = _RE_NUMERIC.sub("##number##", tok.lower())
        self.period_final = tok.endswith(".")
        self.sentbreak = False
        self.abbr = False
        self.ellipsis = False

    @property
    def type_no_period(self) -> str:
        if len(self.type) > 1 and self.type[-1] == ".":
            return self.type[:-1]
        return self.type

    @property
    def type_no_sentperiod(self) -> str:
        return self.type_no_period if self.sentbreak else self.type

    @property
    def first_upper(self) -> bool:
        return bool(self.tok) and self.tok[0].isupper()

    @property
    def first_lower(self) -> bool:
        return bool(self.tok) and self.tok[0].islower()

    @property
    def is_initial(self) -> bool:
        return _RE_INITIAL.match(self.tok) is not None

    @property
    def is_ellipsis(self) -> bool:
        return _RE_ELLIPSIS.match(self.tok) is not None


_PARAMS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "punkt_en_params.json.gz",
)


class PunktParams:
    """The trained-model parameters the decisions read."""

    def __init__(self, abbrev_types, collocations, sent_starters, ortho_context):
        self.abbrev_types = frozenset(abbrev_types)
        self.collocations = frozenset(map(tuple, collocations))
        self.sent_starters = frozenset(sent_starters)
        self.ortho_context = dict(ortho_context)

    @classmethod
    def load_vendored(cls) -> "PunktParams":
        with gzip.open(_PARAMS_PATH, "rb") as f:
            d = json.loads(f.read())
        return cls(
            d["abbrev_types"],
            d["collocations"],
            d["sent_starters"],
            d["ortho_context"],
        )


class PunktSegmenter:
    """Sentence tokenizer applying the punkt decision procedure with
    fixed (pre-trained) parameters."""

    def __init__(self, params: PunktParams):
        self.params = params

    # -- annotation ---------------------------------------------------

    def _first_pass(self, t: _Tok) -> None:
        if t.tok in _SENT_END_CHARS:
            t.sentbreak = True
        elif t.is_ellipsis:
            t.ellipsis = True
        elif t.period_final and not t.tok.endswith(".."):
            low = t.tok[:-1].lower()
            if (
                low in self.params.abbrev_types
                or low.split("-")[-1] in self.params.abbrev_types
            ):
                t.abbr = True
            else:
                t.sentbreak = True

    def _ortho_heuristic(self, t: _Tok):
        """4.1.1: True / False / 'unknown' sentence-starter evidence."""
        if t.tok in _PUNCT:
            return False
        ortho = self.params.ortho_context.get(t.type_no_sentperiod, 0)
        if t.first_upper and (ortho & _ORTHO_LC) and not (ortho & _ORTHO_MID_UC):
            return True
        if t.first_lower and ((ortho & _ORTHO_UC) or not (ortho & _ORTHO_BEG_LC)):
            return False
        return "unknown"

    def _second_pass(self, t1: _Tok, t2: _Tok | None) -> None:
        if t2 is None or not t1.period_final:
            return
        typ = t1.type_no_period
        next_typ = t2.type_no_sentperiod
        tok_is_initial = t1.is_initial

        # 4.1.2 known collocation across the period -> abbreviation
        if (typ, next_typ) in self.params.collocations:
            t1.sentbreak = False
            t1.abbr = True
            return

        # 4.2 abbreviation/ellipsis may still end the sentence...
        if (t1.abbr or t1.ellipsis) and not tok_is_initial:
            # ...if orthography says the next word starts sentences
            if self._ortho_heuristic(t2) is True:
                t1.sentbreak = True
                return
            # ...or the next word is a capitalized frequent starter
            if t2.first_upper and next_typ in self.params.sent_starters:
                t1.sentbreak = True
                return

        # 4.3 initials / ordinals marked sentbreak may be abbreviations
        if tok_is_initial or typ == "##number##":
            is_starter = self._ortho_heuristic(t2)
            if is_starter is False:
                t1.sentbreak = False
                t1.abbr = True
                return
            if (
                is_starter == "unknown"
                and tok_is_initial
                and t2.first_upper
                and not (self.params.ortho_context.get(next_typ, 0) & _ORTHO_LC)
            ):
                t1.sentbreak = False
                t1.abbr = True

    def _annotated_tokens(self, text: str):
        toks = [
            _Tok(m.group())
            for line in text.split("\n")
            if line.strip()
            for m in _WORD_TOKENIZE_RE.finditer(line)
        ]
        for t in toks:
            self._first_pass(t)
        for i, t in enumerate(toks):
            self._second_pass(t, toks[i + 1] if i + 1 < len(toks) else None)
        return toks

    def _contains_sentbreak(self, fragment: str) -> bool:
        """True iff a NON-FINAL token of the fragment is a sentence break
        (the final token's break belongs to the next context)."""
        found = False
        for t in self._annotated_tokens(fragment):
            if found:
                return True
            if t.sentbreak:
                found = True
        return False

    # -- slicing ------------------------------------------------------

    def _slices(self, text: str):
        last_break = 0
        for m in _PERIOD_CONTEXT_RE.finditer(text):
            context = m.group() + m.group("after_tok")
            if self._contains_sentbreak(context):
                yield slice(last_break, m.end())
                if m.group("next_tok"):
                    last_break = m.start("next_tok")
                else:
                    last_break = m.end()
        if last_break < len(text):
            yield slice(last_break, len(text))

    def _realign(self, text: str, slices):
        """Attach trailing quotes/brackets to the sentence they close."""
        slices = list(slices)
        realign = 0
        for i, sl1 in enumerate(slices):
            sl1 = slice(sl1.start + realign, sl1.stop)
            sl2 = slices[i + 1] if i + 1 < len(slices) else None
            if sl2 is None:
                if text[sl1]:
                    yield sl1
                continue
            m = _BOUNDARY_REALIGN_RE.match(text[sl2])
            if m:
                yield slice(sl1.start, sl2.start + len(m.group(0).rstrip()))
                realign = m.end()
            else:
                realign = 0
                if text[sl1]:
                    yield sl1

    def tokenize(self, text: str, realign_boundaries: bool = True) -> list:
        if not text:
            return []
        slices = self._slices(text)
        if realign_boundaries:
            slices = self._realign(text, slices)
        return [text[sl] for sl in slices]


# --------------------------------------------------------------------------
# module-level default: real nltk when importable, built-in engine else
# --------------------------------------------------------------------------

_DEFAULT_LOCK = threading.Lock()
_DEFAULT: dict = {}


def _default_tokenize():
    with _DEFAULT_LOCK:
        fn = _DEFAULT.get("fn")
        if fn is not None:
            return fn
        try:  # exact parity when the real thing is available
            from nltk.tokenize import sent_tokenize as _nltk_sent_tokenize

            fn = _nltk_sent_tokenize
        except ImportError:
            seg = PunktSegmenter(PunktParams.load_vendored())
            fn = seg.tokenize
        _DEFAULT["fn"] = fn
        return fn


def sent_tokenize(text: str) -> list:
    """Drop-in analogue of ``nltk.tokenize.sent_tokenize`` for English,
    backed by the vendored punkt parameters (or real nltk if present)."""
    return _default_tokenize()(text)
