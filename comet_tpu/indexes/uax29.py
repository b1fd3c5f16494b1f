"""UAX#29 word segmentation (Unicode TR29 word-boundary rules).

The reference tokenizes with ``github.com/clipperhouse/uax29/v2/words``
(/root/reference/bm25_index.go:67,159-166): ``words.FromString`` yields
EVERY segment of the text — letters/number clusters, but also punctuation
and whitespace runs — and the BM25 index stores all of them (doc lengths,
postings, and ``docTokens`` for more-like-this all include them). Score
parity with the reference therefore requires the same segmentation, not a
``\\w+`` approximation (which splits "don't", "1,000.5" and "example.com",
and never emits whitespace segments).

Two implementations, differentially tested against each other
(tests/test_uax29.py):

- ``segment_slow``: a direct, rule-by-rule transcription of TR29's WB1-WB999
  (the executable spec; also the arbiter when the fast path is in doubt).
- ``segment``: a single compiled ``regex`` pattern whose alternatives encode
  the same grammar (CR+LF, newline, WSegSpace runs, the letter/number/
  katakana/ExtendNumLet word cluster with mid-letter links, regional-
  indicator pairs, then any-char), running at C speed for the ingest path.

Word-break properties come from the ``regex`` module's Unicode database
(``\\p{Word_Break=...}``); there is no vendored table to go stale.
"""

from __future__ import annotations

import regex

# -- word-break property lookup (slow path) ---------------------------------

# order matters only for building the lookup; classes are disjoint by spec
_WB_CLASSES = [
    "CR",
    "LF",
    "Newline",
    "Extend",
    "ZWJ",
    "Regional_Indicator",
    "Format",
    "Katakana",
    "Hebrew_Letter",
    "ALetter",
    "Single_Quote",
    "Double_Quote",
    "MidNumLet",
    "MidLetter",
    "MidNum",
    "Numeric",
    "ExtendNumLet",
    "WSegSpace",
]
_WB_RE = {name: regex.compile(rf"\p{{Word_Break={name}}}") for name in _WB_CLASSES}
_EXT_PICT_RE = regex.compile(r"\p{Extended_Pictographic}")

_prop_cache: dict[str, str] = {}


def _wb_prop(ch: str) -> str:
    p = _prop_cache.get(ch)
    if p is None:
        p = "Other"
        for name in _WB_CLASSES:
            if _WB_RE[name].match(ch):
                p = name
                break
        _prop_cache[ch] = p
    return p


_AH = ("ALetter", "Hebrew_Letter")  # AHLetter
_MIDNUMLETQ = ("MidNumLet", "Single_Quote")
_EFZ = ("Extend", "Format", "ZWJ")
_NL = ("Newline", "CR", "LF")


def segment_slow(text: str) -> list[str]:
    """Reference implementation: evaluate WB1-WB999 at every position."""
    n = len(text)
    if n == 0:
        return []
    props = [_wb_prop(c) for c in text]
    ext_pict = [bool(_EXT_PICT_RE.match(c)) for c in text]

    def prev_base(i: int) -> int:
        """Largest j < i with a non-Extend/Format/ZWJ property, or -1."""
        j = i - 1
        while j >= 0 and props[j] in _EFZ:
            j -= 1
        return j

    def next_base(i: int) -> int:
        """Smallest j > i with a non-Extend/Format/ZWJ property, or n."""
        j = i + 1
        while j < n and props[j] in _EFZ:
            j += 1
        return j

    def is_boundary(i: int) -> bool:
        pl, pr = props[i - 1], props[i]
        # WB3: CR x LF
        if pl == "CR" and pr == "LF":
            return False
        # WB3a / WB3b: break around newlines
        if pl in _NL:
            return True
        if pr in _NL:
            return True
        # WB3c: ZWJ x Extended_Pictographic (literal chars)
        if text[i - 1] == "\u200d" and ext_pict[i]:
            return False
        # WB3d: WSegSpace x WSegSpace (literal adjacency)
        if pl == "WSegSpace" and pr == "WSegSpace":
            return False
        # WB4: X (Extend|Format|ZWJ)* -> X — never break before EFZ
        if pr in _EFZ:
            return False
        # fold the left context per WB4
        j1 = prev_base(i)
        if j1 < 0:
            return True  # only EFZ before us: WB999
        p1 = props[j1]
        j0 = prev_base(j1)
        p0 = props[j0] if j0 >= 0 else None
        k = next_base(i)
        r2 = props[k] if k < n else None

        if p1 in _AH and pr in _AH:  # WB5
            return False
        if p1 in _AH and (pr == "MidLetter" or pr in _MIDNUMLETQ) and r2 in _AH:  # WB6
            return False
        if (p0 in _AH) and (p1 == "MidLetter" or p1 in _MIDNUMLETQ) and pr in _AH:  # WB7
            return False
        if p1 == "Hebrew_Letter" and pr == "Single_Quote":  # WB7a
            return False
        if p1 == "Hebrew_Letter" and pr == "Double_Quote" and r2 == "Hebrew_Letter":  # WB7b
            return False
        if p0 == "Hebrew_Letter" and p1 == "Double_Quote" and pr == "Hebrew_Letter":  # WB7c
            return False
        if p1 == "Numeric" and pr == "Numeric":  # WB8
            return False
        if p1 in _AH and pr == "Numeric":  # WB9
            return False
        if p1 == "Numeric" and pr in _AH:  # WB10
            return False
        if p0 == "Numeric" and (p1 == "MidNum" or p1 in _MIDNUMLETQ) and pr == "Numeric":  # WB11
            return False
        if p1 == "Numeric" and (pr == "MidNum" or pr in _MIDNUMLETQ) and r2 == "Numeric":  # WB12
            return False
        if p1 == "Katakana" and pr == "Katakana":  # WB13
            return False
        if p1 in ("ALetter", "Hebrew_Letter", "Numeric", "Katakana", "ExtendNumLet") and pr == "ExtendNumLet":  # WB13a
            return False
        if p1 == "ExtendNumLet" and pr in ("ALetter", "Hebrew_Letter", "Numeric", "Katakana"):  # WB13b
            return False
        if p1 == "Regional_Indicator" and pr == "Regional_Indicator":  # WB15/16
            # join only if the number of preceding consecutive RIs is odd
            count = 0
            j = j1
            while j >= 0 and props[j] == "Regional_Indicator":
                count += 1
                j = prev_base(j)
            if count % 2 == 1:
                return False
        return True  # WB999

    out: list[str] = []
    start = 0
    for i in range(1, n):
        if is_boundary(i):
            out.append(text[start:i])
            start = i
    out.append(text[start:])
    return out


# -- fast path: the same grammar as one compiled regex -----------------------

def _build_pattern() -> "regex.Pattern":
    CR = r"\r"
    LF = r"\n"
    NLCLS = "[\\r\\n\\x0b\\x0c\\x85\\u2028\\u2029]"
    EFZ = r"[\p{Word_Break=Extend}\p{Word_Break=Format}\p{Word_Break=ZWJ}]"
    # WB4 absorption after every char
    E = rf"{EFZ}*+"
    # WB3c: a literal trailing ZWJ pulls in a following Extended_Pictographic
    # (which may itself chain ZWJ+ExtPict). The pictograph folds as Other, so
    # no word rule can continue past it \u2014 the absorption is TERMINAL and is
    # appended once at the end of each token alternative, not inside E.
    T = rf"(?:(?<=\u200d)\p{{Extended_Pictographic}}{EFZ}*+)*+"
    WS = r"\p{Word_Break=WSegSpace}"
    AL = r"[\p{Word_Break=ALetter}\p{Word_Break=Hebrew_Letter}]"
    HL = r"\p{Word_Break=Hebrew_Letter}"
    NU = r"\p{Word_Break=Numeric}"
    KA = r"\p{Word_Break=Katakana}"
    EXNL = r"\p{Word_Break=ExtendNumLet}"
    LMID = r"[\p{Word_Break=MidLetter}\p{Word_Break=MidNumLet}\p{Word_Break=Single_Quote}]"
    NMID = r"[\p{Word_Break=MidNum}\p{Word_Break=MidNumLet}\p{Word_Break=Single_Quote}]"
    DQ = r"\p{Word_Break=Double_Quote}"
    SQ = r"\p{Word_Break=Single_Quote}"
    RI = r"\p{Word_Break=Regional_Indicator}"

    after_hl = rf"(?<={HL}{EFZ}*)"  # folded left context is a Hebrew letter
    Lx = rf"{AL}{E}"
    # links between AHLetters: WB6/7 (MidLetter|MidNumLetQ), WB7b/c (HL " HL)
    Lmid = rf"(?:{LMID}{E}|{after_hl}{DQ}{E}(?={HL}))"
    Lrun = rf"{Lx}(?:(?:{Lmid})?{Lx})*"
    Nx = rf"{NU}{E}"
    Nrun = rf"{Nx}(?:(?:{NMID}{E})?{Nx})*"
    LN = rf"(?:{Lrun}|{Nrun})+"  # WB9/WB10: letters and digits adjoin freely
    KArun = rf"(?:{KA}{E})+"
    EXrun = rf"(?:{EXNL}{E})+"
    Block = rf"(?:{LN}|{KArun})"
    # WB7a: a trailing single-quote after a Hebrew letter is TERMINAL — no
    # rule continues past folded-SQ, so it sits at the end of Word, outside
    # the run grammar (else "ג'0" would wrongly pull the numeral in)
    trail_sq = rf"(?:{after_hl}{SQ}{E})?"
    Word = rf"(?:(?:{EXrun})?{Block}(?:{EXrun}{Block})*(?:{EXrun})?{trail_sq}|{EXrun})"
    RIpair = rf"{RI}{E}{RI}{E}|{RI}{E}"
    Any = rf".{E}"

    return regex.compile(
        rf"{CR}{LF}|{NLCLS}|(?:{WS}+{E}|{Word}|{RIpair}|{Any}){T}",
        regex.DOTALL,
    )


_PATTERN = _build_pattern()


def _build_ascii_pattern() -> "regex.Pattern":
    """The same grammar restricted to ASCII (no Extend/Format/ZWJ, no
    Hebrew/Katakana/Regional_Indicator exist below U+0080), compiled from
    plain character classes — ~20x faster than the Unicode-property form.
    ASCII WB classes (exhaustively enumerated in tests/test_uax29.py):
    ALetter=[A-Za-z] Numeric=[0-9] ExtendNumLet=[_] MidLetter=[:]
    MidNumLet=[.] MidNum=[,;] Single_Quote=['] WSegSpace=[ ]
    Newline=[\\x0b\\x0c] CR LF; everything else Other."""
    Lrun = r"[A-Za-z]+(?:[:.'][A-Za-z]+)*"
    Nrun = r"[0-9]+(?:[.,;'][0-9]+)*"
    LN = rf"(?:{Lrun}|{Nrun})+"
    Word = rf"(?:_*{LN}(?:_+{LN})*_*|_+)"
    # stdlib re is ~2x faster than the regex module on plain ASCII classes
    import re as _stdlib_re

    return _stdlib_re.compile(rf"\r\n|[\r\n\x0b\x0c]| +|{Word}|.", _stdlib_re.DOTALL)


_ASCII_PATTERN = _build_ascii_pattern()


def segment(text: str) -> list[str]:
    """Partition ``text`` into UAX#29 word segments (all of them, including
    whitespace and punctuation — ``words.FromString`` semantics)."""
    if not text:
        return []
    if text.isascii():
        return _ASCII_PATTERN.findall(text)
    return _PATTERN.findall(text)


def wordlike(tokens: list[str]) -> list[str]:
    """Optional filter: keep only segments containing a letter or digit
    (NOT what the reference does — it indexes every segment)."""
    return [t for t in tokens if _WORDLIKE_RE.search(t)]


_WORDLIKE_RE = regex.compile(r"[\p{L}\p{N}]")
