"""Date parsing with the reference's exact format set and semantics.

Re-implements /root/reference/octofludb/domain_date.py as a sequential
component parser (compiled regexes, NO cross-component backtracking —
matching parsec's @generate semantics where a committed component match
cannot be retried).  Formats, in priority order (p_any_date,
domain_date.py:186-195):

    utc       1986-05-17T22:01:30Z        (ISO-8601 with time)
    polite    May 31, 2018 / May17,1986
    dMy       01-Apr-2002
    ymd       2011/05/31, 20110531
    mdy       05/31/2011, 05312011
    my        05/2011, Jun-2011
    ym        2011/05
    year      2011, 99 (2-digit window: 00-29 -> 20xx, 30-99 -> 19xx,
              domain_date.py:8-15)

Partial dates carry distinct XSD datatypes (domain_date.py:24-45).
The whole input must be consumed (parse_strict, token.py:114-117).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

from octoray.model import DT_DATE, DT_GDAY, DT_GMONTH, DT_GMONTHDAY, DT_GYEAR, DT_GYEARMONTH

MONTHS = {
    "jan": "1", "feb": "2", "mar": "3", "apr": "4", "may": "5",
    "jun": "6", "jul": "7", "aug": "8", "sep": "9", "oct": "10",
    "nov": "11", "dec": "12",
    "january": "1", "february": "2", "march": "3", "april": "4",
    "june": "6", "july": "7", "august": "8", "september": "9",
    "october": "10", "november": "11", "december": "12",
}
# longest-first like the reference's length-bucketed wordset (parser.py:6-31)
_MONTH_WORDS = sorted(MONTHS.keys(), key=len, reverse=True)
_MONTH_STR_RE = re.compile("|".join(_MONTH_WORDS), re.IGNORECASE)

_LONGYEAR = re.compile(r"20\d\d|1[89]\d\d")
_YEAR = re.compile(r"20\d\d|1\d\d\d|\d\d")  # ordered alternation like p_year
_MONTH_NUM = re.compile(r"10|11|12|0?[1-9]")
_DAY = re.compile(r"3[01]|[012]?\d")
_SEP = re.compile(r"[-/]")
_TIME_TRAIL = re.compile(r" \d\d:\d\d:\d\d(\.\d+)?")
_ISO_TIME = re.compile(r"([01]\d|2[0-3]):?[0-5]\d:?[0-5]\d(Z|\+\d\d:\d\d)?")
_SPACES = re.compile(r"\s*")


def pad2(x: str) -> str:
    """util.py:83-85"""
    return "0" * (2 - len(x)) + x


def expand_year(x: str) -> str:
    """domain_date.py:8-15: 2-digit year windowing."""
    if len(x) == 2:
        return ("20" if int(x[0]) <= 2 else "19") + x
    return x


class _Cursor:
    __slots__ = ("s", "i")

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def rx(self, pat: re.Pattern) -> Optional[str]:
        m = pat.match(self.s, self.i)
        if m is None:
            return None
        self.i = m.end()
        return m.group(0)

    def opt(self, pat: re.Pattern) -> None:
        m = pat.match(self.s, self.i)
        if m is not None:
            self.i = m.end()

    def lit(self, ch: str) -> bool:
        if self.s.startswith(ch, self.i):
            self.i += len(ch)
            return True
        return False

    def done(self) -> bool:
        return self.i == len(self.s)


def _month(c: _Cursor) -> Optional[str]:
    """p_month = p_month_num ^ p_month_str (domain_date.py:182)."""
    v = c.rx(_MONTH_NUM)
    if v is not None:
        return pad2(v)
    v = c.rx(_MONTH_STR_RE)
    if v is not None:
        return pad2(MONTHS[v.lower()])
    return None


def _parse_utc(s: str) -> Optional[Tuple[str, str, str]]:
    c = _Cursor(s)
    y = c.rx(_LONGYEAR)
    if y is None:
        return None
    c.lit("-")
    m = c.rx(_MONTH_NUM)
    if m is None:
        return None
    c.lit("-")
    d = c.rx(_DAY)
    if d is None or not c.lit("T") or c.rx(_ISO_TIME) is None or not c.done():
        return None
    return (y, pad2(m), pad2(d))


def _parse_polite(s: str) -> Optional[Tuple[str, str, str]]:
    """May 31, 2018 (domain_date.py:87-98)"""
    c = _Cursor(s)
    m = c.rx(_MONTH_STR_RE)
    if m is None:
        return None
    c.opt(_SPACES)
    d = c.rx(_DAY)
    if d is None or not c.lit(","):
        return None
    c.opt(_SPACES)
    y = c.rx(_LONGYEAR)
    if y is None or not c.done():
        return None
    return (y, pad2(MONTHS[m.lower()]), pad2(d))


def _parse_dmy(s: str) -> Optional[Tuple[str, str, str]]:
    """01-Apr-2002 (domain_date.py:73-84); year may be 2-digit."""
    c = _Cursor(s)
    d = c.rx(_DAY)
    if d is None:
        return None
    c.opt(_SEP)
    m = c.rx(_MONTH_STR_RE)
    if m is None:
        return None
    c.opt(_SEP)
    y = c.rx(_YEAR)
    if y is None:
        return None
    c.opt(_TIME_TRAIL)
    if not c.done():
        return None
    return (expand_year(y), pad2(MONTHS[m.lower()]), pad2(d))


def _parse_ymd(s: str) -> Optional[Tuple[str, str, str]]:
    c = _Cursor(s)
    y = c.rx(_LONGYEAR)
    if y is None:
        return None
    c.opt(_SEP)
    m = _month(c)
    if m is None:
        return None
    c.opt(_SEP)
    d = c.rx(_DAY)
    if d is None:
        return None
    c.opt(_TIME_TRAIL)
    if not c.done():
        return None
    return (y, m, pad2(d))


def _parse_mdy(s: str) -> Optional[Tuple[str, str, str]]:
    c = _Cursor(s)
    m = _month(c)
    if m is None:
        return None
    c.opt(_SEP)
    d = c.rx(_DAY)
    if d is None:
        return None
    c.opt(_SEP)
    y = c.rx(_LONGYEAR)
    if y is None:
        return None
    c.opt(_TIME_TRAIL)
    if not c.done():
        return None
    return (y, m, pad2(d))


def _parse_my(s: str) -> Optional[Tuple[str, str]]:
    c = _Cursor(s)
    m = _month(c)
    if m is None or c.rx(_SEP) is None:
        return None
    y = c.rx(_LONGYEAR)
    if y is None or not c.done():
        return None
    return (y, m)


def _parse_ym(s: str) -> Optional[Tuple[str, str]]:
    c = _Cursor(s)
    y = c.rx(_LONGYEAR)
    if y is None or c.rx(_SEP) is None:
        return None
    m = _month(c)
    if m is None or not c.done():
        return None
    return (y, m)


def _parse_year(s: str) -> Optional[str]:
    c = _Cursor(s)
    y = c.rx(_YEAR)
    if y is None or not c.done():
        return None
    return expand_year(y)


from functools import lru_cache


@lru_cache(maxsize=16384)
def parse_any_date(s: str) -> Optional[Tuple[Optional[str], Optional[str], Optional[str]]]:
    """p_any_date with parse_strict semantics: (year, month, day) with
    None for absent parts, or None when ``s`` is not a date.  Memoized
    (pure, returns an immutable tuple): the emitter parses every date
    span twice — once in the recognizer test, once for the literal —
    and date strings repeat heavily across a corpus."""
    if not s:
        return None
    for f in (_parse_utc, _parse_polite, _parse_dmy, _parse_ymd, _parse_mdy):
        r = f(s)
        if r is not None:
            return r
    r2 = _parse_my(s) or _parse_ym(s)
    if r2 is not None:
        return (r2[0], r2[1], None)
    y = _parse_year(s)
    if y is not None:
        return (y, None, None)
    return None


def date_str(ymd: Tuple[Optional[str], Optional[str], Optional[str]]) -> str:
    """str(Date) — '-'-joined non-None parts (domain_date.py:47-48)."""
    return "-".join(x for x in ymd if x is not None)


def date_literal(
    ymd: Tuple[Optional[str], Optional[str], Optional[str]]
) -> Tuple[str, str]:
    """(lexical, datatype) per Date.as_uri (domain_date.py:24-45)."""
    y, m, d = ymd
    if y and m is None:
        return (y, DT_GYEAR)
    if y and m and d is None:
        return (f"{y}-{m}", DT_GYEARMONTH)
    if y and m and d:
        return (f"{y}-{m}-{d}", DT_DATE)
    if y is None and m and d:
        return (f"{m}-{d}", DT_GMONTHDAY)
    if y is None and m and d is None:
        return (m, DT_GMONTH)
    return (d or "", DT_GDAY)


def parse_date_full(s: str) -> Optional[Tuple[str, str, str]]:
    """p_date (domain_date.py:184): full dates only (no my/ym/year),
    used by make_literal inference (nomenclature.py:111-119)."""
    if not s:
        return None
    for f in (_parse_utc, _parse_polite, _parse_ymd, _parse_mdy, _parse_dmy):
        r = f(s)
        if r is not None:
            return r
    return None


def quarter_from_date(date: str) -> str:
    """'2021-12-01' -> '2021Q4' — calendar quarter (recipes.py:261-272)."""
    try:
        year, month = date.split("-")[0:2]
        quarter = str((int(month) + 2) // 3)
    except (ValueError, IndexError):
        return ""
    return f"{year}Q{quarter}"
