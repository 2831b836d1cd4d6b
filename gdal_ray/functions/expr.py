"""OGR-SQL-style WHERE-clause compiler → pyarrow expressions.

The engine's analog of ``OGRLayer::SetAttributeFilter`` (swq expression
compiler, ogr/ogrsf_frmts/generic/ogrlayer.cpp:752; grammar
ogr/ogr_swq.h:42-81): a small recursive-descent parser for

    comparison   =  <>  !=  <  <=  >  >=
    logical      AND OR NOT
    predicates   IN (..), BETWEEN a AND b, LIKE / ILIKE, IS [NOT] NULL
    arithmetic   + - * / %
    literals     numbers, 'strings', TRUE/FALSE/NULL

compiled to a ``pyarrow.dataset`` Expression — so the same filter
string is usable both as a parquet read predicate (pushed down to
row groups, the engine's `-where` pushdown) and inside
``map_batches`` via ``pa.Table.filter(expr)``.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import dataset as pds

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.\d*(?:[eE][+-]?\d+)?|-?\.\d+|-?\d+(?:[eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<ident>"[^"]+"|[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<op><>|!=|<=|>=|=|<|>|\(|\)|,|\+|-|\*|/|%)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "BETWEEN", "LIKE", "ILIKE", "IS",
             "NULL", "TRUE", "FALSE", "ESCAPE"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {s[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            toks.append(("num", m.group("num")))
        elif m.group("str") is not None:
            toks.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("ident") is not None:
            t = m.group("ident")
            if t.upper() in _KEYWORDS:
                toks.append(("kw", t.upper()))
            else:
                toks.append(("ident", t.strip('"')))
        else:
            toks.append(("op", m.group("op")))
    return toks


def _like_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {kind} {val}, got {k} {v}")
        return v

    # expr := or_term
    def parse(self):
        e = self.or_term()
        if self.peek() != (None, None):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def or_term(self):
        left = self.and_term()
        while self.peek() == ("kw", "OR"):
            self.next()
            left = left | self.and_term()
        return left

    def and_term(self):
        left = self.not_term()
        while self.peek() == ("kw", "AND"):
            self.next()
            left = left & self.not_term()
        return left

    def not_term(self):
        if self.peek() == ("kw", "NOT"):
            self.next()
            return ~self.not_term()
        return self.predicate()

    def predicate(self):
        left = self.additive()
        k, v = self.peek()
        negate = False
        if (k, v) == ("kw", "NOT"):
            self.next()
            negate = True
            k, v = self.peek()
        if k == "op" and v in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.additive()
            ops = {"=": "__eq__", "<>": "__ne__", "!=": "__ne__",
                   "<": "__lt__", "<=": "__le__", ">": "__gt__", ">=": "__ge__"}
            e = getattr(left, ops[v])(right)
        elif (k, v) == ("kw", "IN"):
            self.next()
            self.expect("op", "(")
            vals = [self.literal_value()]
            while self.peek() == ("op", ","):
                self.next()
                vals.append(self.literal_value())
            self.expect("op", ")")
            e = left.isin(vals)
        elif (k, v) == ("kw", "BETWEEN"):
            self.next()
            lo = self.additive()
            self.expect("kw", "AND")
            hi = self.additive()
            e = (left >= lo) & (left <= hi)
        elif (k, v) == ("kw", "LIKE") or (k, v) == ("kw", "ILIKE"):
            self.next()
            kk, pat = self.next()
            if kk != "str":
                raise ValueError("LIKE needs a string pattern")
            rx = _like_to_regex(pat)
            e = pc.match_substring_regex(
                left, rx, ignore_case=(v == "ILIKE")
            )
        elif (k, v) == ("kw", "IS"):
            self.next()
            isnot = False
            if self.peek() == ("kw", "NOT"):
                self.next()
                isnot = True
            self.expect("kw", "NULL")
            e = left.is_valid() if isnot else ~left.is_valid()
        else:
            if negate:
                raise ValueError("dangling NOT")
            return left
        return ~e if negate else e

    def additive(self):
        left = self.multiplicative()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                right = self.multiplicative()
                left = left + right if v == "+" else left - right
            else:
                return left

    def multiplicative(self):
        left = self.primary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.next()
                right = self.primary()
                if v == "*":
                    left = left * right
                elif v == "/":
                    left = left / right
                else:
                    left = pc.subtract(
                        left, pc.multiply(pc.floor(pc.divide(left, right)), right)
                    )
            else:
                return left

    def primary(self):
        k, v = self.peek()
        if (k, v) == ("op", "("):
            self.next()
            e = self.or_term()
            self.expect("op", ")")
            return e
        if k == "num":
            self.next()
            return pds.scalar(float(v) if ("." in v or "e" in v.lower()) else int(v))
        if k == "str":
            self.next()
            return pds.scalar(v)
        if (k, v) == ("kw", "TRUE"):
            self.next()
            return pds.scalar(True)
        if (k, v) == ("kw", "FALSE"):
            self.next()
            return pds.scalar(False)
        if (k, v) == ("kw", "NULL"):
            self.next()
            return pds.scalar(None)
        if k == "ident":
            self.next()
            return pds.field(v)
        raise ValueError(f"unexpected token {k} {v}")

    def literal_value(self):
        k, v = self.next()
        if k == "num":
            return float(v) if ("." in v or "e" in v.lower()) else int(v)
        if k == "str":
            return v
        raise ValueError(f"expected literal in IN list, got {k} {v}")


def compile_where(where: str) -> pds.Expression:
    """Compile an OGR-SQL WHERE string to a pyarrow dataset Expression.

    Usable as ``ray.data.read_parquet(..., filter=compile_where(s))``
    (row-group pushdown) and as ``table.filter(compile_where(s))``."""
    return _Parser(_tokenize(where)).parse()


def filter_batch(batch: pa.Table, where: str) -> pa.Table:
    """Apply a WHERE string to one Arrow batch (vectorized)."""
    return batch.filter(compile_where(where))
