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


# --- ST_* geometry scalar functions (the SQLite-dialect tier,
# doc/source/user/sql_sqlite_dialect.rst) — registered as pyarrow
# scalar UDFs so they compose into dataset expressions next to the
# vectorized kernels.  Registration is process-local and runs at
# module import, which every Ray worker performs when it unpickles a
# compiled expression's surrounding closure. ------------------------


def _st_kernels():
    from ..geom import ops as _gops
    from ..geom import wkb as _gwkb

    def area(b):
        return _gops.wkb_area(b)

    def xcoord(b):
        g = _gwkb.decode(b)
        if g["type"] != "Point":
            raise ValueError("ST_X needs Point geometry")
        return float(g["coordinates"][0])

    def ycoord(b):
        g = _gwkb.decode(b)
        if g["type"] != "Point":
            raise ValueError("ST_Y needs Point geometry")
        return float(g["coordinates"][1])

    def npoints(b):
        g = _gwkb.decode(b)
        t = g["type"]
        if t == "Point":
            return 1
        if t == "LineString":
            return len(g["coordinates"])
        if t == "Polygon":
            return sum(len(r) for r in g["coordinates"])
        if t == "MultiPolygon":
            return sum(len(r) for rings in g["coordinates"]
                       for r in rings)
        raise ValueError(f"ST_NPOINTS: unsupported {t}")

    def isvalid(b):
        return bool(_gops.wkb_is_valid(b))

    def centroid(b):
        cx, cy = _gops.wkb_centroid(b)
        return _gwkb.encode_point(cx, cy)

    def geomtype(b):
        # spatialite convention: upper-case WKT-style type name
        return _gwkb.decode(b)["type"].upper()

    return {
        "gdal_ray_st_area": (area, pa.float64()),
        "gdal_ray_st_x": (xcoord, pa.float64()),
        "gdal_ray_st_y": (ycoord, pa.float64()),
        "gdal_ray_st_npoints": (npoints, pa.int64()),
        "gdal_ray_st_isvalid": (isvalid, pa.bool_()),
        "gdal_ray_st_centroid": (centroid, pa.binary()),
        "gdal_ray_st_length": (_gops.wkb_length, pa.float64()),
        "gdal_ray_st_perimeter": (_gops.wkb_perimeter, pa.float64()),
        "gdal_ray_st_envelope": (_gops.wkb_envelope, pa.binary()),
        "gdal_ray_st_geometrytype": (geomtype, pa.string()),
        "gdal_ray_st_astext": (_gwkb.wkb_to_wkt, pa.string()),
    }


def _st_kernels2():
    """Tier-2 functions: binary predicates / measures over two
    geometry args, plus ST_BUFFER(g, dist)."""
    from ..geom import ops as _gops

    return {
        "gdal_ray_st_distance": (_gops.wkb_distance, pa.float64(),
                                 "geom"),
        "gdal_ray_st_intersects": (_gops.wkb_intersects, pa.bool_(),
                                   "geom"),
        "gdal_ray_st_contains": (_gops.wkb_contains, pa.bool_(),
                                 "geom"),
        "gdal_ray_st_buffer": (
            lambda g, d: _gops.wkb_buffer(g, float(d), 30),
            pa.binary(), "num"),
    }


def _register_st_udfs():
    for name, (kernel, out_type) in _st_kernels().items():
        def fn(ctx, arr, _k=kernel, _t=out_type):
            vals = [None if v is None else _k(v)
                    for v in arr.to_pylist()]
            return pa.array(vals, _t)
        try:
            pc.register_scalar_function(
                fn, name, {"summary": name, "description": name},
                {"g": pa.binary()}, out_type)
        except pa.lib.ArrowKeyError:
            pass  # already registered in this process
    for name, (kernel, out_type, arg2) in _st_kernels2().items():
        def fn2(ctx, a1, a2, _k=kernel, _t=out_type):
            # either argument may be a scalar (broadcast literal)
            n = max(len(a1) if hasattr(a1, "__len__") else 1,
                    len(a2) if hasattr(a2, "__len__") else 1)
            l1 = a1.to_pylist() if hasattr(a1, "to_pylist") \
                else [a1.as_py()] * n
            l2 = a2.to_pylist() if hasattr(a2, "to_pylist") \
                else [a2.as_py()] * n
            vals = [None if (v1 is None or v2 is None) else _k(v1, v2)
                    for v1, v2 in zip(l1, l2)]
            return pa.array(vals, _t)
        try:
            pc.register_scalar_function(
                fn2, name, {"summary": name, "description": name},
                {"g1": pa.binary(),
                 "g2": pa.binary() if arg2 == "geom" else pa.float64()},
                out_type)
        except pa.lib.ArrowKeyError:
            pass


_register_st_udfs()

_ST_FUNCS = {
    "ST_AREA": "gdal_ray_st_area",
    "ST_X": "gdal_ray_st_x",
    "ST_Y": "gdal_ray_st_y",
    "ST_NPOINTS": "gdal_ray_st_npoints",
    "ST_ISVALID": "gdal_ray_st_isvalid",
    "ST_CENTROID": "gdal_ray_st_centroid",  # composes: ST_X(ST_CENTROID(g))
    "ST_LENGTH": "gdal_ray_st_length",
    "ST_PERIMETER": "gdal_ray_st_perimeter",
    "ST_ENVELOPE": "gdal_ray_st_envelope",
    "ST_GEOMETRYTYPE": "gdal_ray_st_geometrytype",
    "ST_ASTEXT": "gdal_ray_st_astext",
}

_ST_FUNCS2 = {
    "ST_DISTANCE": "gdal_ray_st_distance",
    "ST_INTERSECTS": "gdal_ray_st_intersects",
    "ST_CONTAINS": "gdal_ray_st_contains",
    "ST_BUFFER": "gdal_ray_st_buffer",
}


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
        if k == "ident" and v.upper() == "CASE":
            return self.case_expr()
        if k == "ident":
            self.next()
            if self.peek() == ("op", "("):
                return self.func_call(v.upper())
            return pds.field(v)
        raise ValueError(f"unexpected token {k} {v}")

    def _peek_ident(self, word: str) -> bool:
        k, v = self.peek()
        return k == "ident" and v.upper() == word

    def case_expr(self):
        """CASE [operand] WHEN x THEN y [...] [ELSE z] END — both the
        searched and the simple form (swq lacks CASE entirely; this is
        the SQLite-dialect behavior).  Compiles to a nested if_else
        chain evaluated first-match-wins."""
        self.next()  # CASE
        operand = None
        if not self._peek_ident("WHEN"):
            operand = self.or_term()
        whens = []
        els = pds.scalar(None)
        while True:
            if self._peek_ident("WHEN"):
                self.next()
                cond = self.or_term()
                if operand is not None:
                    cond = operand == cond
                if not self._peek_ident("THEN"):
                    raise ValueError("CASE WHEN needs THEN")
                self.next()
                whens.append((cond, self.or_term()))
            elif self._peek_ident("ELSE"):
                self.next()
                els = self.or_term()
            elif self._peek_ident("END"):
                self.next()
                break
            else:
                raise ValueError("CASE needs WHEN/ELSE/END")
        if not whens:
            raise ValueError("CASE needs at least one WHEN")
        out = els
        for cond, val in reversed(whens):
            out = pc.if_else(cond, val, out)
        return out

    # --- scalar function calls (swq_op_registrar analog,
    # ogr/swq_op_general.cpp): CONCAT/SUBSTR/UPPER/LOWER/LENGTH/ABS/
    # ROUND/FLOOR/CEIL/SQRT/POWER/COALESCE + CAST(x AS type) ---------

    _CAST_TYPES = {
        "INTEGER": pa.int32(), "INT": pa.int32(), "BIGINT": pa.int64(),
        "SMALLINT": pa.int16(), "DOUBLE": pa.float64(),
        "FLOAT": pa.float32(), "REAL": pa.float32(),
        "VARCHAR": pa.string(), "TEXT": pa.string(),
        "CHARACTER": pa.string(), "BOOLEAN": pa.bool_(),
    }

    def func_call(self, name: str):
        self.expect("op", "(")
        if name == "CAST":
            e = self.or_term()
            kk, vv = self.next()  # AS tokenizes as a plain ident
            if not (kk == "ident" and vv.upper() == "AS"):
                raise ValueError("CAST needs 'AS type'")
            tk, tv = self.next()
            typ = self._CAST_TYPES.get(tv.upper()) if tk == "ident" else None
            if typ is None:
                raise ValueError(f"unsupported CAST type {tv!r}")
            self.expect("op", ")")
            return e.cast(typ)
        args, spans = [], []
        if self.peek() != ("op", ")"):
            start = self.i
            args.append(self.or_term())
            spans.append((start, self.i))
            while self.peek() == ("op", ","):
                self.next()
                start = self.i
                args.append(self.or_term())
                spans.append((start, self.i))
        self.expect("op", ")")

        def lit(i):
            # scalar-option arguments (SUBSTR offsets, ROUND digits)
            # must be numeric literals, as in the reference's swq
            s, e = spans[i]
            if e - s == 1 and self.toks[s][0] == "num":
                v = self.toks[s][1]
                return float(v) if "." in v else int(v)
            raise ValueError(f"{name} arg {i + 1} must be a literal")

        if name in _ST_FUNCS:
            if len(args) != 1:
                raise ValueError(f"{name} takes one geometry argument")
            return args[0]._call(_ST_FUNCS[name], [args[0]])
        if name in _ST_FUNCS2:
            if len(args) != 2:
                raise ValueError(f"{name} takes two arguments")
            return args[0]._call(_ST_FUNCS2[name], args)
        if name == "CONCAT":
            return pc.binary_join_element_wise(*args, "")
        if name == "SUBSTR" or name == "SUBSTRING":
            start = int(lit(1))
            if len(args) == 3:
                return pc.utf8_slice_codeunits(
                    args[0], start - 1, start - 1 + int(lit(2)))
            return pc.utf8_slice_codeunits(args[0], start - 1)
        if name == "UPPER":
            return pc.utf8_upper(args[0])
        if name == "LOWER":
            return pc.utf8_lower(args[0])
        if name == "LENGTH":
            return pc.utf8_length(args[0])
        if name == "ABS":
            return pc.abs(args[0])
        if name == "ROUND":
            nd = int(lit(1)) if len(args) == 2 else 0
            # OGR SQL / DuckDB round half AWAY from zero; pyarrow's
            # default is banker's half-to-even (ADVICE r3); pyarrow
            # spells the mode "half_towards_infinity" (away from zero
            # for ties, signed)
            return pc.round(args[0], ndigits=nd,
                            round_mode="half_towards_infinity")
        if name == "FLOOR":
            return pc.floor(args[0])
        if name == "CEIL" or name == "CEILING":
            return pc.ceil(args[0])
        if name == "SQRT":
            return pc.sqrt(args[0])
        if name == "POWER" or name == "POW":
            return pc.power(args[0], args[1])
        if name == "COALESCE":
            return pc.coalesce(*args)
        raise ValueError(f"unknown function {name}")

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


def compile_select(select: str) -> list[tuple[str, pds.Expression]]:
    """Compile an OGR-SQL SELECT list — ``expr [AS alias], ...`` with
    scalar functions, CAST and arithmetic (the swq select-expr
    evaluator, ogr/ogr_swq.h:42-81 + swq_op_general.cpp) — to named
    pyarrow expressions.  Bare columns keep their name; unaliased
    expressions get ``expr1..exprN``."""
    p = _Parser(_tokenize(select))
    out: list[tuple[str, pds.Expression]] = []
    n_anon = 0
    while True:
        start = p.i
        e = p.or_term()
        name = None
        k, v = p.peek()
        if k == "ident" and v.upper() == "AS":
            p.next()
            kk, vv = p.next()
            if kk not in ("ident", "str"):
                raise ValueError(f"bad alias {vv!r}")
            name = vv
        if name is None:
            # bare single-column reference keeps the column name
            if p.i - start == 1 and p.toks[start][0] == "ident":
                name = p.toks[start][1].strip('"')
            else:
                n_anon += 1
                name = f"expr{n_anon}"
        out.append((name, e))
        k, v = p.peek()
        if (k, v) == ("op", ","):
            p.next()
            continue
        if (k, v) == (None, None):
            return out
        raise ValueError(f"trailing tokens in SELECT: {p.toks[p.i:]}")


def select_batch(batch: pa.Table, select: str) -> pa.Table:
    """Project one Arrow batch through a SELECT-list string (vectorized
    via a dataset scanner projection — expressions evaluate batch-wide,
    no Python row loop)."""
    cols = dict(compile_select(select))
    return pds.dataset(batch).to_table(columns=cols)
