"""OGR-SQL statement executor over Ray Datasets.

The reference executes ``SELECT`` statements against layers through the
generic SQL engine (``GDALDataset::ExecuteSQL`` →
ogr/ogrsf_frmts/generic/ogr_gensql.cpp; dialect reference
doc/source/user/ogr_sql_dialect.rst).  This module re-expresses the
supported statement shape Ray-Data-first:

    SELECT [DISTINCT] select-list
    FROM table
    [WHERE predicate]
    [GROUP BY col, ...]
    [ORDER BY col [ASC|DESC], ...]
    [LIMIT n [OFFSET m]]

- the select-list runs through ``compile_select`` (expressions, scalar
  functions, CAST, aliases) as ONE vectorized scanner projection;
- aggregates COUNT(*) / COUNT / MIN / MAX / SUM / AVG compile to the
  engine's partial+final distributed aggregation
  (stages/aggregate.py:partial_final_agg) — aggregate arguments may be
  arbitrary expressions, evaluated batch-side before the exchange;
- WHERE compiles to a pyarrow predicate (row-group pushdown capable);
- ORDER BY / LIMIT / OFFSET map to ``Dataset.sort`` / ``limit`` plus a
  driver-side slice of the (small, post-LIMIT) head, mirroring
  ogr_gensql's offset skip.

Only single-table FROM is handled here; joins go through
stages/join.py (the reference routes multi-table SELECTs to a
different executor too).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .expr import _tokenize, compile_select, compile_where, select_batch

_AGG_FNS = {"COUNT", "MIN", "MAX", "SUM", "AVG"}

_CLAUSE_RE = re.compile(
    r"\b(SELECT|FROM|WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|OFFSET)\b",
    re.IGNORECASE)


def _split_clauses(sql: str) -> dict:
    """Split a statement into clauses at TOP-LEVEL keywords (quoted
    strings and parenthesized sub-expressions are opaque)."""
    s = sql.strip().rstrip(";")
    # mask string literals and parens so clause keywords inside them
    # don't split
    masked = []
    depth = 0
    in_str = False
    for ch in s:
        if in_str:
            masked.append("_")
            if ch == "'":
                in_str = False
        elif ch == "'":
            masked.append("_")
            in_str = True
        elif ch == "(":
            depth += 1
            masked.append("(")
        elif ch == ")":
            depth -= 1
            masked.append(")")
        else:
            masked.append(ch if depth == 0 else "_")
    masked = "".join(masked)
    hits = [(m.start(), m.end(), re.sub(r"\s+", " ", m.group(1).upper()))
            for m in _CLAUSE_RE.finditer(masked)]
    if not hits or hits[0][2] != "SELECT" or hits[0][0] != 0:
        raise ValueError("statement must start with SELECT")
    out: dict = {}
    for i, (st, en, kw) in enumerate(hits):
        body = s[en:hits[i + 1][0] if i + 1 < len(hits) else len(s)].strip()
        if kw in out:
            raise ValueError(f"duplicate {kw} clause")
        out[kw] = body
    if "FROM" not in out:
        raise ValueError("missing FROM clause")
    return out


def _split_top_commas(s: str) -> list[str]:
    parts, depth, in_str, cur = [], 0, False, []
    for ch in s:
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
        elif ch == "'":
            cur.append(ch)
            in_str = True
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


_AGG_ITEM_RE = re.compile(
    r"^\s*(COUNT|MIN|MAX|SUM|AVG)\s*\((.*)\)\s*(?:AS\s+(\w+))?\s*$",
    re.IGNORECASE | re.DOTALL)


def _balanced(s: str) -> bool:
    """True iff parens in ``s`` are prefix-balanced (depth never goes
    negative, ends at zero), ignoring quoted spans.  A paren-count
    equality alone mis-reads ``SUM(a) + SUM(b)`` as one aggregate with
    arg ``a) + SUM(b`` (ADVICE r3)."""
    depth, in_str = 0, False
    for ch in s:
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and not in_str


def _parse_select_items(select: str):
    """Each item → ('agg', fn, arg_expr, alias) or ('expr', text)."""
    distinct = False
    s = select.strip()
    if re.match(r"^DISTINCT\b", s, re.IGNORECASE):
        distinct = True
        s = s[8:].strip()
    items = []
    for raw in _split_top_commas(s):
        m = _AGG_ITEM_RE.match(raw)
        if m and not _balanced(m.group(2)):
            raise ValueError(
                f"unsupported select item {raw!r}: expressions OVER "
                "aggregates (e.g. SUM(a) + SUM(b)) are not supported")
        if m:
            fn = m.group(1).upper()
            arg = m.group(2).strip()
            alias = m.group(3)
            if alias is None:
                alias = f"{fn.lower()}_{len(items) + 1}"
            items.append(("agg", fn, arg, alias))
        else:
            items.append(("expr", raw))
    return distinct, items


def _mask_strings(s: str) -> str:
    """Copy of ``s`` with only quoted string literals blanked (parens
    kept) — for rewrites that must reach inside function calls but
    never inside literals."""
    out, in_str = [], False
    for ch in s:
        if in_str:
            out.append("_")
            if ch == "'":
                in_str = False
        elif ch == "'":
            out.append("_")
            in_str = True
        else:
            out.append(ch)
    return "".join(out)


def _sub_outside_strings(pattern: re.Pattern, repl: str, text: str) -> str:
    """``pattern.sub(repl, text)`` applied only at positions that are
    OUTSIDE string literals — a raw sub would rewrite 'orders.high'
    → 'high' when table ``orders`` is in FROM (ADVICE r3)."""
    masked = _mask_strings(text)
    out, pos = [], 0
    for m in pattern.finditer(masked):
        out.append(text[pos:m.start()])
        out.append(m.expand(repl) if repl else repl)
        pos = m.end()
    out.append(text[pos:])
    return "".join(out)


def _mask(s: str) -> str:
    """Copy of ``s`` with string literals and parenthesized spans
    blanked, for top-level keyword scanning."""
    out = []
    depth = 0
    in_str = False
    for ch in s:
        if in_str:
            out.append("_")
            if ch == "'":
                in_str = False
        elif ch == "'":
            out.append("_")
            in_str = True
        elif ch == "(":
            depth += 1
            out.append("(")
        elif ch == ")":
            depth -= 1
            out.append(")")
        else:
            out.append(ch if depth == 0 else "_")
    return "".join(out)


_UNION_RE = re.compile(r"\bUNION\s+ALL\b", re.IGNORECASE)
_TAIL_RE = re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE)


def execute_sql(sql: str, tables: dict):
    """Run one OGR-SQL SELECT over named Ray Datasets.

    ``tables``: {name: Dataset}.  Returns a Dataset (or, after
    OFFSET, an Arrow table — OFFSET implies a driver-side slice of the
    already-LIMITed head, which is small by construction; an OFFSET
    without a LIMIT is rejected rather than streamed, by contract).

    ``stmt UNION ALL stmt [...]`` concatenates the member results
    (``ogr_sql_dialect.rst`` UNION ALL layer concatenation); a trailing
    ORDER BY / LIMIT / OFFSET on the last member applies to the WHOLE
    union, per standard SQL."""
    s = sql.strip().rstrip(";")
    m = _UNION_RE.search(_mask(s))
    if m:
        segs, masked = [], _mask(s)
        pos = 0
        for mm in _UNION_RE.finditer(masked):
            segs.append(s[pos:mm.start()])
            pos = mm.end()
        last = s[pos:]
        tail_txt = None
        tm = _TAIL_RE.search(_mask(last))
        if tm:
            tail_txt = last[tm.start():]
            last = last[:tm.start()]
        segs.append(last)
        dss = [execute_sql(seg, tables) for seg in segs]
        out = dss[0]
        for d in dss[1:]:
            out = out.union(d)
        if tail_txt:
            tail_cl = {}
            hits = [(x.start(), x.end(),
                     re.sub(r"\s+", " ", x.group(1).upper()))
                    for x in _TAIL_RE.finditer(_mask(tail_txt))]
            for i, (st, en, kw) in enumerate(hits):
                body = tail_txt[en:hits[i + 1][0] if i + 1 < len(hits)
                                else len(tail_txt)].strip()
                tail_cl[kw] = body
            return _apply_tail(out, tail_cl)
        return out
    cl = _split_clauses(s)
    ds, aliases = _resolve_from(cl["FROM"], tables)
    # strip "alias." qualifiers — column names are unqualified after
    # the join (the reference's gensql secondary-table fields likewise
    # flatten into one schema)
    if aliases:
        qual = re.compile(
            r"\b(" + "|".join(map(re.escape, aliases)) + r")\.")
        for k in ("SELECT", "WHERE", "GROUP BY", "ORDER BY"):
            if k in cl:
                cl[k] = _sub_outside_strings(qual, "", cl[k])

    if "WHERE" in cl:
        pred = compile_where(cl["WHERE"])
        ds = ds.map_batches(lambda b: b.filter(pred),
                            batch_format="pyarrow")

    distinct, items = _parse_select_items(cl["SELECT"])
    has_agg = any(it[0] == "agg" for it in items)
    group_cols = ([c.strip().strip('"')
                   for c in _split_top_commas(cl["GROUP BY"])]
                  if "GROUP BY" in cl else [])

    if has_agg:
        if distinct:
            raise ValueError("DISTINCT with aggregates is unsupported")
        ds = _aggregate(ds, items, group_cols)
        if "HAVING" in cl:
            # HAVING references output aliases (engine extension — the
            # reference's dialect has no HAVING); compiles like WHERE
            hpred = compile_where(cl["HAVING"])
            ds = ds.map_batches(lambda b: b.filter(hpred),
                                batch_format="pyarrow")
    else:
        if group_cols:
            raise ValueError("GROUP BY requires aggregate select items")
        if "HAVING" in cl:
            raise ValueError("HAVING requires aggregates")
        sel = ", ".join(it[1] for it in items)
        ds = ds.map_batches(lambda b: select_batch(b, sel),
                            batch_format="pyarrow")
        if distinct:
            from ..stages.aggregate import partial_final_agg
            names = [n for n, _ in compile_select(sel)]
            ds = partial_final_agg(ds, names, [(None, "count", "__n")]) \
                .map_batches(lambda b: b.drop_columns(["__n"]),
                             batch_format="pyarrow")

    return _apply_tail(ds, cl)


def _apply_tail(ds, cl: dict):
    """ORDER BY / LIMIT / OFFSET application (shared by single
    statements and UNION ALL results)."""
    if "ORDER BY" in cl:
        keys, desc = [], []
        for part in _split_top_commas(cl["ORDER BY"]):
            m = re.fullmatch(r'("?[\w.]+"?)(?:\s+(ASC|DESC))?', part.strip(),
                             re.IGNORECASE)
            if not m:
                raise ValueError(f"bad ORDER BY item {part!r}")
            keys.append(m.group(1).strip('"'))
            desc.append(bool(m.group(2)) and m.group(2).upper() == "DESC")
        ds = ds.sort(keys, descending=desc)

    if "LIMIT" in cl:
        n = int(cl["LIMIT"])
        off = int(cl["OFFSET"]) if "OFFSET" in cl else 0
        ds = ds.limit(n + off)
        if off:
            # post-LIMIT head is small by construction — driver slice,
            # exactly ogr_gensql's iNextIndexFID skip
            t = pa.Table.from_pylist(ds.take_all())
            return t.slice(off, n)
    elif "OFFSET" in cl:
        raise ValueError("OFFSET requires LIMIT")
    return ds


_JOIN_SPLIT_RE = re.compile(r"\b(LEFT\s+JOIN|INNER\s+JOIN|JOIN)\b",
                            re.IGNORECASE)
_ON_RE = re.compile(
    r'^\s*("?[\w.]+"?)\s+ON\s+("?[\w.]+"?)\s*=\s*("?[\w.]+"?)\s*$',
    re.IGNORECASE | re.DOTALL)


def _strip_qual(col: str) -> str:
    return col.strip().strip('"').split(".")[-1]


def _resolve_from(body: str, tables: dict):
    """FROM clause → joined Dataset + the table/alias names seen.
    Grammar: ``src [JOIN|LEFT JOIN t2 ON a = b]*`` where ``src`` is a
    table name or a parenthesized subquery ``(SELECT ...) [AS] alias``
    (equality ON only, the reference's secondary-table join shape,
    doc/source/user/ogr_sql_dialect.rst:410-503).  Subqueries recurse
    through ``execute_sql``; each join is size-dispatched through
    stages/join.py:join_auto.  JOIN keywords are located on the masked
    text so a JOIN inside a subquery never splits the outer clause."""
    from ..stages.join import join_auto

    masked = _mask(body)
    hits = list(_JOIN_SPLIT_RE.finditer(masked))
    segs, kws, pos = [], [], 0
    for m in hits:
        segs.append(body[pos:m.start()])
        kws.append(re.sub(r"\s+", " ", m.group(1).upper()))
        pos = m.end()
    segs.append(body[pos:])

    base = segs[0].strip()
    sub = re.match(r"^\((.*)\)\s*(?:AS\s+)?([A-Za-z_]\w*)?\s*$", base,
                   re.DOTALL | re.IGNORECASE)
    if sub:
        # derived table: FROM (SELECT ...) [AS] alias — recurse
        inner = execute_sql(sub.group(1), tables)
        if isinstance(inner, pa.Table):
            import ray.data as _rd
            inner = _rd.from_arrow(inner)
        ds = inner
        aliases = [sub.group(2)] if sub.group(2) else []
    else:
        base = base.strip('"')
        if not re.fullmatch(r"[A-Za-z_][\w.]*", base):
            raise ValueError(f"unsupported FROM {body!r}")
        if base not in tables:
            raise ValueError(f"unknown table {base!r}")
        ds = tables[base]
        aliases = [base]
    for kw, seg in zip(kws, segs[1:]):
        m = _ON_RE.match(seg)
        if not m:
            raise ValueError(f"bad JOIN clause {seg!r} (need "
                             "'table ON col = col')")
        tname = m.group(1).strip().strip('"')
        if tname not in tables:
            raise ValueError(f"unknown table {tname!r}")
        lcol, rcol = _strip_qual(m.group(2)), _strip_qual(m.group(3))
        # left side of ON must name the accumulated side's column;
        # swap if the user wrote it the other way round
        left_names = set()
        try:
            left_names = set(ds.schema().names)
        except Exception:
            pass
        if left_names and lcol not in left_names and rcol in left_names:
            lcol, rcol = rcol, lcol
        jt = "left" if kw.startswith("LEFT") else "inner"
        ds = join_auto(ds, tables[tname], keys=lcol, right_keys=rcol,
                       join_type=jt)
        aliases.append(tname)
    return ds, aliases


def _aggregate(ds, items, group_cols):
    """Aggregate select items → batch-side argument projection + one
    partial/final grouped exchange.  ``COUNT(DISTINCT expr)`` fuses
    into the same single hash-bucket exchange as the other aggregates
    (stages/aggregate.py:grouped_agg_with_distinct): tag-0 rows carry
    the regular partials, tag-i rows the NULL-filtered distinct pairs."""
    from ..stages.aggregate import partial_final_agg

    aggs, distinct_aggs = [], []
    proj_parts = [f'"{c}"' for c in group_cols]
    keep = []
    for i, it in enumerate(items):
        if it[0] == "expr":
            txt = it[1].strip().strip('"')
            if txt not in group_cols:
                raise ValueError(
                    f"non-aggregate select item {it[1]!r} must appear "
                    "in GROUP BY")
            keep.append(txt)
            continue
        _, fn, arg, alias = it
        keep.append(alias)
        dm = re.match(r"^\s*DISTINCT\s+(.+)$", arg,
                      re.IGNORECASE | re.DOTALL)
        if dm:
            if fn != "COUNT":
                raise ValueError(
                    f"{fn}(DISTINCT ...) is unsupported (COUNT only)")
            col = f"__darg_{i}"
            proj_parts.append(f"{dm.group(1)} AS {col}")
            distinct_aggs.append((col, alias))
            continue
        if fn == "COUNT":
            if arg.strip() != "*":
                raise ValueError(
                    "COUNT takes * or DISTINCT expr")
            aggs.append((None, "count", alias))
        else:
            col = f"__arg_{i}"
            proj_parts.append(f"{arg} AS {col}")
            aggs.append((col, {"AVG": "mean"}.get(fn, fn.lower()), alias))
    if proj_parts:
        sel = ", ".join(proj_parts)
        projected = ds.map_batches(lambda b: select_batch(b, sel),
                                   batch_format="pyarrow")
    else:
        # pure COUNT(*) with no GROUP BY: no argument columns at all —
        # keep one narrow carrier column for the count exchange
        projected = ds.select_columns([ds.schema().names[0]])
    gkeys = group_cols
    if not gkeys:
        projected = projected.map_batches(
            lambda b: b.append_column("__all", pa.array([0] * len(b),
                                                        pa.int8())),
            batch_format="pyarrow")
        gkeys = ["__all"]
    if distinct_aggs:
        # fused plan: one hash-bucket exchange carries the regular
        # partials AND the NULL-filtered distinct pairs; the bucket
        # finalizer merges them — no materialize, no join (r4 verdict:
        # the pieces+left-join plan doubled the query's latency)
        from ..stages.aggregate import grouped_agg_with_distinct
        out = grouped_agg_with_distinct(projected, gkeys, aggs,
                                        distinct_aggs)
    else:
        out = partial_final_agg(projected, gkeys, aggs)
    return out.map_batches(lambda b: b.select(keep),
                           batch_format="pyarrow")
