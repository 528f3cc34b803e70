"""GX condition mini-DSL -> vectorized batch mask.

The reference parses ``col("x") > 5`` style conditions with pyparsing and
translates them per backend (``expectations/row_conditions.py:37-66,127,173``).
We compile the same surface syntax to a function ``pa.Table -> np.bool_[n]``
evaluated with pyarrow.compute — one compile per suite, applied per batch.

Supported grammar (the subset GX's DSL supports):

    expr     := term (('and'|'or') term)*
    term     := col("name") op literal | col("name").notnull() | col("name").isnull()
    op       := > >= < <= == !=
    literal  := number | "string" | 'string'
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TERM = re.compile(
    r"""col\(\s*["']([^"']+)["']\s*\)\s*"""
    r"""(?:(>=|<=|==|!=|>|<)\s*("""
    r"""-?\d+\.\d+|-?\d+|"[^"]*"|'[^']*'"""
    r""")|\.(notnull|isnull)\(\s*\))""",
    re.X,
)
_CONNECTOR = re.compile(r"\s*(and|or)\s*", re.I)

_OPS = {
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def _parse_literal(raw: str):
    if raw[0] in "\"'":
        return raw[1:-1]
    if re.fullmatch(r"-?\d+", raw):
        return int(raw)
    return float(raw)


def _parse_condition(
    condition: str,
) -> tuple[list[tuple[str, str | None, object]], list[str]]:
    """Shared parse: DSL string -> (terms, connectors)."""
    pos = 0
    terms: list[tuple[str, str | None, object]] = []
    connectors: list[str] = []
    while pos < len(condition):
        m = _TERM.match(condition, pos)
        if m is None:
            stripped = condition[pos:].strip()
            if not stripped:
                break
            raise ValueError(f"cannot parse row_condition at: {stripped!r}")
        name, op, lit, nullop = m.groups()
        if nullop:
            terms.append((name, nullop, None))
        else:
            terms.append((name, op, _parse_literal(lit)))
        pos = m.end()
        cm = _CONNECTOR.match(condition, pos)
        if cm:
            connectors.append(cm.group(1).lower())
            pos = cm.end()
    return terms, connectors


def row_condition_to_sql(condition: str) -> str:
    """Compile the same DSL surface to an ANSI-SQL predicate — the pushdown
    path of ``read_sql_source`` (reference
    ``sqlalchemy_execution_engine.py``'s row-condition translation; the
    reference DSL likewise lowers to SQLAlchemy filters).

    Left-to-right association matches ``compile_row_condition``; the flat
    chain is emitted with explicit parens so SQL's and/or precedence cannot
    diverge from the DSL's."""
    terms, connectors = _parse_condition(condition)
    if not terms:
        raise ValueError(f"empty row_condition: {condition!r}")

    def term_sql(name: str, op: str | None, lit: object) -> str:
        ident = '"' + name.replace('"', '""') + '"'
        if op == "notnull":
            return f"{ident} IS NOT NULL"
        if op == "isnull":
            return f"{ident} IS NULL"
        sql_op = {"==": "=", "!=": "<>"}.get(op, op)
        if isinstance(lit, str):
            return f"{ident} {sql_op} '" + lit.replace("'", "''") + "'"
        return f"{ident} {sql_op} {lit!r}"

    out = term_sql(*terms[0])
    for conn, term in zip(connectors, terms[1:]):
        out = f"({out}) {conn.upper()} ({term_sql(*term)})"
    return out


def compile_row_condition(condition: str) -> Callable[[pa.Table], np.ndarray]:
    """Compile a DSL string once; returns a per-batch mask function.

    'and'/'or' associate left-to-right without precedence or parens — matching
    the flat ConditionParser grammar of the reference (row_conditions.py:59-66).
    """
    terms, connectors = _parse_condition(condition)
    if not terms:
        raise ValueError(f"empty row_condition: {condition!r}")

    def mask(tbl: pa.Table) -> np.ndarray:
        out = None
        for i, (name, op, lit) in enumerate(terms):
            col = tbl.column(name)
            if op == "notnull":
                m_ = pc.is_valid(col)
            elif op == "isnull":
                m_ = pc.is_null(col)
            else:
                m_ = _OPS[op](col, pa.scalar(lit))
            m_np = np.asarray(pc.fill_null(m_, False).combine_chunks(), dtype=bool)
            if out is None:
                out = m_np
            elif connectors[i - 1] == "and":
                out = out & m_np
            else:
                out = out | m_np
        return out

    return mask
