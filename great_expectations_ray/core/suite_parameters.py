"""Suite-parameter expression mini-language.

The reference evaluates ``{"$PARAMETER": "x * 3"}`` through a pyparsing
arithmetic grammar (``core/suite_parameters.py:66+``, grammar documented
there)::

    expop   :: '^'
    multop  :: '*' | '/'
    addop   :: '+' | '-'
    atom    :: PI | E | number | fn '(' expr ')' | '(' expr ')' | name
    factor  :: atom [ expop factor ]*      (right-associative)
    term    :: factor [ multop factor ]*
    expr    :: term [ addop term ]*

This is the same grammar as a dependency-free recursive-descent parser:
numbers, parameter names, ``+ - * / ^`` with conventional precedence,
unary minus, parentheses, the reference's math functions (sin cos tan exp
abs trunc round sgn) and constants (PI, E).  The reference's datetime
helpers (``now()``/``datetime``/``timedelta``) are out of scope here —
pass datetimes as plain parameter values instead.

A bare name that exactly matches a parameter still resolves to the raw
parameter value (any type) — the plain-lookup form; expressions evaluate
numerically.
"""

from __future__ import annotations

import math
import re
from typing import Any

_EPSILON = 1e-12

FUNCTIONS = {
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "exp": math.exp,
    "abs": abs,
    "trunc": lambda a: int(a),
    "round": round,
    "sgn": lambda a: -1 if a < -_EPSILON else 1 if a > _EPSILON else 0,
}

CONSTANTS = {"PI": math.pi, "E": math.e}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op>[-+*/^()]))"
)


class SuiteParameterError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise SuiteParameterError(f"unparseable expression at {s[pos:]!r}")
        if m.group("num") is not None:
            out.append(("num", m.group(0).strip()))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], params: dict[str, Any]):
        self.toks = tokens
        self.i = 0
        self.params = params

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        kind, val = self.next()
        if kind != "op" or val != op:
            raise SuiteParameterError(f"expected {op!r}, got {val!r}")

    def parse(self) -> float:
        v = self.expr()
        if self.i != len(self.toks):
            raise SuiteParameterError(f"trailing tokens: {self.toks[self.i:]!r}")
        return v

    def expr(self) -> float:
        v = self.term()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            _, op = self.next()
            rhs = self.term()
            v = v + rhs if op == "+" else v - rhs
        return v

    def term(self) -> float:
        v = self.factor()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            _, op = self.next()
            rhs = self.factor()
            v = v * rhs if op == "*" else v / rhs
        return v

    def factor(self) -> float:
        v = self.atom()
        if self.peek() == ("op", "^"):  # right-associative
            self.next()
            return v ** self.factor()
        return v

    def atom(self) -> float:
        kind, val = self.next()
        if kind == "op" and val == "-":
            return -self.atom()
        if kind == "op" and val == "+":
            return self.atom()
        if kind == "num":
            return float(val)
        if kind == "op" and val == "(":
            v = self.expr()
            self.expect_op(")")
            return v
        if kind == "name":
            if val in FUNCTIONS and self.peek() == ("op", "("):
                self.next()
                arg = self.expr()
                self.expect_op(")")
                return FUNCTIONS[val](arg)
            if val in CONSTANTS:
                return CONSTANTS[val]
            if val in self.params:
                return self.params[val]
            raise SuiteParameterError(f"unknown suite parameter {val!r}")
        raise SuiteParameterError(f"unexpected token {val!r}")


def parse_suite_parameter(expression: str, params: dict[str, Any]) -> Any:
    """Resolve a ``$PARAMETER`` expression against runtime parameter values.

    Plain-name lookups return the raw (possibly non-numeric) parameter value;
    anything else parses through the arithmetic grammar."""
    expression = expression.strip()
    if expression in params:  # plain lookup — preserves value type
        return params[expression]
    tokens = _tokenize(expression)
    if not tokens:
        raise SuiteParameterError("empty suite-parameter expression")
    try:
        return _Parser(tokens, params).parse()
    except SuiteParameterError:
        raise
    except Exception as exc:
        # e.g. a non-numeric parameter value inside arithmetic ('5' * 3.0)
        # — surface as a SuiteParameterError so suite.sub() turns it into a
        # per-expectation failed EVR instead of aborting compilation
        raise SuiteParameterError(
            f"cannot evaluate {expression!r}: {type(exc).__name__}: {exc}"
        ) from exc
