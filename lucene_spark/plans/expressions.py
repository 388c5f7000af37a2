"""Lucene expressions module — the JavaScript-like scoring language.

Reference: ``lucene/expressions/src/java/.../js/Javascript.g4`` (the
ANTLR grammar) and ``JavascriptCompiler.java`` + its properties file
(the double-only function table). The reference compiles expressions to
JVM bytecode over ``DoubleValues`` bindings; here the same grammar
compiles to either

  * a pure-Python evaluator (:func:`compile_expression` →
    ``fn(bindings) -> float``) with Java double/long semantics — the
    test/oracle path, or
  * a Catalyst ``Column`` (:func:`to_column`) over a bindings map of
    Columns — the distributed path (everything stays JVM-side; the
    expression becomes one codegen'd projection).

Semantics mirrored from the compiler:

  * all arithmetic in IEEE double; comparisons/boolean ops return
    1.0/0.0; ``&&``/``||``/``!``/ternary test ``!= 0``;
  * bitwise ops and shifts pass through ``(long)`` casts (truncation
    toward zero, two's complement, shift counts masked to 6 bits);
  * the function table is the reference's DEFAULT_FUNCTIONS
    (JavascriptCompiler.properties): abs..tanh, ln/log10/logn,
    min/max/pow/sqrt/atan2; haversin is out of scope (geo distances
    live in operators/geo.py);
  * numbers: decimal/hex (0x) integers and decimal doubles.

Divergence (documented): on the Column path Spark SQL yields NULL for
x/0 where Java doubles give ±Infinity — division guards are the
caller's concern there; the Python evaluator is faithful (numpy IEEE).
"""

from __future__ import annotations

import math
import re

__all__ = ["parse_expression", "compile_expression", "to_column"]

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<num>0[xX][0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*(?:\.[A-Za-z_$][A-Za-z0-9_$]*)*)
    | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!,~^&|<>?:])
    )""", re.X)


def _tokenize(text: str):
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None or m.end() == i:
            rest = text[i:].strip()
            if not rest:
                break
            raise ValueError(f"unparsable expression at {rest[:20]!r}")
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
        i = m.end()
    out.append(("end", ""))
    return out


# AST: ("num", float) | ("var", name) | ("call", name, [args])
#    | ("un", op, x) | ("bin", op, a, b) | ("cond", c, t, f)

#: the reference's DEFAULT_FUNCTIONS (JavascriptCompiler.properties)
#: name -> arity
FUNCTIONS = {
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1, "atan": 1,
    "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1, "cosh": 1, "exp": 1,
    "floor": 1, "ln": 1, "log10": 1, "logn": 2, "max": 2, "min": 2,
    "pow": 2, "sin": 1, "sinh": 1, "sqrt": 1, "tan": 1, "tanh": 1,
}

# binary precedence, low -> high (grammar rule order in Javascript.g4)
_PREC = {
    "||": 1, "&&": 2, "|": 3, "^": 4, "&": 5,
    "==": 6, "!=": 6,
    "<": 7, "<=": 7, ">": 7, ">=": 7,
    "<<": 8, ">>": 8, ">>>": 8,
    "+": 9, "-": 9,
    "*": 10, "/": 10, "%": 10,
}


def parse_expression(text: str):
    """Parse to an AST tuple tree (grammar: Javascript.g4)."""
    toks = _tokenize(text)
    pos = 0

    def peek():
        return toks[pos]

    def take(expect=None):
        nonlocal pos
        t = toks[pos]
        if expect is not None and t[1] != expect:
            raise ValueError(f"expected {expect!r}, got {t[1]!r}")
        pos += 1
        return t

    def primary():
        kind, val = peek()
        if kind == "num":
            take()
            if val.lower().startswith("0x"):
                return ("num", float(int(val, 16)))
            if re.fullmatch(r"0[0-7]+", val):
                return ("num", float(int(val, 8)))  # OCTAL: '0' [0-7]+
            return ("num", float(val))
        if kind == "name":
            take()
            if peek() == ("op", "("):
                take()
                args = []
                if peek() != ("op", ")"):
                    args.append(ternary())
                    while peek() == ("op", ","):
                        take()
                        args.append(ternary())
                take(")")
                arity = FUNCTIONS.get(val)
                if arity is None:
                    raise ValueError(f"unknown function {val!r}")
                if len(args) != arity:
                    raise ValueError(f"{val} takes {arity} args")
                return ("call", val, args)
            return ("var", val)
        if (kind, val) == ("op", "("):
            take()
            e = ternary()
            take(")")
            return e
        if kind == "op" and val in ("-", "+", "!", "~"):
            take()
            return ("un", val, primary())
        raise ValueError(f"unexpected token {val!r}")

    def binary(min_prec=1):
        left = primary()
        while True:
            kind, val = peek()
            prec = _PREC.get(val) if kind == "op" else None
            if prec is None or prec < min_prec:
                return left
            take()
            right = binary(prec + 1)  # left-assoc
            left = ("bin", val, left, right)

    def ternary():
        cond = binary()
        if peek() == ("op", "?"):
            take()
            t = ternary()
            take(":")
            f = ternary()  # right-assoc
            return ("cond", cond, t, f)
        return cond

    e = ternary()
    if peek()[0] != "end":
        raise ValueError(f"trailing input {peek()[1]!r}")
    return e


def _to_long(x: float) -> int:
    """Java (long) cast: truncate toward zero, wrap to 64-bit."""
    if x != x or x in (float("inf"), float("-inf")):
        if x != x:
            return 0
        return (2 ** 63 - 1) if x > 0 else -(2 ** 63)
    v = int(x)  # truncates toward zero
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _wrap64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


_PY_FUNCS = {
    "abs": abs, "acos": math.acos, "acosh": math.acosh, "asin": math.asin,
    "asinh": math.asinh, "atan": math.atan, "atan2": math.atan2,
    "atanh": math.atanh, "ceil": math.ceil, "cos": math.cos,
    "cosh": math.cosh, "exp": math.exp, "floor": math.floor,
    "ln": math.log, "log10": math.log10,
    "logn": lambda base, x: math.log(x) / math.log(base),
    "max": max, "min": min, "pow": math.pow, "sin": math.sin,
    "sinh": math.sinh, "sqrt": math.sqrt, "tan": math.tan,
    "tanh": math.tanh,
}


def _eval(node, b):
    k = node[0]
    if k == "num":
        return node[1]
    if k == "var":
        return float(b[node[1]])
    if k == "call":
        return float(_PY_FUNCS[node[1]](*(_eval(a, b) for a in node[2])))
    if k == "un":
        op, x = node[1], _eval(node[2], b)
        if op == "-":
            return -x
        if op == "+":
            return x
        if op == "!":
            return 1.0 if x == 0 else 0.0
        return float(_wrap64(~_to_long(x)))  # ~
    if k == "cond":
        return _eval(node[2] if _eval(node[1], b) != 0 else node[3], b)
    op, a, c = node[1], _eval(node[2], b), None
    if op == "&&":
        return 1.0 if a != 0 and _eval(node[3], b) != 0 else 0.0
    if op == "||":
        return 1.0 if a != 0 or _eval(node[3], b) != 0 else 0.0
    c = _eval(node[3], b)
    if op == "+":
        return a + c
    if op == "-":
        return a - c
    if op == "*":
        return a * c
    if op == "/":
        if c == 0:
            return float("nan") if a == 0 else math.copysign(
                float("inf"), a) * math.copysign(1.0, c)
        return a / c
    if op == "%":
        if c == 0:
            return float("nan")
        return math.fmod(a, c)  # Java % = IEEE remainder-like fmod
    if op in ("<", "<=", ">", ">=", "==", "!="):
        ok = {"<": a < c, "<=": a <= c, ">": a > c, ">=": a >= c,
              "==": a == c, "!=": a != c}[op]
        return 1.0 if ok else 0.0
    la, lc = _to_long(a), _to_long(c)
    if op == "&":
        return float(_wrap64(la & lc))
    if op == "|":
        return float(_wrap64(la | lc))
    if op == "^":
        return float(_wrap64(la ^ lc))
    sh = lc & 0x3F
    if op == "<<":
        return float(_wrap64(la << sh))
    if op == ">>":
        return float(la >> sh)  # python >> on signed int is arithmetic
    if op == ">>>":
        return float((la & ((1 << 64) - 1)) >> sh)
    raise ValueError(f"unknown op {op!r}")


def compile_expression(text: str):
    """Returns ``fn(bindings: dict[str, float]) -> float`` with the
    reference's double/long semantics."""
    ast = parse_expression(text)
    return lambda bindings: _eval(ast, bindings)


def to_column(text: str, bindings):
    """Compile to a Catalyst Column over a name -> Column bindings map
    (double arithmetic, comparisons as 1.0/0.0). Bitwise/shift operate
    through bigint casts like the reference's (long) conversions."""
    from pyspark.sql import functions as F
    ast = parse_expression(text)

    def col(node):
        k = node[0]
        if k == "num":
            return F.lit(float(node[1]))
        if k == "var":
            return bindings[node[1]].cast("double")
        if k == "call":
            args = [col(a) for a in node[2]]
            name = node[1]
            if name == "ln":
                return F.log(args[0])
            if name == "logn":
                return F.log(args[1]) / F.log(args[0])
            if name == "max":
                return F.greatest(*args)
            if name == "min":
                return F.least(*args)
            if name == "abs":
                return F.abs(args[0])
            if name == "ceil":
                return F.ceil(args[0]).cast("double")
            if name == "floor":
                return F.floor(args[0]).cast("double")
            fn = getattr(F, name, None)
            if fn is None:
                raise ValueError(f"function {name!r} unsupported on the "
                                 "column path")
            return fn(*args)
        if k == "un":
            op = node[1]
            x = col(node[2])
            if op == "-":
                return -x
            if op == "+":
                return x
            if op == "!":
                return F.when(x == 0, F.lit(1.0)).otherwise(F.lit(0.0))
            return (~x.cast("bigint")).cast("double")
        if k == "cond":
            return F.when(col(node[1]) != 0,
                          col(node[2])).otherwise(col(node[3]))
        op, a, b = node[1], col(node[2]), col(node[3])
        if op in ("+", "-", "*", "/", "%"):
            return {"+": a + b, "-": a - b, "*": a * b, "/": a / b,
                    "%": a % b}[op]
        if op in ("<", "<=", ">", ">=", "==", "!="):
            cmp = {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                   "==": a == b, "!=": a != b}[op]
            return F.when(cmp, F.lit(1.0)).otherwise(F.lit(0.0))
        if op == "&&":
            return F.when((a != 0) & (b != 0),
                          F.lit(1.0)).otherwise(F.lit(0.0))
        if op == "||":
            return F.when((a != 0) | (b != 0),
                          F.lit(1.0)).otherwise(F.lit(0.0))
        la, lb = a.cast("bigint"), b.cast("bigint")
        if op == "&":
            return la.bitwiseAND(lb).cast("double")
        if op == "|":
            return la.bitwiseOR(lb).cast("double")
        if op == "^":
            return la.bitwiseXOR(lb).cast("double")
        if op == "<<":
            return F.shiftleft(la, lb.cast("int")).cast("double")
        if op == ">>":
            return F.shiftright(la, lb.cast("int")).cast("double")
        if op == ">>>":
            return F.shiftrightunsigned(la, lb.cast("int")).cast("double")
        raise ValueError(f"unknown op {op!r}")

    return col(ast)
