"""Text parser for the expression language -> expression IR.

Grammar and precedence follow the reference's pest grammar
(crates/smql-syntax/src/grammar/smql_v2.1.pest:161-185):

    or < and < equality (== !=) < comparison (> < >= <= matches)
       < additive (+ -) < multiplicative (* / %) < unary (not -)
       < postfix (is null / is not null) < primary

Primary: literal (int/float/string/true/false/null), identifier,
dot-path (alias.column), function call f(a, b), array [a, b],
when { cond then val ... else d }, parenthesized expr.

This gives the reference's config surface (filters, computed columns,
validation rules) a text form: parse("price > 100 and status == 'F'").
"""

from __future__ import annotations

import re

from stratum_spark.functions.expr import (
    Arr,
    Bin,
    Call,
    DotPath,
    Expr,
    Ident,
    IsNotNull,
    IsNull,
    Lit,
    Un,
    When,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<op>&&|\|\||==|!=|>=|<=|[-+*/%<>(),\[\]{}=])
  | (?P<word>[A-Za-z_][A-Za-z_0-9]*(\.[A-Za-z_][A-Za-z_0-9]*)?)
""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "is", "null", "true", "false", "when", "then", "else", "matches"}


class ParseError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unexpected character at {pos}: {text[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        if kind == "op" and val in ("&&", "||"):
            # the reference grammar accepts both spellings
            # (smql_v2.1.pest:39-40 keywords, :69-70 symbol ops)
            out.append(("kw", "and" if val == "&&" else "or"))
        elif kind == "word" and val.lower() in _KEYWORDS and "." not in val:
            out.append(("kw", val.lower()))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> tuple[str, str]:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ParseError(f"expected {val or kind}, got {v!r}")
        return k, v

    def at(self, kind: str, val: str | None = None) -> bool:
        k, v = self.peek()
        return k == kind and (val is None or v == val)

    def accept(self, kind: str, val: str | None = None) -> bool:
        if self.at(kind, val):
            self.next()
            return True
        return False

    # precedence ladder ---------------------------------------------------
    def parse(self) -> Expr:
        e = self.p_or()
        if not self.at("eof"):
            raise ParseError(f"trailing input at token {self.peek()!r}")
        return e

    def p_or(self) -> Expr:
        e = self.p_and()
        while self.accept("kw", "or"):
            e = Bin("or", e, self.p_and())
        return e

    def p_and(self) -> Expr:
        e = self.p_eq()
        while self.accept("kw", "and"):
            e = Bin("and", e, self.p_eq())
        return e

    def p_eq(self) -> Expr:
        e = self.p_cmp()
        while self.at("op", "==") or self.at("op", "!="):
            op = self.next()[1]
            e = Bin(op, e, self.p_cmp())
        return e

    def p_cmp(self) -> Expr:
        e = self.p_add()
        while True:
            if self.at("op") and self.peek()[1] in (">", "<", ">=", "<="):
                op = self.next()[1]
                e = Bin(op, e, self.p_add())
            elif self.at("kw", "matches"):
                self.next()
                e = Bin("matches", e, self.p_add())
            else:
                return e

    def p_add(self) -> Expr:
        e = self.p_mul()
        while self.at("op") and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = Bin(op, e, self.p_mul())
        return e

    def p_mul(self) -> Expr:
        e = self.p_unary()
        while self.at("op") and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            e = Bin(op, e, self.p_unary())
        return e

    def p_unary(self) -> Expr:
        if self.accept("kw", "not"):
            return Un("not", self.p_unary())
        if self.at("op", "-"):
            self.next()
            return Un("-", self.p_unary())
        return self.p_postfix()

    def p_postfix(self) -> Expr:
        e = self.p_primary()
        while self.at("kw", "is"):
            self.next()
            if self.accept("kw", "not"):
                self.expect("kw", "null")
                e = IsNotNull(e)
            else:
                self.expect("kw", "null")
                e = IsNull(e)
        return e

    def p_primary(self) -> Expr:
        k, v = self.peek()
        if k == "int":
            self.next()
            return Lit(int(v))
        if k == "float":
            self.next()
            return Lit(float(v))
        if k == "string":
            self.next()
            body = v[1:-1]
            return Lit(re.sub(r"\\(.)", r"\1", body))
        if k == "kw" and v in ("true", "false"):
            self.next()
            return Lit(v == "true")
        if k == "kw" and v == "null":
            self.next()
            return Lit(None)
        if k == "kw" and v == "when":
            return self.p_when()
        if k == "op" and v == "(":
            self.next()
            e = self.p_or()
            self.expect("op", ")")
            return e
        if k == "op" and v == "[":
            self.next()
            items = []
            if not self.at("op", "]"):
                items.append(self.p_or())
                while self.accept("op", ","):
                    items.append(self.p_or())
            self.expect("op", "]")
            return Arr(tuple(items))
        if k == "word":
            self.next()
            if self.at("op", "("):  # function call
                self.next()
                args = []
                if not self.at("op", ")"):
                    args.append(self.p_or())
                    while self.accept("op", ","):
                        args.append(self.p_or())
                self.expect("op", ")")
                return Call(v, tuple(args))
            if "." in v:
                q, n = v.split(".", 1)
                return DotPath(q, n)
            return Ident(v)
        raise ParseError(f"unexpected token {v!r}")

    def p_when(self) -> Expr:
        # when { c1 then v1  c2 then v2 ... else d }
        self.expect("kw", "when")
        self.expect("op", "{")
        branches: list[tuple[Expr, Expr]] = []
        default: Expr | None = None
        while not self.at("op", "}"):
            if self.accept("kw", "else"):
                default = self.p_or()
                break
            cond = self.p_or()
            self.expect("kw", "then")
            val = self.p_or()
            branches.append((cond, val))
            self.accept("op", ",")
        self.expect("op", "}")
        if not branches:
            raise ParseError("when{} needs at least one branch")
        return When(tuple(branches), default)


def parse_expr(text: str) -> Expr:
    """Parse expression text to IR; compile with functions.compile_expr."""
    return _Parser(text).parse()


def tokenize(text: str) -> list[tuple[str, str]]:
    """Public tokenizer (block parsers embed expression parsing)."""
    return _tokenize(text)


def parse_expr_at(toks: list[tuple[str, str]], start: int) -> tuple[Expr, int]:
    """Parse a maximal expression from a pre-tokenized stream starting at
    `start`; returns (expr, index of the first unconsumed token). Used by
    the smql config parser to embed expressions inside block syntax."""
    p = _Parser.__new__(_Parser)
    p.toks = toks
    p.i = start
    e = p.p_or()
    return e, p.i
