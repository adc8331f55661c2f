"""UQL parser — the reference's pest grammar as recursive descent.

Grammar (reference src/query/parser.rs:8-67, src/query/grammar.pest):

    query             = select_query | traversal_query
    select_query      = "select" entity_type ("where" condition)?
    traversal_query   = entity_type relationship entity_type
                        ("where" condition)?
    condition         = simple_condition (logical_op condition)?
                      | "(" condition ")"
                      | "has" attribute
    simple_condition  = attribute operator value
    operator          = "=" | "!=" | ">" | "<" | ">=" | "<=" | "like"
    logical_op        = "and" | "or" | "not"
    value             = 'single-quoted string' | number

Faithful quirks preserved:
* infix "not" DISCARDS its left operand: `a not b` parses to Not(b)
  (parser.rs:308-309 builds Not(right), dropping the left).
* a parenthesized condition cannot be chained with a logical op
  (the grammar's first alternative requires a simple_condition on the
  left), and `has attr` cannot be chained either.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class QueryParseError(ValueError):
    pass


# keyword -> entity_type string (parser.rs:240-261)
ENTITY_KEYWORDS = {
    "functions": "Function",
    "methods": "Method",
    "classes": "Class",
    "interfaces": "Interface",
    "traits": "Trait",
    "structs": "Struct",
    "enums": "Enum",
    "modules": "Module",
    "files": "File",
    "variables": "Variable",
    "fields": "Field",
    "constants": "Constant",
    "domain_concepts": "DomainConcept",
    "types": "Type",
}

# keyword -> pred string (parser.rs:263-280)
RELATIONSHIP_KEYWORDS = {
    "calling": "calls",
    "calls": "calls",
    "containing": "contains",
    "contains": "contains",
    "importing": "imports",
    "imports": "imports",
    "inheriting": "inherits",
    "inherits": "inherits",
    "implementing": "implements",
    "implements": "implements",
    "referencing": "references",
    "references": "references",
    "using": "uses",
    "uses": "uses",
    "depending": "depends_on",
    "depends_on": "depends_on",
    "represented_by": "represented_by",
    "relates_to": "relates_to",
}

OPERATORS = ("!=", ">=", "<=", "=", ">", "<")


# --- AST -------------------------------------------------------------------


@dataclass
class Condition:
    attribute: str
    operator: str  # = != > < >= <= like
    value: str | float
    is_number: bool = False


@dataclass
class HasAttribute:
    attribute: str


@dataclass
class And:
    left: object
    right: object


@dataclass
class Or:
    left: object
    right: object


@dataclass
class Not:
    inner: object


@dataclass
class SelectQuery:
    entity_type: str
    condition: object | None = None


@dataclass
class TraversalQuery:
    source_type: str
    relationship: str
    target_type: str
    condition: object | None = None


# --- Lexer -----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s+            # whitespace (skipped)
      | //[^\n]*       # comment (skipped)
      | '(?:[^'])*'    # quoted string
      | !=|>=|<=|=|>|< # operators
      | \(|\)
      | \d+(?:\.\d+)?  # number
      | [A-Za-z][A-Za-z0-9_]*  # identifier/keyword
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    tokens: list[str] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise QueryParseError(f"Unexpected character at {pos}: {text[pos]!r}")
        tok = m.group(0)
        pos = m.end()
        if tok.strip() and not tok.startswith("//"):
            tokens.append(tok)
    return tokens


# --- Parser ----------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise QueryParseError("Unexpected end of query")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect_done(self) -> None:
        if self.i < len(self.toks):
            raise QueryParseError(f"Trailing tokens: {self.toks[self.i:]}")

    def parse_query(self):
        tok = self.peek()
        if tok == "select":
            self.next()
            etype = self._entity_type()
            cond = self._optional_where()
            self.expect_done()
            return SelectQuery(etype, cond)
        src = self._entity_type()
        rel = self._relationship()
        tgt = self._entity_type()
        cond = self._optional_where()
        self.expect_done()
        return TraversalQuery(src, rel, tgt, cond)

    def _entity_type(self) -> str:
        tok = self.next()
        if tok not in ENTITY_KEYWORDS:
            raise QueryParseError(f"Unknown entity type: '{tok}'")
        return ENTITY_KEYWORDS[tok]

    def _relationship(self) -> str:
        tok = self.next()
        if tok not in RELATIONSHIP_KEYWORDS:
            raise QueryParseError(f"Unknown relationship type: '{tok}'")
        return RELATIONSHIP_KEYWORDS[tok]

    def _optional_where(self):
        if self.peek() == "where":
            self.next()
            return self._condition()
        return None

    def _condition(self):
        tok = self.peek()
        if tok == "(":
            self.next()
            inner = self._condition()
            if self.next() != ")":
                raise QueryParseError("Expected ')'")
            return inner
        if tok == "has":
            self.next()
            attr = self.next()
            if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_]*", attr):
                raise QueryParseError(f"Expected attribute after 'has', got {attr!r}")
            return HasAttribute(attr)
        left = self._simple_condition()
        nxt = self.peek()
        if nxt in ("and", "or", "not"):
            op = self.next()
            right = self._condition()
            if op == "and":
                return And(left, right)
            if op == "or":
                return Or(left, right)
            return Not(right)  # faithful: left discarded (parser.rs:308)
        return left

    def _simple_condition(self):
        attr = self.next()
        if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_]*", attr):
            raise QueryParseError(f"Invalid attribute: {attr!r}")
        op = self.next()
        if op not in OPERATORS and op != "like":
            raise QueryParseError(f"Unknown operator: '{op}'")
        val = self.next()
        if val.startswith("'") and val.endswith("'"):
            return Condition(attr, op, val[1:-1], is_number=False)
        if re.fullmatch(r"\d+(\.\d+)?", val):
            return Condition(attr, op, float(val), is_number=True)
        raise QueryParseError(f"Invalid value: {val!r}")


def parse_query(text: str):
    """Query string -> SelectQuery | TraversalQuery (raises QueryParseError)."""
    return _Parser(_tokenize(text)).parse_query()
