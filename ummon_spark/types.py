"""Entity / relationship type vocabulary + the Other(x) round-trip.

The reference stores type names as strings and parses them back with a
catch-all: any unknown string becomes ``Other(content)``, and a literal
"Other(x)" wrapper is stripped back to ``x``
(reference src/db.rs:1041-1106 parse_entity_type /
parse_relationship_type). Our tables already store types as plain
strings, so custom types round-trip through parquet natively; these
helpers provide the same canonicalization — known names pass through,
"Other(x)" unwraps to x, anything else is its own custom type name —
so a graph written by the reference (or by a user with custom types)
reads back with identical semantics.
"""

from __future__ import annotations

# entity.rs:69-86 (14 named variants + Other)
KNOWN_ENTITY_TYPES = frozenset(
    {
        "Function",
        "Method",
        "Class",
        "Interface",
        "Trait",
        "Struct",
        "Enum",
        "Module",
        "File",
        "Variable",
        "Field",
        "Constant",
        "DomainConcept",
        "Type",
    }
)

# relationship.rs:24-37 (12 named variants + Other); stored lowercase
# in our edge tables (pred column)
KNOWN_PREDS = frozenset(
    {
        "calls",
        "contains",
        "imports",
        "inherits",
        "implements",
        "references",
        "defines",
        "uses",
        "depends",
        "represented_by",
        "relates_to",
        "depends_on",
        "depicts",
    }
)


def _unwrap_other(type_str: str) -> str:
    if type_str.startswith("Other(") and type_str.endswith(")"):
        return type_str[len("Other(") : -1]
    return type_str


def parse_entity_type(type_str: str) -> str:
    """Canonical entity-type string: known names verbatim; an
    "Other(x)" wrapper unwraps to x; any other string IS the custom
    type (db.rs:1041-1073)."""
    if type_str in KNOWN_ENTITY_TYPES:
        return type_str
    return _unwrap_other(type_str)


def parse_relationship_type(pred_str: str) -> str:
    """Same round-trip for relationship types (db.rs:1076-1106)."""
    if pred_str in KNOWN_PREDS:
        return pred_str
    return _unwrap_other(pred_str)


def is_custom_pred(pred_str: str) -> bool:
    """True for Other(...) relationship types — traversals over them
    follow BOTH directions (db_executor.rs:77)."""
    return parse_relationship_type(pred_str) not in KNOWN_PREDS
