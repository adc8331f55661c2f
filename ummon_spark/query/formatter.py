"""Result formatting — driver-side render of collected query rows.

Faithful port of the reference's ResultFormatter
(src/query/formatter.rs:50-333): text "name (id) [file_path]", JSON
objects with id/name/type/file_path/metadata, CSV with
union-of-metadata-keys header (sorted) and quote escaping, tree = root
plus 1-hop outgoing children. The text-format limit footer
"(Limited to N results, total: M)" matches src/query/mod.rs:92-106.

Rows are plain dicts with keys id, name, entity_type, and optionally
doc_id (≙ file_path), metadata (dict). A Spark DataFrame's
``.collect()`` rows work via ``row.asDict()``. `file_path` is absent
when doc_id is empty (the reference uses Option<String>).
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Mapping


def _file_path(row: Mapping) -> str | None:
    p = row.get("doc_id") or row.get("file_path")
    return p if p else None


def _norm(rows: Iterable) -> list[Mapping]:
    out = []
    for r in rows:
        out.append(r.asDict() if hasattr(r, "asDict") else dict(r))
    return out


def format_text(rows: Iterable) -> str:
    rows = _norm(rows)
    if not rows:
        return "No entities found"
    lines = []
    for r in rows:
        line = f"{r['name']} ({r['id']})"
        p = _file_path(r)
        if p is not None:
            line += f" [{p}]"
        lines.append(line)
    return "\n".join(lines) + "\n"


def format_json(rows: Iterable) -> str:
    rows = _norm(rows)
    out = []
    for r in rows:
        obj = {"id": r["id"], "name": r["name"], "type": r["entity_type"]}
        p = _file_path(r)
        if p is not None:
            obj["file_path"] = p
        md = r.get("metadata")
        if md:
            obj["metadata"] = dict(md)
        out.append(obj)
    return json.dumps(out, indent=2)


def _escape_csv(value: str) -> str:
    if "," in value or '"' in value or "\n" in value:
        return '"' + value.replace('"', '""') + '"'
    return value


def format_csv(rows: Iterable) -> str:
    rows = _norm(rows)
    if not rows:
        return "No entities found"
    meta_keys: set[str] = set()
    for r in rows:
        meta_keys.update((r.get("metadata") or {}).keys())
    header = ["id", "name", "type", "file_path"] + sorted(meta_keys)
    lines = [",".join(header)]
    for r in rows:
        row = [
            r["id"],
            r["name"],
            r["entity_type"],
            _file_path(r) or "",
        ]
        md = r.get("metadata") or {}
        row += [_escape_csv(str(md.get(k, ""))) for k in sorted(meta_keys)]
        lines.append(",".join(row))
    return "\n".join(lines) + "\n"


def format_tree(rows: Iterable, edges_by_subj: Mapping[str, list], nodes_by_id: Mapping[str, Mapping]) -> str:
    """Tree: each root + its 1-hop outgoing children (formatter.rs:174-219).

    edges_by_subj: id -> list of (pred, obj); nodes_by_id: id -> row.
    """
    rows = _norm(rows)
    if not rows:
        return "No entities found"
    result = []
    processed: set[str] = set()
    for r in rows:
        if r["id"] in processed:
            continue
        processed.add(r["id"])
        result.append(f"{r['name']} ({r['entity_type']})")
        outgoing = edges_by_subj.get(r["id"], [])
        for i, (pred, obj) in enumerate(outgoing):
            prefix = "└─ " if i == len(outgoing) - 1 else "├─ "
            tgt = nodes_by_id.get(obj)
            if tgt is not None:
                result.append(
                    f"  {prefix}{tgt['name']} ({tgt['entity_type']}) <- {pred}"
                )
                processed.add(obj)
        if outgoing:
            result.append("")
    return "\n".join(result) + "\n"


def apply_text_limit(formatted: str, limit: int) -> str:
    """Text-only limit + footer (query/mod.rs:92-106); default limit 20
    CLI / 100 lib (cli.rs:81-82, query/mod.rs:70)."""
    if limit <= 0:
        return formatted
    lines = formatted.splitlines()
    if len(lines) > limit:
        kept = lines[:limit]
        return "{}\n(Limited to {} results, total: {})".format(
            "\n".join(kept), limit, len(lines)
        )
    return formatted


def format_rows(rows: Iterable, fmt: str = "text", limit: int = 0) -> str:
    if fmt == "text":
        return apply_text_limit(format_text(rows), limit)
    if fmt == "json":
        return format_json(rows)
    if fmt == "csv":
        return format_csv(rows)
    raise ValueError(f"Unknown format: {fmt}")
