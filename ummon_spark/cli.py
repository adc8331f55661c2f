"""CLI mirroring the reference's `ummon index|query|assist` surface
(reference src/cli.rs:14-115, src/main.rs), so a reference user can
switch command-for-command:

  python -m ummon_spark.cli index  <input_dir> --output graph/ [--full]
  python -m ummon_spark.cli query  "<uql or NL>" --graph graph/
      [--format text|json|csv|tree] [--limit N] [--no-llm]
  python -m ummon_spark.cli assist "<instruction>" --graph graph/

Quirk preserved: the reference declares --type-filter / --path /
--exact on `query` but never consumes them (cli.rs:65-77 — the flags
are dead); they are accepted and ignored here with a warning so
existing invocations keep working.

Natural-language mode (the default, like the reference) needs an LLM:
provider/model/key come from --llm-provider / --llm-model /
$UMMON_SPARK_API_KEY and requests go through a stdlib urllib transport.
--no-llm executes the structured syntax directly.
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark():
    from .session import get_spark

    return get_spark("ummon_spark_cli")


def _load_graph(spark, graph_dir: str):
    nodes = spark.read.parquet(f"{graph_dir}/nodes")
    edges = spark.read.parquet(f"{graph_dir}/edges")
    return nodes, edges


def _urllib_transport(url: str, headers: dict, body: str) -> str:
    import urllib.request

    req = urllib.request.Request(
        url, data=body.encode(), headers=headers, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:  # noqa: S310
        return resp.read().decode()


def _parse_extra_headers(raw: str) -> dict[str, str]:
    """Extra provider headers from $UMMON_SPARK_EXTRA_HEADERS: a JSON
    object ('{"Name": "value"}') — the escape-safe form, values may
    contain any character including '|' — or the legacy
    'Name: value|Name2: v2' pipe-joined pairs. Malformed input warns on
    stderr instead of silently dropping (full header name AND value are
    caller territory either way)."""
    raw = raw.strip()
    if not raw:
        return {}
    if raw.startswith("{"):
        import json

        try:
            obj = json.loads(raw)
            return {str(k): str(v) for k, v in obj.items()}
        except (ValueError, AttributeError):
            print(
                "warning: UMMON_SPARK_EXTRA_HEADERS looks like JSON but "
                "does not parse; no extra headers applied",
                file=sys.stderr,
            )
            return {}
    extra = {}
    for pair in raw.split("|"):
        if ":" in pair:
            name, _, value = pair.partition(":")
            extra[name.strip()] = value.strip()
        elif pair.strip():
            print(
                f"warning: malformed header pair {pair.strip()!r} in "
                "UMMON_SPARK_EXTRA_HEADERS ignored (want 'Name: value', "
                "or use the JSON object form)",
                file=sys.stderr,
            )
    return extra


def _llm_callable(provider: str | None, model: str | None):
    from .llm import LLMConfig, query_llm

    if os.environ.get("UMMON_SPARK_API_VERSION"):
        print(
            "warning: UMMON_SPARK_API_VERSION is no longer consumed; pass "
            "the provider's version header via UMMON_SPARK_EXTRA_HEADERS",
            file=sys.stderr,
        )
    extra = _parse_extra_headers(os.environ.get("UMMON_SPARK_EXTRA_HEADERS", ""))
    cfg = LLMConfig(
        provider=provider or "openai",
        model=model or LLMConfig.model,
        api_key=os.environ.get("UMMON_SPARK_API_KEY", ""),
        extra_headers=extra,
    )
    return lambda prompt: query_llm(prompt, cfg, _urllib_transport)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ummon_spark")
    sub = p.add_subparsers(dest="command", required=True)

    ix = sub.add_parser("index", help="build or update the knowledge graph")
    ix.add_argument("path", nargs="?", default=".")
    ix.add_argument("--output", required=True)
    ix.add_argument("--full", action="store_true")
    ix.add_argument("--checkpoints")
    ix.add_argument("--canonicalize", action="store_true")
    ix.add_argument("--enable-domain-extraction", action="store_true")

    q = sub.add_parser("query", help="query the knowledge graph")
    q.add_argument("query")
    q.add_argument("--graph", required=True)
    q.add_argument(
        "--format", "-f", default="text", choices=("text", "json", "csv", "tree")
    )
    q.add_argument("--limit", "-l", type=int, default=20)
    q.add_argument("--no-llm", action="store_true")
    q.add_argument("--llm-provider")
    q.add_argument("--llm-model")
    # declared-but-unused in the reference (cli.rs:65-77); kept for
    # drop-in compatibility
    q.add_argument("--type-filter", "-t")
    q.add_argument("--path", "-p", dest="path_filter")
    q.add_argument("--exact", "-e", action="store_true")

    a = sub.add_parser("assist", help="AI-assisted recommendations")
    a.add_argument("instruction")
    a.add_argument("--graph", required=True)
    a.add_argument("--llm-provider")
    a.add_argument("--llm-model")

    args = p.parse_args(argv)
    spark = _spark()

    if args.command == "index":
        from .commands import index as run_index

        g = run_index(
            spark,
            args.path,
            args.output,
            full=args.full,
            checkpoints=args.checkpoints,
            canonicalize=args.canonicalize,
        )
        if args.enable_domain_extraction:
            print(
                "domain extraction needs an LLM endpoint; run "
                "domain.extract_domain_model with an injected scorer",
                file=sys.stderr,
            )
        n = g.edges.count() if hasattr(g, "edges") else -1
        print(f"indexed: {n} triples -> {args.output}")
        return 0

    if args.command == "query":
        from .commands import query as run_query
        from .query.parser import QueryParseError, parse_query

        if args.type_filter or args.path_filter or args.exact:
            print(
                "note: --type-filter/--path/--exact are accepted but unused "
                "(reference-parity: cli.rs declares them and never consumes them)",
                file=sys.stderr,
            )
        nodes, edges = _load_graph(spark, args.graph)
        natural = False
        if not args.no_llm:
            # the reference tries structured parse first, falls back to NL
            try:
                parse_query(args.query)
            except QueryParseError:
                natural = True
        llm = (
            _llm_callable(args.llm_provider, args.llm_model) if natural else None
        )
        out = run_query(
            nodes,
            edges,
            args.query,
            fmt=args.format,
            limit=args.limit,
            natural=natural,
            llm=llm,
        )
        print(out)
        return 0

    if args.command == "assist":
        from .commands import assist as run_assist

        nodes, edges = _load_graph(spark, args.graph)
        llm = _llm_callable(args.llm_provider, args.llm_model)
        result = run_assist(nodes, edges, args.instruction, llm)
        print(result)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
