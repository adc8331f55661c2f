"""Assist command (SURVEY.md §3.3, reference src/commands/assist.rs:8-69
+ src/prompt/context_builder.rs:5-50): relevance-ranked files + a
context listing of every Function/Method entity, handed to an
(injectable) LLM for a recommendation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relevance import suggest_relevant_files


def build_context(nodes: DataFrame, limit: int = 1000) -> str:
    """Context listing of all Function + Method entities
    (context_builder.rs:5-50): "name (file_path)" lines, stable order."""
    rows = (
        nodes.filter(F.col("entity_type").isin("Function", "Method"))
        .select("name", "doc_id")
        .orderBy("name", "doc_id")
        .limit(limit)
        .collect()
    )
    lines = ["Functions and methods in the codebase:"]
    for r in rows:
        loc = f" ({r['doc_id']})" if r["doc_id"] else ""
        lines.append(f"- {r['name']}{loc}")
    return "\n".join(lines)


def assist(
    nodes: DataFrame, edges: DataFrame, instruction: str, llm=None
) -> dict:
    """Returns {files: [...ranked paths...], recommendation: str}."""
    files_df = suggest_relevant_files(nodes, edges, instruction, llm=None)
    files = [r["path"] for r in files_df.collect()]
    context = build_context(nodes)
    prompt = (
        f"Instruction: {instruction}\n\nRelevant files: {', '.join(files)}\n\n"
        f"{context}\n\nRecommend how to implement the instruction."
    )
    recommendation = llm(prompt) if llm is not None else ""
    return {"files": files, "recommendation": recommendation}
