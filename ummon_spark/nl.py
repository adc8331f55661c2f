"""Natural-language -> UQL translation (SURVEY.md §2.4 D2, reference
src/query/nl_translator.rs:21-142).

Driver-side, not a Spark op: prompt an LLM with the grammar + examples,
extract the `TRANSLATED_QUERY:` / `CONFIDENCE:` lines, and VALIDATE BY
PARSING (nl_translator.rs:134-141) — an untranslatable or unparseable
response is an error, never a guessed query. The LLM callable is
injected; no network access here.
"""

from __future__ import annotations

from dataclasses import dataclass

from .query.parser import QueryParseError, parse_query

PROMPT_TEMPLATE = """You translate natural-language questions about a code
knowledge graph into the Ummon Query Language.

Grammar:
  select <entity_type> [where <condition>]
  <entity_type> <relationship> <entity_type> [where <condition>]
entity types: functions methods classes interfaces traits structs enums
  modules files variables fields constants domain_concepts types
relationships: calls/calling contains/containing imports/importing
  inherits/inheriting implements/implementing references/referencing
  uses/using depends_on/depending represented_by relates_to
conditions: <attr> <op> <value> | has <attr> | and | or | not | ( )
  attrs: name file_path documentation id; ops: = != > < >= <= like

Examples:
  Q: show all functions          -> select functions
  Q: which functions call login? -> functions calling functions where name = 'login'
  Q: classes named Foo           -> select classes where name = 'Foo'

Respond with exactly two lines:
TRANSLATED_QUERY: <query>
CONFIDENCE: <0.0-1.0>

Question: {question}
"""


@dataclass
class Translation:
    query: str
    confidence: float
    ast: object


class TranslationError(ValueError):
    pass


def translate(question: str, llm) -> Translation:
    """llm: callable prompt -> response text."""
    response = llm(PROMPT_TEMPLATE.format(question=question))
    query = None
    confidence = 0.0
    for line in response.splitlines():
        line = line.strip()
        if line.startswith("TRANSLATED_QUERY:"):
            query = line.split(":", 1)[1].strip()
        elif line.startswith("CONFIDENCE:"):
            try:
                confidence = float(line.split(":", 1)[1].strip())
            except ValueError:
                confidence = 0.0
    if not query:
        raise TranslationError("no TRANSLATED_QUERY line in LLM response")
    try:
        ast = parse_query(query)
    except QueryParseError as e:
        raise TranslationError(f"translated query failed to parse: {e}") from e
    return Translation(query=query, confidence=confidence, ast=ast)
