"""Corpus construction: deterministic interleaved-document synthesis.

The pipeline's contract input is an Iceberg/parquet table
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json input_hint). Two deterministic producers:

1. ``spanify(documents_df)`` — derives the interleaved spans table from
   the driver's flat ``documents`` parquet (doc_id, text, ...) with a
   pure, SQL-expressible rule, so the DuckDB oracle can compute the
   exact same table (see oracle.py). This is the corpus used for the
   correctness gate and benchmarks.

2. ``synthesize(spark, n_docs, seed)`` — a self-contained seeded
   generator producing richer span arrays (params, nesting markers,
   zipf-skewed media refs) for unit/property tests.

Spanify rule (0-based token index i over whitespace-split text):
  kind  = def|call|class|import|image|text  by i % 11 (0,2,4,6,8, else)
  text  = "tok(next)"     for def/class  (next = following token or '')
          "prev.tok"      for call when i % 22 == 13 (dotted ~half)
          "tok"           for call when i % 22 == 2
          "lib.tok"       for import
          ""              for image
          tok             otherwise
  media_ref = "img_" + tok  for image, '' otherwise   (zipf-ish: the
              testdata vocabulary is skewed, so hub media refs emerge)
  offset = i
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCUMENTS


def _span_struct(toks: Column, i: Column) -> Column:
    """One span struct for token index i (0-based); pure column expr."""
    tok = F.coalesce(F.get(toks, i), F.lit(""))
    nxt = F.coalesce(F.get(toks, i + 1), F.lit(""))
    prv = F.coalesce(F.get(toks, i - 1), F.lit(""))
    m11 = i % 11
    kind = (
        F.when(m11 == 0, "def")
        .when(m11 == 2, "call")
        .when(m11 == 4, "class")
        .when(m11 == 6, "import")
        .when(m11 == 8, "image")
        .otherwise("text")
    )
    text = (
        F.when((m11 == 0) | (m11 == 4), F.concat(tok, F.lit("("), nxt, F.lit(")")))
        .when((m11 == 2) & (i % 22 == 13), F.concat(prv, F.lit("."), tok))
        .when(m11 == 6, F.concat(F.lit("lib."), tok))
        .when(m11 == 8, F.lit(""))
        .otherwise(tok)
    )
    media_ref = F.when(m11 == 8, F.concat(F.lit("img_"), tok)).otherwise(F.lit(""))
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        i.cast("int").alias("offset"),
    )


def spanify(documents: DataFrame) -> DataFrame:
    """Flat driver documents (doc_id, text, ...) -> interleaved spans table.

    Pure narrow transformation (no shuffle): each input row maps to one
    output row, so it scales linearly with input partitions at 100 TB.
    """
    toks = F.split(F.col("text"), " ")
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: _span_struct(toks, i),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        spans.alias("spans"),
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the driver's flat documents parquet for a scale factor."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's contract input table for a scale factor."""
    return spanify(load_documents(spark, sf_dir))


# ---------------------------------------------------------------------------
# Self-contained synthetic corpus (tests only; richer dialect than spanify)
# ---------------------------------------------------------------------------

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


def synthesize_rows(n_docs: int, seed: int = 42) -> list[tuple[str, list[tuple]]]:
    """Deterministic interleaved documents as plain Python rows.

    Media refs are drawn zipf-like (rank-weighted) so hub entities exist
    for skew tests (FIXTURES.md §1).
    """
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        n_spans = rng.randint(5, 50)
        spans = []
        offset = 0
        for _ in range(n_spans):
            r = rng.random()
            w = lambda: _WORDS[min(int(rng.paretovariate(1.2)), len(_WORDS)) - 1]
            if r < 0.20:
                params = ",".join(rng.sample(_WORDS, rng.randint(0, 3)))
                spans.append(("def", f"{w()}({params})", "", offset))
            elif r < 0.32:
                sup = w() if rng.random() < 0.5 else ""
                spans.append(("class", f"{w()}({sup})", "", offset))
            elif r < 0.38:
                kind = rng.choice(("interface", "trait", "enum", "struct"))
                sup = w() if rng.random() < 0.5 else ""
                spans.append((kind, f"{w()}({sup})", "", offset))
            elif r < 0.44:
                kind = rng.choice(("var", "var", "const"))
                val = f"={w()}" if rng.random() < 0.5 else ""
                spans.append((kind, f"{w()}{val}", "", offset))
            elif r < 0.58:
                callee = f"{w()}.{w()}" if rng.random() < 0.5 else w()
                spans.append(("call", callee, "", offset))
            elif r < 0.66:
                spans.append(("import", f"lib.{w()}", "", offset))
            elif r < 0.76:
                kind = rng.choice(("image", "audio", "video"))
                spans.append((kind, "", f"{kind[:3]}_{w()}", offset))
            elif r < 0.81:
                spans.append(("doc", f"docs about {w()}", "", offset))
            else:
                spans.append(("text", " ".join(rng.sample(_WORDS, 3)), "", offset))
            offset += len(spans[-1][1]) + 1
        docs.append((f"doc_{d:06d}", spans))
    return docs


def synthesize(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synthesize_rows(n_docs, seed), schema=DOCUMENTS)
