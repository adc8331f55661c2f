"""Corpus construction: deterministic interleaved-document synthesis.

Round 3: the spanify dialect widened from 5 kinds (mod-11) to the FULL
kind set (mod-23) so every operator the engine implements — type
breadth, var/const payloads, doc attachment, function flags, multiple
supertypes, audio/video media — occurs in driver-verified data
(VERDICT r2 what's-missing #1).

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

Spanify rule (0-based token index i over whitespace-split text; tok =
toks[i], nxt/nx2/nx3 = following tokens or '', prv = previous token;
m = i % 23, cyc = i // 23 — the cycle number alternates the richer
forms so both variants of each kind occur in every corpus):

  m   kind       text
  0   def        "tok(P)"        P = "nxt:nx2=nx3" when cyc odd (typed
                                 param with default) else "nxt"
  2   call       "prv.tok" when cyc odd (dotted FQN) else "tok"
  4   class      "tok(S)"        S = "nxt,nx2" when cyc odd (TWO
                                 supertypes) else "nxt"
  6   import     "lib.tok"
  8   image      ""              media_ref = "img_" + tok
  10  interface  "tok<nx2>(nxt)" when cyc odd (generic param) else
                 "tok(nxt)"
  12  trait      "tok<nx2=nx3>(nxt)" when cyc odd (defaulted generic
                 param) else "tok(nxt)"
  14  enum       "tok<nx2:nx3>(nxt)" when cyc odd (bounded generic
                 param) else "tok(nxt)"
  16  struct     same as enum
  18  var        "tok:nxt=nx2"   (name:type_annotation=value)
  19  const      "tok=nxt"       (name=value)
  20  doc        "tok nxt"       (documentation prose)
  21  audio/video ""             media_ref = ("vid_" when cyc odd else
                                 "aud_") + tok
  22  def        "MOD tok(nxt)->nx2"  MOD = async|static|abstract by
                                 cyc % 3; "->nx2" is the return type
  else text      tok             (unsupported content, skipped)

  media_ref = '' except image/audio/video (zipf-ish: the testdata
              vocabulary is skewed, so hub media refs emerge)
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
    nx2 = F.coalesce(F.get(toks, i + 2), F.lit(""))
    nx3 = F.coalesce(F.get(toks, i + 3), F.lit(""))
    prv = F.coalesce(F.get(toks, i - 1), F.lit(""))
    m = i % 23
    cyc_odd = F.floor(i / 23) % 2 == 1
    mod3 = F.floor(i / 23) % 3
    kind = (
        F.when(m == 0, "def")
        .when(m == 2, "call")
        .when(m == 4, "class")
        .when(m == 6, "import")
        .when(m == 8, "image")
        .when(m == 10, "interface")
        .when(m == 12, "trait")
        .when(m == 14, "enum")
        .when(m == 16, "struct")
        .when(m == 18, "var")
        .when(m == 19, "const")
        .when(m == 20, "doc")
        .when((m == 21) & cyc_odd, "video")
        .when(m == 21, "audio")
        .when(m == 22, "def")
        .otherwise("text")
    )
    paren = lambda name, inner: F.concat(name, F.lit("("), inner, F.lit(")"))  # noqa: E731
    def_params = F.when(
        cyc_odd, F.concat(nxt, F.lit(":"), nx2, F.lit("="), nx3)
    ).otherwise(nxt)
    cls_sups = F.when(cyc_odd, F.concat(nxt, F.lit(","), nx2)).otherwise(nxt)
    modifier = (
        F.when(mod3 == 0, "async").when(mod3 == 1, "static").otherwise("abstract")
    )
    text = (
        F.when(m == 0, paren(tok, def_params))
        .when(m == 2, F.when(cyc_odd, F.concat(prv, F.lit("."), tok)).otherwise(tok))
        .when(m == 4, paren(tok, cls_sups))
        .when(m == 6, F.concat(F.lit("lib."), tok))
        .when(
            m.isin(10, 12, 14, 16),
            F.concat(
                tok,
                # generic-parameter list on the odd cycles: plain name
                # for interface/trait, ':'-bounded for enum/struct
                # (GenericParameter shapes, java.rs:116-204)
                F.when(cyc_odd & (m == 10), F.concat(F.lit("<"), nx2, F.lit(">")))
                .when(
                    cyc_odd & (m == 12),
                    F.concat(F.lit("<"), nx2, F.lit("="), nx3, F.lit(">")),
                )
                .when(
                    cyc_odd & m.isin(14, 16),
                    F.concat(F.lit("<"), nx2, F.lit(":"), nx3, F.lit(">")),
                )
                .otherwise(F.lit("")),
                F.lit("("),
                nxt,
                F.lit(")"),
            ),
        )
        .when(m == 18, F.concat(tok, F.lit(":"), nxt, F.lit("="), nx2))
        .when(m == 19, F.concat(tok, F.lit("="), nxt))
        .when(m == 20, F.concat(tok, F.lit(" "), nxt))
        .when(m.isin(8, 21), F.lit(""))
        .when(m == 22, F.concat(modifier, F.lit(" "), paren(tok, nxt), F.lit("->"), nx2))
        .otherwise(tok)
    )
    media_ref = (
        F.when(m == 8, F.concat(F.lit("img_"), tok))
        .when((m == 21) & cyc_odd, F.concat(F.lit("vid_"), tok))
        .when(m == 21, F.concat(F.lit("aud_"), tok))
        .otherwise(F.lit(""))
    )
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
                gen = rng.random()
                tp = (
                    f"<{w()}:{w()}&{w()}>" if gen < 0.2
                    else f"<{w()},{w()}={w()}>" if gen < 0.4
                    else f"<{w()}>" if gen < 0.6
                    else ""
                )
                spans.append((kind, f"{w()}{tp}({sup})", "", offset))
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
