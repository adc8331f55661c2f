"""Benchmark decontamination: flag corpus documents that share a
k-token gram with a held-out benchmark/eval set — the standard
train/test-overlap check a training-data pipeline runs before any
model sees the corpus (the GPT-3/PaLM-style 13-gram rule, here with a
configurable k so the short driver documents still produce grams).

Scale shape (the 100 TB story): the corpus side explodes to DISTINCT
(doc_id, gram-hash) pairs — one narrow projection, no shuffle until
the final per-doc aggregate. The benchmark side is tiny by nature
(eval suites are MBs against a 100 TB corpus), so its distinct gram
set is BROADCAST: the contamination join is map-side, the corpus is
never shuffled by gram, and the only exchange is the per-doc hash agg
of the (few) matching rows. Grams travel as the md5-derived 64-bit
cross-engine hash (datapipe.hashing), not strings — 8 bytes per gram
instead of ~50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import token_hash

DECONTAM_K = 8  # tokens per gram (13 in the classic rule; driver docs are 10-99 tokens)


def _gram_hashes(df: DataFrame, k: int) -> DataFrame:
    """(doc_id, g): distinct k-gram hashes per document."""
    toks = F.split(F.col("text"), " ")
    n_grams = F.size(toks) - k + 1
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: token_hash(F.concat_ws(" ", F.slice(toks, i + 1, k)), 0),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.array_distinct(grams)).alias("g"),
    )


def contamination(
    documents: DataFrame, benchmark: DataFrame, k: int = DECONTAM_K
) -> DataFrame:
    """(doc_id, n_hit_grams, n_bench_docs): corpus documents sharing at
    least one k-gram with the benchmark set, with the number of
    distinct contaminated grams and of distinct benchmark documents
    hit. Clean documents are absent (inner join) — the decontamination
    filter is a left_anti of the corpus against this frame.

    `benchmark` needs (doc_id, text); its gram set is broadcast.
    """
    corpus_grams = _gram_hashes(documents, k)
    bench_grams = _gram_hashes(benchmark, k).select(
        F.col("g"), F.col("doc_id").alias("bench_id")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("bigint").alias("n_hit_grams"),
            F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs"),
        )
    )


def decontaminate(
    documents: DataFrame, benchmark: DataFrame, k: int = DECONTAM_K
) -> DataFrame:
    """The corpus minus contaminated documents (same schema as input).
    One broadcast join + one anti join; the corpus is never shuffled."""
    hits = contamination(documents, benchmark, k).select(
        F.col("doc_id").alias("_cid")
    )
    return documents.join(
        hits,
        documents["doc_id"].cast("string") == hits["_cid"],
        "left_anti",
    )
