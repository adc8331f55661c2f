"""Deduplication operators for large-scale training-data pipelines.

All operate on a documents DataFrame (doc_id, text). Five strategies,
cheapest to richest:

* exact          — md5(text) group-by; one shuffle on the hash.
* minhash_lsh    — token-set MinHash signatures -> LSH band buckets ->
                   candidate pairs -> exact-Jaccard verify. The
                   standard shingle->minhash->band->bucket-join path;
                   pair generation is linear in bucket sizes, never the
                   quadratic all-pairs join.
* simhash        — 16-bit sign-sum fingerprint; near-dups = pairs with
                   small Hamming distance within a bucket.
* ngram_jaccard  — exact all-pairs token-set Jaccard (quadratic;
                   guarded: for verification / small candidate sets).
* embedding near-dup — see similarity.py (cosine threshold).

Thresholds use integer cross-multiplication (inter * den >= num *
union) so the oracle comparison is float-free.

At 100 TB: tokenization is a narrow op; signatures are one groupBy per
doc (map-side partial min); band join keys are uniform md5 buckets, so
no skew beyond true duplicate clusters (which AQE skew-join splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import N_BANDS, band_columns, minhash_agg_columns, simhash_agg_column


def doc_hashes(documents: DataFrame) -> DataFrame:
    """(doc_id, content_hash) — the exact-dedup primitive."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.col("text")).alias("content_hash"),
    )


def exact_duplicate_groups(documents: DataFrame) -> DataFrame:
    """Hash groups with >1 member: (content_hash, n_docs, min_doc_id).

    The canonical keep-first policy: min_doc_id is the survivor."""
    return (
        doc_hashes(documents)
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def doc_tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, token) distinct token sets — shared by minhash/jaccard."""
    return (
        documents.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh15) — one groupBy, map-side partial mins."""
    return doc_tokens(documents).groupBy("doc_id").agg(*minhash_agg_columns())


def lsh_candidates(
    signatures: DataFrame, n_bands: int = N_BANDS, star: bool = False
) -> DataFrame:
    """Unordered candidate pairs (a < b) sharing >= 1 LSH band.

    star=False (default, the gate-pinned listing semantics): all pairs
    within each band bucket — QUADRATIC in bucket occupancy, which is
    the spec for pair listing but blows up on giant duplicate clusters
    (the sf0.1 corpus holds clusters that yield 2.76M verified pairs
    from 5,000 docs; a 10k-copy boilerplate cluster at 100 TB would be
    ~50M candidates).

    star=True (the survivors-path scale shape): each bucket contributes
    only (bucket-min, member) pairs — LINEAR in occupancy. Dedupe
    connectivity survives (every member links to the bucket rep, and CC
    merges reps across bands), at the cost of pair-listing completeness
    and some chain recall through the verify step (a member similar to
    another member but not to the rep). Use for keep-first dedupe over
    corpora with giant near-dup clusters; test_star_candidates_* pins
    linear counts and survivor equality on mutual clusters.
    """
    banded = signatures.select("doc_id", *band_columns(n_bands))
    pairs = None
    for b in range(n_bands):
        bk = F.col(f"band{b}")
        right = banded.select(F.col("doc_id").alias("b"), bk.alias("bk"))
        if star:
            left = banded.groupBy(bk.alias("bk")).agg(
                F.min("doc_id").alias("a")
            )
        else:
            left = banded.select(F.col("doc_id").alias("a"), bk.alias("bk"))
        p = left.join(right, "bk").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(
    tokens: DataFrame,
    pairs: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    tokens_b: DataFrame | None = None,
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs; integer threshold
    inter/union >= num/den. Output (a, b, inter, union_size).
    tokens_b supplies the b-side token sets when the pair sides come
    from DIFFERENT tables (the cross-corpus dedup path); None keeps
    the original single-table plan (one sizes frame joined twice)."""
    tb_src = tokens if tokens_b is None else tokens_b
    ta = tokens.select(F.col("doc_id").alias("a"), "token")
    tb = tb_src.select(F.col("doc_id").alias("b"), "token")
    inter = (
        pairs.join(ta, "a")
        .join(tb, ["b", "token"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sizes_a = tokens.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sizes_b = (
        sizes_a if tokens_b is None
        else tokens_b.groupBy("doc_id").agg(F.count("*").alias("sz"))
    )
    out = (
        inter.join(sizes_a.select(F.col("doc_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes_b.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb")), "b")
        .select(
            "a",
            "b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("union_size"),
        )
        .filter(
            F.col("inter") * threshold_den >= F.col("union_size") * threshold_num
        )
    )
    return out


def minhash_near_duplicates(
    documents: DataFrame, threshold_num: int = 4, threshold_den: int = 5
) -> DataFrame:
    """Full shingle→minhash→band→bucket-join→verify pipeline."""
    tokens = doc_tokens(documents).persist()
    sigs = minhash_signatures(documents)
    cands = lsh_candidates(sigs)
    return jaccard_pairs(tokens, cands, threshold_num, threshold_den)


def lsh_candidates_against(
    batch_sigs: DataFrame, corpus_sigs: DataFrame, n_bands: int = N_BANDS
) -> DataFrame:
    """Cross-table LSH candidates: (a=batch doc, b=corpus doc) sharing
    >= 1 band bucket. No within-batch or within-corpus pairs — this is
    the incremental-ingestion shape, where only new-vs-existing matters."""
    bb = batch_sigs.select("doc_id", *band_columns(n_bands))
    cb = corpus_sigs.select("doc_id", *band_columns(n_bands))
    pairs = None
    for b in range(n_bands):
        left = bb.select(F.col("doc_id").alias("a"), F.col(f"band{b}").alias("bk"))
        right = cb.select(F.col("doc_id").alias("b"), F.col(f"band{b}").alias("bk"))
        p = left.join(right, "bk").select("a", "b")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def near_hits_against(
    batch: DataFrame,
    corpus: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """(a=batch doc, b=corpus doc, inter, union_size): batch documents
    near-duplicating (or exactly duplicating — Jaccard 1.0 is a
    special case) an existing corpus document. The cross-corpus dedup
    an incremental ingestion pipeline runs before admitting a batch.

    Scale shape: the batch side is small by nature (one ingestion
    increment vs the accumulated 100 TB corpus), so its band keys
    broadcast through the bucket join; in production the corpus side's
    signatures/bands are a MATERIALIZED index (computed once per doc at
    admission, not recomputed per batch) and the verify step joins
    token sets of candidate docs only."""
    cands = lsh_candidates_against(
        minhash_signatures(batch), minhash_signatures(corpus)
    )
    return jaccard_pairs(
        doc_tokens(batch),
        cands,
        threshold_num,
        threshold_den,
        tokens_b=doc_tokens(corpus),
    )


def dedup_against(
    batch: DataFrame,
    corpus: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """Batch survivors: rows NOT near-duplicating any corpus document
    (same schema as the batch input). One anti-join on the hit set."""
    hits = near_hits_against(batch, corpus, threshold_num, threshold_den)
    return batch.join(
        hits.select(F.col("a").alias("_h")).distinct(),
        F.col("doc_id").cast("string") == F.col("_h"),
        "left_anti",
    )


MAX_ALL_PAIRS_DOCS = 10_000  # ~5*10^7 pairs; beyond this use minhash_near_duplicates


def ngram_jaccard_all_pairs(
    documents: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_docs: int = MAX_ALL_PAIRS_DOCS,
) -> DataFrame:
    """Exact all-pairs token Jaccard (quadratic — verification tool and
    oracle for the LSH path, never the production path).

    Guarded: raises above max_docs distinct documents so the crossJoin
    can never ship at scale — the scale path is
    minhash_near_duplicates (bucketed, linear in bucket sizes)."""
    tokens = doc_tokens(documents).persist()
    ids = tokens.select("doc_id").distinct()
    n_docs = ids.count()
    if n_docs > max_docs:
        raise ValueError(
            f"ngram_jaccard_all_pairs is quadratic: {n_docs} docs > "
            f"max_docs={max_docs}; use minhash_near_duplicates instead"
        )
    pairs = (
        ids.select(F.col("doc_id").alias("a"))
        .crossJoin(ids.select(F.col("doc_id").alias("b")))
        .filter(F.col("a") < F.col("b"))
    )
    return jaccard_pairs(tokens, pairs, threshold_num, threshold_den)


def dedup_survivors(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Keep-first corpus dedupe: connected components over near-dup
    pairs (a, b), survivor = the component's min doc_id; docs in no
    pair survive untouched. This is the end-to-end "drop the
    duplicates" operator a training-data pipeline runs after any of
    the pair generators above.

    Scale shape: CC is large-star/small-star (O(log n) rounds over the
    PAIR graph only — the full corpus joins once, via left_anti)."""
    from ..operators.cc import connected_components

    cc = connected_components(
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    losers = cc.labels.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id")
    ).join(losers, "doc_id", "left_anti")


def simhashes(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 16-bit sign-sum fingerprints."""
    return (
        doc_tokens(documents)
        .groupBy("doc_id")
        .agg(simhash_agg_column().alias("simhash"))
    )


def simhash_near_duplicates(documents: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Pairs whose simhashes differ in <= max_hamming bits.

    Bucketing: 16 bits split into 3 chunks (6/5/5); by pigeonhole any
    pair with hamming <= 2 agrees on at least one full chunk, so a
    3-way bucket join finds every such pair; exact bit_count filter
    afterwards. Output (a, b, hamming)."""
    s = simhashes(documents)
    chunks = [
        s.withColumn("bk", F.concat(F.lit("c0:"), F.col("simhash").bitwiseAND(F.lit(0x3F)).cast("string"))),
        s.withColumn(
            "bk",
            F.concat(
                F.lit("c1:"),
                F.shiftrightunsigned("simhash", 6).bitwiseAND(F.lit(0x1F)).cast("string"),
            ),
        ),
        s.withColumn("bk", F.concat(F.lit("c2:"), F.shiftrightunsigned("simhash", 11).cast("string"))),
    ]
    pairs = None
    for bucketed in chunks:
        left = bucketed.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "bk")
        right = bucketed.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "bk")
        p = left.join(right, "bk").filter(F.col("a") < F.col("b")).select("a", "b", "ha", "hb")
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.distinct()
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def line_dedup(documents: DataFrame) -> DataFrame:
    """Corpus-wide line-level dedup (the RefinedWeb/MassiveText line
    transformation): every line that appears anywhere else in the
    corpus survives only at its FIRST occurrence — ordered by
    (doc_id, line_idx) — and is removed everywhere else; documents are
    reassembled from their surviving lines.

    Returns (doc_id, text, n_kept_lines, n_removed_lines) for EVERY
    input doc (a doc whose lines all lose dedup comes back with
    text='').

    Determinism is cross-engine: the occurrence order key is the
    sortable string doc_id||'#'||lpad(line_idx, 6, '0') so Spark's
    min() and DuckDB's MIN() pick the identical winner. DOCUMENTED
    BOUND: the 6-digit pad means first-occurrence order is only correct
    for documents up to 999,999 lines; widening it is an oracle-SQL
    change (both sides must move together — the oracle text was frozen
    for the r6 optimization round, so the bound is pinned here instead).

    100 TB shape: one explode by line (data ~ corpus lines), ONE
    groupBy on md5(line) for the winner (min-agg, map-side partials
    absorb boilerplate-line skew before the shuffle), one shuffle join
    back on the same key, one groupBy(doc_id) to reassemble. No
    windows over the whole corpus, no driver-side state.
    """
    lines = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx0", "line"),
    ).select(
        "doc_id",
        (F.col("idx0") + 1).alias("idx"),
        "line",
        F.md5(F.col("line")).alias("k"),
        F.concat(
            F.col("doc_id"),
            F.lit("#"),
            F.lpad((F.col("idx0") + 1).cast("string"), 6, "0"),
        ).alias("okey"),
    )
    winners = lines.groupBy("k").agg(F.min("okey").alias("w"))
    flagged = lines.join(winners, "k").withColumn(
        "keep", F.col("okey") == F.col("w")
    )
    kept_struct = F.when(F.col("keep"), F.struct("idx", "line"))
    return flagged.groupBy("doc_id").agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
                "\n",
            ),
            F.lit(""),
        ).alias("text"),
        F.count_if(F.col("keep")).cast("bigint").alias("n_kept_lines"),
        F.count_if(~F.col("keep")).cast("bigint").alias("n_removed_lines"),
    )
