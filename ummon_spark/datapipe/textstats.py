"""Text analysis: language ID, quality scoring, token counting,
document fingerprinting — the per-document filters of a training-data
pipeline. All built-in column expressions (whole-stage codegen; no
Python in the hot path); ratios exposed as integer (num, den) pairs so
oracle comparison is float-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "un", "une", "est", "des"),
    "es": ("el", "la", "los", "y", "un", "una", "es", "de"),
}
LANGS = tuple(sorted(STOPWORDS))  # deterministic tie-break order


def _tokens():
    return F.split(F.col("text"), " ")


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang, best_hits, n_tokens): argmax of
    stopword hits per language; ties break to the alphabetically first
    language. One narrow projection — no shuffle."""
    toks = _tokens()
    hit_cols = []
    for lang in LANGS:
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.array_intersect(toks, words))
        hit_cols.append(hits.alias(f"hits_{lang}"))
    d = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        *hit_cols,
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    pred = F.lit(None).cast("string")
    for lang in reversed(LANGS):  # first lang wins ties
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    return d.select(
        "doc_id",
        pred.alias("predicted_lang"),
        best.cast("bigint").alias("best_hits"),
        "n_tokens",
    )


def quality_stats(documents: DataFrame) -> DataFrame:
    """Per-doc quality features: token/char counts, distinct tokens,
    longest token, stopword hits (all langs) — the inputs of a
    length/stopword-ratio quality filter."""
    toks = _tokens()
    all_stop = F.array(
        *[F.lit(w) for lang in LANGS for w in STOPWORDS[lang]]
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("bigint")
        .alias("max_token_len"),
        F.size(F.array_intersect(F.array_distinct(toks), all_stop))
        .cast("bigint")
        .alias("distinct_stopword_hits"),
    )


def token_counts_by_lang(documents: DataFrame) -> DataFrame:
    """Corpus-level token accounting per declared language."""
    toks = _tokens()
    return (
        documents.select(F.col("lang"), F.size(toks).cast("bigint").alias("n"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# marks — the coarse GPT-2-style split. Simple char classes only, so
# Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_subwords, n_word_runs): token counting under a
    BPE-ish regex pre-tokenizer, alongside the whitespace counts of
    quality_stats. Narrow projection, codegen."""
    subs = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    words = F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+"), 0)
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(subs).cast("bigint").alias("n_subwords"),
        F.size(words).cast("bigint").alias("n_word_runs"),
    )


WINNOW_K = 3  # tokens per shingle
WINNOW_W = 4  # shingle hashes per winnowing window


def winnowed_fingerprints(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, n_selected, fingerprint): winnowing (rolling-hash
    document fingerprinting, Schleimer et al.): hash every k-token
    shingle with the md5-derived cross-engine hash, keep the minimum
    hash of every w-hash window, fingerprint = md5 over the sorted
    distinct selected hashes. Guarantees any shared run of
    >= k + w - 1 tokens contributes a shared selected hash — the
    local-similarity fingerprint the flat bag-of-words one can't give.

    Entirely array expressions per row (no shuffle, no Python)."""
    from .hashing import token_hash

    toks = _tokens()
    n = F.size(toks)
    n_shingles = F.greatest(n - (k - 1), F.lit(1))
    shingle = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    hashes = F.transform(
        F.sequence(F.lit(0), n_shingles - 1),
        lambda i: token_hash(shingle(i), 0),
    )
    # materialize the hash array per row FIRST — inlining it into every
    # window's array_min would re-evaluate the shingle hashing per
    # window (O(n^2) per doc)
    staged = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), hashes.alias("_h")
    )
    n_windows = F.greatest(F.size(F.col("_h")) - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda j: F.array_min(F.slice(F.col("_h"), j + 1, w)),
    )
    selected = F.array_sort(F.array_distinct(mins))
    canon = F.concat_ws(",", F.transform(selected, lambda x: x.cast("string")))
    return staged.select(
        "doc_id",
        F.size(selected).cast("bigint").alias("n_selected"),
        F.md5(canon).alias("fingerprint"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 over the sorted distinct token set —
    an order-insensitive content fingerprint (bag-of-words identity),
    robust to token reordering unlike the exact hash."""
    toks = _tokens()
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(canon).alias("fingerprint"),
    )


TFIDF_TOP_K = 5
IDF_SCALE = 1000


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """(doc_id, term, score, rank): top-k keywords per document by an
    integer-scaled tf-idf — the keyword-extraction stage of a
    training-data pipeline (topic filtering, dedup-by-topic, corpus
    curation).

    score = tf * floor(N * IDF_SCALE / df)  — all bigint arithmetic, so
    Spark and the DuckDB oracle agree bit-exactly (ln-based idf differs
    between JVM Math.log and libm in the last ulp; integer N/df keeps
    the same monotone ordering for single-corpus ranking). Ties break
    on the term string ascending.

    Scale shape: one (doc_id, term) hash agg (map-side partial), one
    term-level df agg, one join of df back onto tf keyed on term —
    common terms make that join skewed, which is exactly what AQE
    skew-join handles (session default on) — then a per-doc top-k
    window (uniform keys). N is a driver-side scalar (one count job,
    8 bytes), broadcast into the expression.
    """
    toks = F.filter(_tokens(), lambda t: t != "")
    terms = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(toks).alias("term"),
    ).select("doc_id", F.lower("term").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.select("doc_id").distinct().count()
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf")
            * F.expr(f"CAST({n_docs * IDF_SCALE} AS BIGINT) DIV df")
        ).cast("bigint").alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )


SAMPLE_SALT_BUCKETS = 32


def stratified_sample(
    documents: DataFrame,
    n_per_stratum: int = 100,
    n_salt: int = SAMPLE_SALT_BUCKETS,
) -> DataFrame:
    """(doc_id, lang, rank): deterministic stratified sample — the
    corpus-curation stage that balances a training mix across strata
    (here: predicted language from language_id). Selection order is
    md5(doc_id): uniform-random in effect but reproducible bit-exactly
    across engines and runs (no RNG state to seed).

    Scale shape: the naive per-stratum top-k is a window partitioned by
    the stratum — with a handful of strata that collapses parallelism
    to n_strata tasks and sorts whole strata. This runs the standard
    two-phase pattern instead: phase 1 takes the local top-k per
    (stratum, salt-bucket) — n_strata * n_salt parallel partitions,
    each sorting only its bucket — phase 2 re-ranks the surviving
    n_strata * n_salt * k rows (tiny) per stratum. The salt comes from
    the hash itself, so the result is IDENTICAL to the single-window
    form (the per-bucket top-k is a superset of the global top-k).
    """
    lang = language_id(documents).select(
        "doc_id", F.col("predicted_lang").alias("lang")
    )
    from pyspark.sql import Window

    keyed = lang.select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id")).alias("_h"),
    ).withColumn(
        "_salt",
        (F.conv(F.substring("_h", 1, 4), 16, 10).cast("long") % n_salt),
    )
    w_local = Window.partitionBy("lang", "_salt").orderBy("_h", "doc_id")
    survivors = keyed.withColumn(
        "_rn", F.row_number().over(w_local)
    ).filter(F.col("_rn") <= n_per_stratum)
    w_global = Window.partitionBy("lang").orderBy("_h", "doc_id")
    return (
        survivors.withColumn(
            "rank", F.row_number().over(w_global).cast("bigint")
        )
        .filter(F.col("rank") <= n_per_stratum)
        .select("doc_id", "lang", "rank")
    )


# --- scrubbing + repetition (round 4 curation additions) -------------------

# conservative, deterministic patterns (RE2/Java-compatible: no
# backrefs/lookaround, so the same regex runs in Spark codegen AND the
# DuckDB oracle). Order matters: URLs first so emails inside URLs are
# already gone.
SCRUB_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 7+ digit runs (phone-like / id-like), optionally dash/space
    # separated; keeps short quantities intact
    ("longnum", r"\d[\d \-]{5,}\d", "<NUM>"),
)


def scrub_text(documents: DataFrame) -> DataFrame:
    """(doc_id, text, scrubbed, n_scrubbed): URLs / emails / long digit
    runs replaced by typed placeholder tokens — the PII/noise scrub
    stage of a training-data pipeline. Pure regexp_replace chain
    (whole-stage codegen, no shuffle); n_scrubbed counts replacements
    so lineage can report scrub rates per partition."""
    # each pattern counts on the PROGRESSIVELY-scrubbed text (ADVICE
    # r4): a pattern nested inside an earlier match (an email or digit
    # run inside a URL) is replaced once and counted once — n_scrubbed
    # is exactly the number of replacements performed. Oracle mirrors
    # the same staging.
    staged = F.col("text")
    n = F.lit(0)
    for _, pat, repl in SCRUB_PATTERNS:
        n = n + F.size(F.regexp_extract_all(staged, F.lit(pat), F.lit(0)))
        staged = F.regexp_replace(staged, pat, repl)
    scrubbed = staged
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text"),
        scrubbed.alias("scrubbed"),
        n.cast("bigint").alias("n_scrubbed"),
    )


def repetition_stats(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, dup_ngrams): duplicate word
    n-gram counts — the Gopher-style repetition quality signal (a doc
    whose trigrams are mostly repeats is boilerplate/spam). Integer
    counts (float-free oracle); one narrow projection, no shuffle:
    the n-gram list and its distinct count are per-row array ops."""
    toks = _tokens()
    n_grams = F.size(toks) - n + 1
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(grams).cast("bigint").alias("n_ngrams"),
        F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct"),
        (F.size(grams) - F.size(F.array_distinct(grams)))
        .cast("bigint")
        .alias("dup_ngrams"),
    )


def line_stats(documents: DataFrame) -> DataFrame:
    """Per-doc line-level quality features — the C4/Gopher line rules
    (keep lines ending in terminal punctuation, drop bullet-heavy and
    fragment-heavy pages): line count, short lines (< 3 words), bullet
    lines ('-'/'*' prefix), lines with terminal punctuation, plus the
    word-level alpha ratio as an integer (num, den) pair. All per-row
    array expressions (whole-stage codegen, no shuffle); integer-only
    so the oracle comparison is float-free."""
    lines = F.split(F.col("text"), "\n")
    n_words_in = lambda l: F.size(F.filter(F.split(l, " "), lambda t: t != ""))
    count_where = lambda pred: F.size(F.filter(lines, pred)).cast("bigint")
    words = F.filter(_tokens(), lambda t: t != "")
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(lines).cast("bigint").alias("n_lines"),
        count_where(lambda l: n_words_in(l) < 3).alias("n_short_lines"),
        count_where(
            lambda l: l.startswith("- ") | l.startswith("* ")
        ).alias("n_bullet_lines"),
        count_where(lambda l: l.rlike('[.!?"]$')).alias("n_punct_lines"),
        F.size(F.filter(words, lambda t: t.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha_words"),
        F.size(words).cast("bigint").alias("n_words"),
    )


CLEAN_MIN_WORDS = 3


def clean_lines(documents: DataFrame, min_words: int = CLEAN_MIN_WORDS) -> DataFrame:
    """(doc_id, text, n_kept_lines, n_dropped_lines): the C4 line
    transformation itself (line_stats is the feature extractor): keep
    only lines with >= min_words words that end in terminal
    punctuation ([.!?"]) and are not bullets; `text` becomes the
    newline-joined kept lines. Pure per-row array expressions —
    whole-stage codegen, no shuffle, no Python."""
    lines = F.split(F.col("text"), "\n")
    n_words_in = lambda l: F.size(F.filter(F.split(l, " "), lambda t: t != ""))
    keep = lambda l: (
        (n_words_in(l) >= min_words)
        & l.rlike('[.!?"]$')
        & ~l.startswith("- ")
        & ~l.startswith("* ")
    )
    kept = F.filter(lines, keep)
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat_ws("\n", kept).alias("text"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        (F.size(lines) - F.size(kept)).cast("bigint").alias("n_dropped_lines"),
    )


TOP_NGRAMS_N = 3
TOP_NGRAMS_K = 20


def top_ngrams(
    documents: DataFrame, n: int = TOP_NGRAMS_N, k: int = TOP_NGRAMS_K
) -> DataFrame:
    """(gram, total_count, n_docs, rank): the corpus-wide top-k word
    n-grams — the heavy-hitter report a curation pipeline uses to spot
    boilerplate (the same grams on millions of pages) before dedup.

    Scale shape: grams are derived per-row (array ops), then ONE hash
    aggregate keyed by gram computes both the total and the distinct
    doc count — count(distinct) over (gram, doc_id) pre-pairs, so the
    agg is two-phase with map-side partials, never a row-level shuffle
    of raw grams per doc occurrence. The global top-k is orderBy+limit
    (TakeOrdered: per-partition heaps, no full sort). Ties break on the
    gram string ascending."""
    toks = _tokens()
    n_grams = F.size(toks) - n + 1
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(grams).alias("gram"),
    )
    agg = exploded.groupBy("gram").agg(
        F.count("*").cast("bigint").alias("total_count"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("total_count").desc(), F.col("gram").asc())
    return (
        agg.orderBy(F.col("total_count").desc(), F.col("gram").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def scrub_documents(documents: DataFrame) -> DataFrame:
    """Same schema as the input with `text` replaced by its scrubbed
    form — the in-place variant curation chains use (scrub_text is the
    analytical form with counters)."""
    scrubbed = F.col("text")
    for _, pat, repl in SCRUB_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return documents.withColumn("text", scrubbed)


NORMALIZE_FORM = "NFC"


def normalize_text(documents: DataFrame) -> DataFrame:
    """(doc_id, norm_text, changed): Unicode NFC normalization — the
    canonical-composition cleaning step a multilingual corpus needs
    before hashing/dedup (the same logical text arrives both composed
    and decomposed from different sources and would otherwise dedupe
    as distinct).

    Spark has no NFC builtin, so this is a deliberate Arrow
    `mapInPandas` stage (the documented slow-path policy: Python only
    where the JVM genuinely lacks the operator) over Python's
    unicodedata — which implements the same Unicode canonical
    composition as the DuckDB oracle's `nfc_normalize` (verified
    equal on combining sequences). Narrow input projection, no
    shuffle; at 100 TB this is a map-only pass whose cost is the
    Arrow transfer of the text column.
    """
    import unicodedata

    import pandas as pd

    def run(batches):
        for pdf in batches:
            norm = pdf["text"].map(
                lambda t: unicodedata.normalize(NORMALIZE_FORM, t)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "norm_text": norm,
                    "changed": norm != pdf["text"],
                }
            )

    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    ).mapInPandas(run, "doc_id string, norm_text string, changed boolean")


RARITY_SCALE = 1_000_000


def rarity_scores(documents: DataFrame, scale: int = RARITY_SCALE) -> DataFrame:
    """(doc_id, n_tokens, rarity_score): mean inverse corpus frequency
    of a document's tokens — the integer-exact stand-in for unigram
    perplexity as a quality-filter signal (documents dominated by
    corpus-rare tokens score high: boilerplate scores low, gibberish
    and OCR noise score very high; filter both tails).

    rarity(token) = floor(scale * A / count(token)) with A = total
    corpus tokens; rarity_score = floor(sum(rarity) / n_tokens) — all
    bigint, so Spark and DuckDB agree exactly where a ln-based NLL
    would drift by ulps (same design as tfidf/BM25). A true geometric
    mean needs ln; the arithmetic mean of 1/p is a monotone-enough
    proxy for FILTERING (both tails are extremes in either metric) and
    stays exact.

    Scale shape: one (doc_id, term) tf agg, one corpus term-count agg,
    one term-keyed join of the (tiny relative to the corpus) term
    table back onto tf — the same skew profile as tf-idf, handled by
    AQE skew-join — then one per-doc sum. A is a driver-side scalar.
    Overflow: sum(rarity) <= n_tokens * scale * A; at scale=1e6 and
    A=1e12 the per-doc sum bound is n_tokens * 1e18 only if a doc is
    ALL hapaxes — real corpora sit orders below; drop `scale` a decade
    per decade of corpus beyond that (parameter, like BM25's).
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    terms = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(toks).alias("t"),
    ).select("doc_id", F.lower("t").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tc = terms.groupBy("term").agg(F.count("*").alias("tc"))
    total = terms.count()
    return (
        tf.join(tc, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(
                F.col("tf")
                * F.expr(f"CAST({scale} AS BIGINT) * {total} DIV tc")
            ).alias("_rsum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("_rsum DIV n_tokens").cast("bigint").alias("rarity_score"),
        )
    )
