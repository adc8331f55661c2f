"""BM25 keyword retrieval over the documents table — bigint-exact.

The retrieval stage of a training-data pipeline (targeted corpus
slicing, eval-set mining, "find me documents about X" curation). Not
in the reference (its search stops at UQL `like` predicates); modeled
on the classic Robertson/Sparck-Jones BM25 with k1 = 1.2, b = 0.75.

Cross-engine exactness: standard BM25 is ln-based, and JVM `Math.log`
vs libm differ in the last ulp (same reason tfidf_top_terms is
integer-scaled — textstats.py). This variant replaces each float
subexpression with a scaled-integer rational:

* idf: ln(1 + (N - df + 0.5)/(df + 0.5)) has rational argument
  x = (2N - 2df + 1)/(2df + 1); we use idf_int = floor(IDF_SCALE * x)
  directly. Monotone in the same direction as the ln form per term
  (higher-df terms score lower), bigint-exact in both engines.
* tf saturation: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
  k1 = 6/5, b = 3/4 and avgdl = A/N (A = total corpus tokens, N = doc
  count) clears denominators to
      tf_frac = floor(TF_SCALE * 44*A*tf / (20*A*tf + 6*A + 18*N*dl))
  (multiply numerator and denominator by 20*A; 44 = 20*(k1+1),
  6 = 20*k1*(1-b), 18 = 20*k1*b*... with dl*N/A for avgdl). Bounded by
  2.2 * TF_SCALE.
* per-term score = idf_int * tf_frac; per-doc score = bigint sum.

Overflow headroom: idf_int <= 2*N*IDF_SCALE and tf_frac <=
2.2*TF_SCALE, so the per-term product stays under int64 while
N * IDF_SCALE * TF_SCALE < ~4e17 — at the defaults (1e4 * 1e6) that is
N <= ~4e7 docs; beyond that drop IDF_SCALE one decade per decade of
corpus (both are parameters). A and tf cancel out of the bound: the
tf fraction is <= (k1+1) * TF_SCALE by construction. The tf-fraction
INTERMEDIATES do not cancel, though — the numerator TF_SCALE*44*A*tf
passes 2^63 once A*tf > ~2e11 (A ~ 1e12 overflows at tf = 1) and the
denominator's 20*A*tf term follows two decades later — so both sides
of that DIV are computed in DECIMAL(38,0) (headroom ~1e38; quotient
back to bigint), identical to bigint arithmetic wherever it fits.

Scale shape: one (doc_id, term) hash agg restricted to the query terms
(the term filter is pushed below the agg — the scan only keeps
matching tokens), one tiny per-term df agg joined back broadcast (the
query has a handful of terms), one per-doc dl agg, and a global top-k
via row_number over a single ordered column set. N and A are two
driver-side scalars (one count job). No shuffle touches the full
corpus text after tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IDF_SCALE = 10_000
TF_SCALE = 1_000_000
BM25_TOP_K = 20


def _doc_tokens(documents: DataFrame) -> DataFrame:
    """(doc_id, term) — lowercase whitespace tokens, empties dropped
    (same tokenizer as textstats.tfidf_top_terms so df/tf agree)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(toks).alias("t"),
    ).select("doc_id", F.lower("t").alias("term"))


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = BM25_TOP_K,
    idf_scale: int = IDF_SCALE,
    tf_scale: int = TF_SCALE,
) -> DataFrame:
    """(doc_id, score, rank): top-k documents for `query_terms` by the
    bigint-exact BM25 variant in the module docstring. Ties break on
    doc_id ascending. Documents matching no query term are omitted.
    """
    terms = sorted({t.lower() for t in query_terms if t})
    toks = _doc_tokens(documents)

    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # N over ALL docs (a doc with no tokens still counts), A = corpus tokens
    n_docs = documents.select("doc_id").distinct().count()
    total = dl.agg(F.sum("dl")).collect()[0][0] or 0

    qtf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                F.expr(
                    f"(CAST({2 * n_docs} AS BIGINT) - 2*df + 1) * {idf_scale}"
                    " DIV (2*df + 1)"
                )
                # the numerator TF_SCALE*44*A*tf (and, at extreme
                # corpus sizes, the denominator's 20*A*tf term) can
                # exceed int64 — A ~ 1e12 tokens overflows at tf = 1,
                # where non-ANSI Spark would wrap silently into wrong
                # rankings (ADVICE r5). Both sides therefore compute in
                # DECIMAL(38,0): headroom to ~1e38, bit-identical to
                # the bigint path wherever that path didn't overflow
                # (the quotient itself is bounded by 2.2*TF_SCALE), and
                # DIV (IntegralDivide) returns bigint for decimals too.
                * F.expr(
                    f"CAST({tf_scale} AS DECIMAL(38,0)) * 44 * {total} * tf"
                    f" DIV (CAST(20 AS DECIMAL(38,0)) * {total} * tf"
                    f" + CAST(6 AS DECIMAL(38,0)) * {total}"
                    f" + CAST(18 AS DECIMAL(38,0)) * {n_docs} * dl)"
                )
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").cast("bigint").alias("score"))
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "score", "rank")
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = BM25_TOP_K,
    idf_scale: int = IDF_SCALE,
    tf_scale: int = TF_SCALE,
) -> str:
    """DuckDB twin of bm25_topk over the `documents` view — identical
    bigint arithmetic, kept adjacent to the Spark side so the two
    stay in lockstep."""
    terms = sorted({t.lower() for t in query_terms if t})
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH btoks AS (
  SELECT doc_id, lower(t) AS term FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           unnest(string_split(text, ' ')) AS t
    FROM documents
  ) WHERE t <> ''
),
bdl AS (SELECT doc_id, COUNT(*) AS dl FROM btoks GROUP BY 1),
bn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
ba AS (SELECT SUM(dl) AS a FROM bdl),
btf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM btoks
  WHERE term IN ({in_list}) GROUP BY 1, 2
),
bdf AS (SELECT term, COUNT(*) AS df FROM btf GROUP BY 1),
bscored AS (
  SELECT btf.doc_id,
         SUM(
           ((2 * (SELECT n FROM bn) - 2 * bdf.df + 1) * {idf_scale}
            // (2 * bdf.df + 1))
           * ({tf_scale} * 44 * (SELECT a FROM ba) * btf.tf
              // (20 * (SELECT a FROM ba) * btf.tf
                  + 6 * (SELECT a FROM ba)
                  + 18 * (SELECT n FROM bn) * bdl.dl))
         ) AS score
  FROM btf JOIN bdf USING (term) JOIN bdl USING (doc_id)
  GROUP BY 1
)
SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM bscored
) WHERE rnk <= {k}"""
