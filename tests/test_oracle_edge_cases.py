"""Oracle parity on adversarial documents: empty text, repeated
spaces (empty tokens), single token, unicode, parens/dots in tokens —
the full spanify→mentions→nodes→edges chain must agree between Spark
and DuckDB on inputs nastier than the driver corpus."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

EDGE_DOCS = [
    (0, "", "en", "s", 0),
    (1, "one", "en", "s", 3),
    (2, "a  b", "en", "s", 4),  # double space -> empty token
    (3, "ünï  çø∂é tokens", "zh", "s", 16),
    (4, " leading trailing ", "de", "s", 18),
    (5, "x " * 40, "fr", "s", 80),  # trailing space, repetitive
    (6, "dot.ted to.kens every where and more of them too", "en", "s", 49),
    # id-separator tokens: '->' / '::' inside names make the edge-id
    # concat ambiguous — the id-keyed second dedupe must agree
    (7, "a->b c::d w->x y::z q->r::s t u v " * 3, "en", "s", 102),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edgedocs")
    df = spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "kg_spans",
        "kg_mentions",
        "kg_nodes",
        "kg_edges",
        "kg_call_metadata",
        "kg_canonical_edges",
    ],
)
def test_edge_case_parity(spark, edge_dir, name):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet/*.parquet'"
    )
    sdf = entrymod.queries()[name](spark, edge_dir)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    res = con.sql(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = sorted(tuple(r[dcols.index(c)] for c in cols) for r in res.fetchall())
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert srows == drows, f"{name}: values differ"
