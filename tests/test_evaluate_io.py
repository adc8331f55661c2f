"""Triple P/R evaluation + IO layer tests."""

from __future__ import annotations

from conftest import SF_SMOKE

from ummon_spark.corpus import load_spans
from ummon_spark.evaluate import triple_pr
from ummon_spark.io import read_table, table_format, write_table
from ummon_spark.pipeline import build_graph


def test_pr_perfect_against_self(spark):
    g = build_graph(load_spans(spark, SF_SMOKE), persist=True)
    report = triple_pr(g.edges, g.edges)
    assert report.precision == 1.0 and report.recall == 1.0
    assert report.passes()
    assert set(report.per_pred) >= {"defines", "calls", "imports", "references", "depicts"}


def test_pr_detects_drift(spark):
    from pyspark.sql import functions as F

    g = build_graph(load_spans(spark, SF_SMOKE), persist=True)
    # drop all calls edges + inject a bogus one
    mutated = g.edges.filter(F.col("pred") != "calls").unionByName(
        spark.createDataFrame(
            # metadata is non-nullable since r4 (always-populated
            # provenance map)
            [("x", "a", "bogus", "b", 1.0, {"src_doc": "x", "src_span": "0"}, "x")],
            g.edges.schema,
        )
    )
    report = triple_pr(mutated, g.edges)
    assert report.recall < 1.0
    assert report.precision < 1.0
    assert report.per_pred["calls"]["recall"] == 0.0
    assert report.per_pred["bogus"]["precision"] == 0.0
    assert report.per_pred["defines"]["precision"] == 1.0


def test_io_fallback_roundtrip(spark, tmp_path):
    # no Iceberg runtime in this sandbox -> parquet fallback
    assert table_format(spark) == "parquet"
    g = build_graph(load_spans(spark, SF_SMOKE), persist=False)
    target = str(tmp_path / "edges")
    write_table(g.edges, target, ("pred",))
    back = read_table(spark, target)
    assert back.count() == g.edges.count()
    # partition pruning works on the written layout
    plan = back.filter(back.pred == "calls")._jdf.queryExecution().executedPlan().toString()
    assert "calls" in plan


def test_north_rule_pr_against_reference_fixture_triples(spark):
    """The north-rule criterion stated in its own terms: triple-level
    P/R >= 0.95 vs a golden fixture set — here the exact triples the
    reference's extraction rules produce for a span-encoded fixture
    program (python.rs call rules + index.rs Pass-1/2 projections)."""
    from ummon_spark.evaluate import triple_pr
    from ummon_spark.schemas import DOCUMENTS

    rows = [
        (
            "fx.py",
            [
                ("def", "target()", "", 0),
                ("call", "pkg.target", "", 1),
                ("call", "target", "", 2),
                ("class", "Shape()", "", 3),
                ("def", "area(self)", "", 4),
                ("import", "lib.util", "", 5),
                ("image", "", "img_fx", 6),
            ],
        )
    ]
    golden_triples = [
        ("fx.py", "defines", "fx.py::target"),
        ("fx.py::target", "calls", "pkg.target"),
        ("fx.py", "references", "target"),
        ("fx.py", "defines", "type::fx.py::Shape"),
        ("fx.py", "defines", "fx.py::area"),
        ("type::fx.py::Shape", "contains", "fx.py::area"),
        ("fx.py", "imports", "lib.util"),
        ("fx.py", "depicts", "media::img_fx"),
    ]
    g = build_graph(
        spark.createDataFrame(rows, schema=DOCUMENTS), persist=False
    )
    golden = spark.createDataFrame(
        golden_triples, "subj string, pred string, obj string"
    )
    report = triple_pr(g.edges, golden)
    assert report.passes(0.95)
    assert report.precision == 1.0 and report.recall == 1.0


class _WriterSpy:
    """Records the DataFrameWriterV2 call chain write_table makes on the
    Iceberg branch — the sandbox has no Iceberg jar, so the call SHAPE
    (using/partitionedBy per column/createOrReplace-vs-append) is pinned
    here against a stub (VERDICT r3 next-round #7)."""

    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def partitionedBy(self, col, *cols):
        self.calls.append(("partitionedBy", str(col), *(str(c) for c in cols)))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))

    def append(self):
        self.calls.append(("append",))


def test_iceberg_writer_call_shape(spark, monkeypatch):
    df = spark.createDataFrame(
        [("e1", "calls", "x"), ("e2", "defines", "y")],
        "id string, pred string, obj string",
    )
    calls = []
    # patch the CONCRETE class (pyspark 4 instances are
    # classic.DataFrame; pyspark.sql.DataFrame is the abstract base)
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, target: _WriterSpy(calls), raising=True
    )

    write_table(df, "cat.db.edges", ("pred",), mode="overwrite", fmt="iceberg")
    assert calls[0] == ("using", "iceberg")
    assert calls[1][0] == "partitionedBy" and "pred" in calls[1][1]
    assert calls[-1] == ("createOrReplace",)

    calls.clear()
    write_table(df, "cat.db.edges", ("pred",), mode="append", fmt="iceberg")
    assert calls[0] == ("using", "iceberg")
    assert calls[-1] == ("append",)
