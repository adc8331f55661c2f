"""Reference parser fixtures, span-encoded (FIXTURES.md §3): the
reference's inline test programs re-expressed as span arrays, asserting
the mentions/nodes/edges the reference's parsers would extract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ummon_spark.operators.nodes import with_visibility
from ummon_spark.operators.parse import parse_mentions
from ummon_spark.pipeline import build_graph
from ummon_spark.schemas import DOCUMENTS


def make(spark, rows):
    return spark.createDataFrame(rows, schema=DOCUMENTS)


@pytest.fixture(scope="module")
def python_sample(spark):
    """python.rs:821-899: simple_function, class methods, visibility by
    underscore, *args/**kwargs-ish params."""
    rows = [
        (
            "sample.py",
            [
                ("def", "simple_function()", "", 0),
                ("class", "MyClass()", "", 1),
                ("def", "method_one(self)", "", 2),
                ("def", "_protected_helper(x)", "", 3),
                ("def", "__private_impl(args,kwargs)", "", 4),
                ("def", "MyClass(self)", "", 5),  # constructor-named
                ("call", "mod.simple_function", "", 6),
                ("doc", "Docstring for the sample module", "", 7),
            ],
        )
    ]
    return build_graph(make(spark, rows), persist=False)


def test_parameter_extraction(spark, python_sample):
    nodes = {r["id"]: r for r in python_sample.nodes.collect()}
    assert nodes["sample.py::simple_function"]["detail"] == ""
    assert nodes["sample.py::method_one"]["detail"] == "self"
    assert nodes["sample.py::__private_impl"]["detail"] == "args,kwargs"


def test_visibility_by_underscore(python_sample):
    vis = {
        r["id"]: r["visibility"]
        for r in with_visibility(python_sample.nodes).collect()
    }
    assert vis["sample.py::simple_function"] == "Public"
    assert vis["sample.py::_protected_helper"] == "Protected"
    assert vis["sample.py::__private_impl"] == "Private"


def test_constructor_detection(python_sample):
    ctor = {
        r["id"]: r["is_constructor"]
        for r in with_visibility(python_sample.nodes).collect()
    }
    assert ctor["sample.py::MyClass"] is True
    assert ctor["sample.py::simple_function"] is False


def test_module_documentation_attached(python_sample):
    nodes = {r["id"]: r for r in python_sample.nodes.collect()}
    assert nodes["sample.py"]["documentation"] == "Docstring for the sample module"


def test_call_fqn_only_when_dotted(spark):
    """python.rs:787-791: FQN set only when the call text contains '.'"""
    rows = [
        (
            "calls.py",
            [
                ("def", "target()", "", 0),
                ("call", "pkg.target", "", 1),  # dotted -> calls edge
                ("call", "target", "", 2),  # bare -> references only
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    edges = {(r["subj"], r["pred"], r["obj"]) for r in g.edges.collect()}
    assert ("calls.py::target", "calls", "pkg.target") in edges
    assert ("calls.py", "references", "target") in edges
    assert not any(p == "calls" and o == "target" for _, p, o in edges)


def test_java_style_imports_and_supertypes(spark):
    """java.rs:273-302, 652-788: extends/implements and imports."""
    rows = [
        (
            "Test.java",
            [
                ("import", "lib.util.List", "", 0),
                ("class", "Point(Shape)", "", 1),
                ("def", "Point(x,y)", "", 2),  # constructor; makes inherits valid
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    edges = {(r["subj"], r["pred"], r["obj"]) for r in g.edges.collect()}
    assert ("Test.java", "imports", "lib.util.List") in edges
    assert ("Test.java::Point", "inherits", "Shape") in edges


def test_empty_and_invalid_content_robust(spark):
    """python.rs:901-954 pattern: empty/garbage never throws."""
    rows = [
        ("e1.py", []),
        ("e2.py", [("text", "", "", 0)]),
        ("e3.py", [("def", "(((", "", 0), ("call", "...", "", 1)]),
    ]
    g = build_graph(make(spark, rows), persist=False)
    assert g.nodes.filter(F.col("entity_type") == "Module").count() == 3
