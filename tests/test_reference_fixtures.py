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


def test_typed_parameter_payload(spark):
    """python.rs:55-195 shapes: plain, typed, defaulted, typed+default,
    *args / **kwargs — parsed into the entity.rs:38-46 Parameter struct."""
    rows = [
        (
            "typed.py",
            [
                ("def", "f(a, b: int, c=3, d: str = x, *args, **kwargs)", "", 0),
                ("def", "g()", "", 1),
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    nodes = {r["id"]: r for r in g.nodes.collect()}
    params = [tuple(p) for p in nodes["typed.py::f"]["parameters"]]
    assert params == [
        ("a", "", ""),
        ("b", "int", ""),
        ("c", "", "3"),
        ("d", "str", "x"),
        ("args", "", ""),
        ("kwargs", "", ""),
    ]
    assert nodes["typed.py::g"]["parameters"] == []
    # placeholders carry a NULL payload, not a fake empty one
    assert nodes["typed.py::f"]["return_type"] == ""


def test_contains_edges_class_membership(spark, python_sample):
    """index.rs:429-457 analog: defs following a class span are that
    type's members -> contains edges; defs before any class are not."""
    edges = {
        (r["subj"], r["obj"])
        for r in python_sample.edges.filter(F.col("pred") == "contains").collect()
    }
    cls = "type::sample.py::MyClass"
    assert (cls, "sample.py::method_one") in edges
    assert (cls, "sample.py::_protected_helper") in edges
    assert (cls, "sample.py::MyClass") in edges  # constructor is a member
    assert not any(obj == "sample.py::simple_function" for _, obj in edges)


def test_uql_classes_containing_functions(spark, python_sample):
    from ummon_spark.query.executor import execute_query

    out = execute_query(
        python_sample.nodes, python_sample.edges, "classes containing functions"
    )
    assert {r["id"] for r in out.collect()} == {"type::sample.py::MyClass"}


def test_per_entity_documentation(spark):
    """java.rs:790-856 analog: a doc span attaches to the nearest
    following entity mention; first wins per entity; a trailing doc
    with no following entity is the module docstring."""
    rows = [
        (
            "d.py",
            [
                ("doc", "docs for f", "", 0),
                ("def", "f()", "", 1),
                ("doc", "docs for C", "", 2),
                ("doc", "second doc loses", "", 3),
                ("class", "C()", "", 4),
                ("doc", "trailing module doc", "", 5),
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    docs = {r["id"]: r["documentation"] for r in g.nodes.collect()}
    assert docs["d.py::f"] == "docs for f"
    assert docs["type::d.py::C"] == "docs for C"
    assert docs["d.py"] == "trailing module doc"


def test_type_breadth_and_implements(spark):
    """entity.rs:69-86 breadth + index.rs:410-418 Inherits/Implements
    rule: Class sources inherit; Interface/Trait/Enum sources implement
    (both with the unprefixed-source quirk — the edge survives only if
    a same-named function exists)."""
    rows = [
        (
            "b.py",
            [
                ("interface", "Api(Base)", "", 0),
                ("def", "Api()", "", 1),  # same-named fn keeps the edge
                ("trait", "Mixin()", "", 2),
                ("enum", "Color(Enum)", "", 3),
                ("def", "Color()", "", 4),
                ("var", "limit=100", "", 5),
                ("var", "bare", "", 6),
                ("class", "Impl(Api)", "", 7),
                ("def", "Impl()", "", 8),
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    nodes = {r["id"]: r for r in g.nodes.collect()}
    assert nodes["type::b.py::Api"]["entity_type"] == "Interface"
    assert nodes["type::b.py::Mixin"]["entity_type"] == "Trait"
    assert nodes["type::b.py::Color"]["entity_type"] == "Enum"
    assert nodes["b.py::var::limit"]["entity_type"] == "Variable"
    assert nodes["b.py::var::limit"]["detail"] == "100"
    assert nodes["b.py::var::bare"]["detail"] == ""
    triples = {(r["subj"], r["pred"], r["obj"]) for r in g.edges.collect()}
    assert ("b.py::Api", "implements", "Base") in triples
    assert ("b.py::Color", "implements", "Enum") in triples
    assert ("b.py::Impl", "inherits", "Api") in triples
    # Mixin() has no supertype and no same-named fn -> no implements edge
    assert not any(s == "b.py::Mixin" for s, p, o in triples)
    # variables following a type are its members (field containment)
    assert ("type::b.py::Color", "contains", "b.py::var::limit") in triples

    from ummon_spark.query.executor import execute_query

    sel = execute_query(g.nodes, g.edges, "select variables")
    assert {r["id"] for r in sel.collect()} == {
        "b.py::var::limit",
        "b.py::var::bare",
    }
    sel = execute_query(g.nodes, g.edges, "select enums")
    assert {r["id"] for r in sel.collect()} == {"type::b.py::Color"}
    # methods view: every def here follows a class-like span -> member
    sel = execute_query(g.nodes, g.edges, "select methods")
    ids = {r["id"] for r in sel.collect()}
    assert ids == {"b.py::Api", "b.py::Color", "b.py::Impl"}


def test_struct_constant_field_breadth(spark):
    """Struct sources inherit (index.rs:410-416 covers Class AND
    Struct); constants are module-level; member variables surface
    through the `select fields` structural view."""
    rows = [
        (
            "s.rs",
            [
                ("struct", "Point(Shape)", "", 0),
                ("var", "x=1", "", 1),  # member of Point -> a field
                ("def", "Point()", "", 2),  # keeps the inherits edge alive
                ("const", "MAX=10", "", 3),
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    nodes = {r["id"]: r for r in g.nodes.collect()}
    assert nodes["type::s.rs::Point"]["entity_type"] == "Struct"
    assert nodes["s.rs::const::MAX"]["entity_type"] == "Constant"
    assert nodes["s.rs::const::MAX"]["detail"] == "10"
    triples = {(r["subj"], r["pred"], r["obj"]) for r in g.edges.collect()}
    assert ("s.rs::Point", "inherits", "Shape") in triples  # Struct -> Inherits
    assert ("type::s.rs::Point", "contains", "s.rs::var::x") in triples
    assert ("s.rs", "defines", "s.rs::const::MAX") in triples

    from ummon_spark.query.executor import execute_query

    fields = execute_query(g.nodes, g.edges, "select fields")
    assert {r["id"] for r in fields.collect()} == {"s.rs::var::x"}
    structs = execute_query(g.nodes, g.edges, "select structs")
    assert {r["id"] for r in structs.collect()} == {"type::s.rs::Point"}
    consts = execute_query(g.nodes, g.edges, "select constants")
    assert {r["id"] for r in consts.collect()} == {"s.rs::const::MAX"}


def test_generic_type_parameters(spark):
    """GenericParameter payload (language_support/mod.rs:161-165;
    extraction java.rs:116-204 / rust.rs:214-326): '<...>' lists parse
    to (name, bounds, default_type) structs; the name excludes the
    generic list; empty param names are skipped (java.rs:169)."""
    rows = [
        (
            "g.py",
            [
                ("class", "Box<T>(Base)", "", 0),
                ("interface", "List<E:Cmp&Ser>()", "", 1),
                ("trait", "Conv<K=Str,V>()", "", 2),
                ("struct", "Pair<:bad,X>()", "", 3),  # empty name skipped
                ("enum", "Plain(Root)", "", 4),
            ],
        )
    ]
    g = build_graph(make(spark, rows), persist=False)
    nodes = {r["id"]: r for r in g.nodes.collect()}
    # generic list never leaks into the name / id
    assert "type::g.py::Box" in nodes
    box = [tuple(p) for p in nodes["type::g.py::Box"]["type_params"]]
    assert box == [("T", [], "")]
    lst = [tuple(p) for p in nodes["type::g.py::List"]["type_params"]]
    assert lst == [("E", ["Cmp", "Ser"], "")]
    conv = [tuple(p) for p in nodes["type::g.py::Conv"]["type_params"]]
    assert conv == [("K", [], "Str"), ("V", [], "")]
    pair = [tuple(p) for p in nodes["type::g.py::Pair"]["type_params"]]
    assert pair == [("X", [], "")]
    assert nodes["type::g.py::Plain"]["type_params"] == []
    # supertype parsing is unchanged by the generic list
    assert list(nodes["type::g.py::Box"]["supertypes"]) == ["Base"]
