"""Property-based tests (Hypothesis) for the parse stage.

The BASELINE per-row invariant: the parse stage is a pure,
order-preserving function of the spans array — span-sequence equality
of (kind, text, media_ref, order) must hold through explode, and the
two parser implementations must agree on arbitrary inputs, including
adversarial text (parens, dots, unicode, empties).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ummon_spark.operators.parse import (
    _parse_batch,
    explode_spans,
    parse_mentions,
)
from ummon_spark.schemas import DOCUMENTS

KINDS = (
    "def", "class", "interface", "trait", "enum", "struct",
    "call", "import", "var", "const", "doc", "text",
    "image", "audio", "video",
)
_CLASS_LIKE = ("class", "interface", "trait", "enum", "struct")

token = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F
    ),
    min_size=0,
    max_size=8,
)


@st.composite
def span(draw, offset):
    kind = draw(st.sampled_from(KINDS))
    if kind in ("image", "audio", "video"):
        return (kind, "", f"{kind[:3]}_{draw(token)}", offset)
    if kind == "def" or kind in _CLASS_LIKE:
        name = draw(token)
        inner = draw(token)
        return (kind, f"{name}({inner})", "", offset)
    if kind in ("var", "const"):
        name = draw(token)
        val = draw(st.sampled_from(["", "="]))
        return (kind, name + (f"={draw(token)}" if val else ""), "", offset)
    if kind == "call":
        parts = draw(st.lists(token, min_size=1, max_size=3))
        return (kind, ".".join(parts), "", offset)
    if kind == "import":
        return (kind, f"lib.{draw(token)}", "", offset)
    return (kind, draw(token), "", offset)


@st.composite
def document(draw, idx):
    n = draw(st.integers(min_value=0, max_value=12))
    spans = [draw(span(i)) for i in range(n)]
    return (f"doc_{idx}", spans)


docs_strategy = st.lists(st.integers(), min_size=1, max_size=6).flatmap(
    lambda idxs: st.tuples(*[document(i) for i in range(len(idxs))])
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs=docs_strategy)
def test_span_sequence_invariant_and_parser_parity(spark, docs):
    df = spark.createDataFrame(list(docs), schema=DOCUMENTS)

    # 1. explode preserves (kind, text, media_ref, order) exactly
    flat = explode_spans(df).collect()
    got = {}
    for r in flat:
        got.setdefault(r["doc_id"], []).append(
            (r["span_idx"], r["kind"], r["text"], r["media_ref"], r["offset"])
        )
    for doc_id, spans in docs:
        rows = sorted(got.get(doc_id, []))
        want = [
            (i, k, t, m, o) for i, (k, t, m, o) in enumerate(spans)
        ]
        assert rows == want, f"span sequence broken for {doc_id}"

    # 2. codegen parser == pandas parser on arbitrary input
    fast = sorted(tuple(r) for r in parse_mentions(df).collect())
    import pandas as pd

    exploded = explode_spans(df).toPandas()
    ref = _parse_batch(exploded) if len(exploded) else None
    slow = (
        sorted(tuple(r) for r in ref.itertuples(index=False)) if ref is not None else []
    )
    assert fast == slow


# --- typed-parameter parsing vs a Python reference model --------------------

param_piece = st.text(alphabet="ab1*:= ,", min_size=0, max_size=12)


def _ref_parse_params(detail: str):
    """Driver-side model of nodes.parse_parameters."""
    out = []
    for raw in detail.split(","):
        part = raw.strip()
        if part == "":
            continue
        name_type = part.split("=", 1)[0].strip()
        default = part.rsplit("=", 1)[1].strip() if "=" in part else ""
        if ":" in name_type:
            type_ann = name_type.rsplit(":", 1)[1].strip()
        else:
            type_ann = ""
        name = name_type.split(":", 1)[0].strip().lstrip("*")
        out.append((name, type_ann, default))
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(detail=param_piece)
def test_parse_parameters_matches_reference_model(spark, detail):
    from ummon_spark.operators.nodes import parse_parameters
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(detail,)], "detail string")
    got = df.select(parse_parameters(F.col("detail")).alias("p")).collect()[0]["p"]
    assert [tuple(x) for x in got] == _ref_parse_params(detail)


# --- generic-parameter parsing vs a Python reference model ------------------

tparam_piece = st.text(alphabet="ab1&:= ,", min_size=0, max_size=12)


def _ref_parse_tparams(tparams: str):
    """Driver-side model of nodes.parse_type_params (GenericParameter
    grammar: name[:b1[&b2...]][=default], empty names skipped)."""
    out = []
    for raw in tparams.split(","):
        part = raw.strip()
        if part == "":
            continue
        rest = part.split("=", 1)[0].strip()
        default = part.rsplit("=", 1)[1].strip() if "=" in part else ""
        if ":" in rest:
            bounds = [
                b.strip()
                for b in rest.rsplit(":", 1)[1].split("&")
                if b.strip() != ""
            ]
        else:
            bounds = []
        name = rest.split(":", 1)[0].strip()
        if name == "":
            continue
        out.append((name, bounds, default))
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tparams=tparam_piece)
def test_parse_type_params_matches_reference_model(spark, tparams):
    from ummon_spark.operators.nodes import parse_type_params
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(tparams,)], "tparams string")
    got = df.select(parse_type_params(F.col("tparams")).alias("p")).collect()[0]["p"]
    assert [(x["name"], list(x["bounds"]), x["default_type"]) for x in got] == \
        _ref_parse_tparams(tparams)
