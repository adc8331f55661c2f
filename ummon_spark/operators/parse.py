"""Parse stage: interleaved spans -> typed entity mentions.

The Spark-first replacement for the reference's tree-sitter walk
(reference src/parser/language_support/mod.rs:196-379 LanguageParser;
python.rs:637-729 parse_functions, :566-624 parse_types, :731-807
parse_calls; java.rs:652-788 parse_modules). The input rows already
carry the span sequence, so "parsing" is a pure, order-preserving
function of the spans array (the per-row invariant: span-sequence
equality of (kind, text, media_ref, order)).

Two implementations with identical semantics:

* ``parse_mentions`` — built-in column expressions after ``posexplode``.
  Stays entirely inside whole-stage codegen (no Python), the fast path.
* ``parse_mentions_pandas`` — Arrow-vectorized ``mapInPandas``
  (pandas str ops, no per-row Python), the driver-contract reference
  implementation; property-tested equal to the fast path.

Mention dialect (FIXTURES.md §1):
  def    "[MOD ]name(params)[->ret]"
                               -> Function(name, detail=params,
                                  modifier=MOD (async|static|abstract)
                                  or '', ret=return annotation or '' —
                                  entity.rs:209-219 is_async/is_static/
                                  is_abstract + return_type payloads)
  class  "Name[<G...>](S1[,S2...])"
                               -> Class(name, detail=comma-joined
                                  supertype list or '' — multiple
                                  supertypes, entity.rs:288-296 Vec;
                                  tparams=raw '<>' generic-param list —
                                  GenericParameter, language_support/
                                  mod.rs:161-165, extraction
                                  java.rs:116-204 / rust.rs:214-326)
  interface/trait/enum         -> Interface/Trait/Enum, class-shaped
         "Name(S...)"             (entity.rs:69-86 type breadth; their
                                  supertype edges are `implements` —
                                  index.rs:410-418: only Class/Struct
                                  sources produce Inherits)
  struct "Name(S...)"          -> Struct, class-shaped (its supertype
                                  edge is `inherits`: index.rs:410-416
                                  covers Class AND Struct)
  var    "name[:type][=value]" -> Variable(name, detail=the raw
                                  ":type=value" remainder; the node
                                  build splits it into type_annotation
                                  + value — entity.rs:422-429)
  const  "name[=value]"        -> Constant(name, detail=remainder)
  call   "callee"|"qual.callee"-> CallSite(last-segment name,
                                  detail=fqn iff dotted — the reference
                                  sets FQN only when the call text
                                  contains '.' (python.rs:787-791))
  import "module.path"         -> Import(name=path)
  image/audio/video            -> Media(name=media_ref)
  doc    free text             -> Doc(detail=text) (documentation
                                  attachment, java.rs:790-856)
  text   free text             -> no mention (unsupported-content skip,
                                  mod.rs:71-76)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MENTIONS

_MEDIA = ("image", "audio", "video")
# class-shaped type kinds -> entity_type (entity.rs:69-86)
_TYPE_KINDS = {
    "class": "Class",
    "interface": "Interface",
    "trait": "Trait",
    "enum": "Enum",
    "struct": "Struct",
}

# every span kind that yields a mention (S2 supported-content filter;
# everything else — 'text' — is the unsupported-content skip)
SUPPORTED_KINDS = (
    "def",
    *_TYPE_KINDS,
    "var",
    "const",
    "call",
    "import",
    "doc",
    *_MEDIA,
)


def explode_spans(spans_df: DataFrame) -> DataFrame:
    """(doc_id, spans[]) -> one row per span, order preserved via span_idx.

    Narrow transformation — no shuffle; parallelism = input partitions.
    """
    return spans_df.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").cast("long").alias("offset"),
    )


MODIFIER_RE = r"^(async|static|abstract) "
RETURN_RE = r"\)->(.*)$"
TPARAMS_RE = r"<([^>]*)>"


def parse_mentions(spans_df: DataFrame) -> DataFrame:
    """Fast path: spans -> mentions via JVM-side expressions only."""
    s = explode_spans(spans_df)
    k = F.col("kind")
    text = F.col("text")
    is_media = k.isin(*_MEDIA)
    dotted = text.contains(".")

    paren_like = k.isin("def", *_TYPE_KINDS)
    mention_type = F.when(k == "def", "Function")
    for kind, etype in _TYPE_KINDS.items():
        mention_type = mention_type.when(k == kind, etype)
    value_like = k.isin("var", "const")
    mention_type = (
        mention_type.when(k == "call", "CallSite")
        .when(k == "import", "Import")
        .when(k == "var", "Variable")
        .when(k == "const", "Constant")
        .when(is_media, "Media")
        .when(k == "doc", "Doc")
    )
    # def text may carry "MOD " prefix and "->ret" suffix; strip both
    # around the name. Var/const name stops at the first ':' or '='; the
    # detail keeps the raw remainder (":type=value") for the node build.
    stripped = F.regexp_replace(text, MODIFIER_RE, "")
    name = (
        F.when(
            paren_like,
            F.substring_index(F.substring_index(stripped, "(", 1), "<", 1),
        )
        .when(k == "call", F.substring_index(text, ".", -1))
        .when(k == "import", text)
        .when(value_like, F.substring_index(F.substring_index(text, "=", 1), ":", 1))
        .when(is_media, F.col("media_ref"))
        .otherwise(F.lit(""))
    )
    detail = (
        F.when(paren_like, F.regexp_extract(text, r"\(([^)]*)\)", 1))
        .when(k == "call", F.when(dotted, text).otherwise(F.lit("")))
        .when(value_like, F.regexp_replace(text, r"^[^:=]*", ""))
        .when(is_media, F.col("media_ref"))
        .when(k == "doc", text)
        .otherwise(F.lit(""))
    )
    modifier = F.when(k == "def", F.regexp_extract(text, MODIFIER_RE, 1)).otherwise(
        F.lit("")
    )
    ret = F.when(k == "def", F.regexp_extract(text, RETURN_RE, 1)).otherwise(
        F.lit("")
    )
    tparams = F.when(
        k.isin(*_TYPE_KINDS), F.regexp_extract(text, TPARAMS_RE, 1)
    ).otherwise(F.lit(""))
    return (
        s.withColumn("mention_type", mention_type)
        .filter(F.col("mention_type").isNotNull())
        .select(
            "doc_id",
            "span_idx",
            "mention_type",
            name.alias("name"),
            detail.alias("detail"),
            "media_ref",
            "offset",
            modifier.alias("modifier"),
            ret.alias("ret"),
            tparams.alias("tparams"),
        )
    )


def _parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized pandas parse of one exploded-span Arrow batch."""
    k = pdf["kind"]
    text = pdf["text"].fillna("")
    media = pdf["media_ref"].fillna("")
    is_media = k.isin(_MEDIA)
    keep = (
        k.isin(("def", "call", "import", "var", "const", "doc"))
        | k.isin(tuple(_TYPE_KINDS))
        | is_media
    )
    pdf = pdf[keep].copy()
    if pdf.empty:
        return pd.DataFrame(columns=[f.name for f in MENTIONS.fields])
    k = pdf["kind"]
    text = pdf["text"].fillna("")
    media = pdf["media_ref"].fillna("")
    is_media = k.isin(_MEDIA)
    dotted = text.str.contains(".", regex=False)

    mention_type = k.map(
        {
            "def": "Function",
            "call": "CallSite",
            "import": "Import",
            "var": "Variable",
            "const": "Constant",
            "doc": "Doc",
            **_TYPE_KINDS,
        }
    )
    mention_type = mention_type.where(~is_media, "Media")

    paren_like = k.isin(("def",) + tuple(_TYPE_KINDS))
    value_like = k.isin(("var", "const"))
    stripped = text.str.replace(MODIFIER_RE, "", regex=True)
    before_paren = stripped.str.split("(", n=1).str[0].str.split("<", n=1).str[0]
    in_paren = text.str.extract(r"\(([^)]*)\)", expand=False).fillna("")
    last_seg = text.str.rsplit(".", n=1).str[-1]
    # var/const: name = before the first ':' or '='; detail = the raw
    # remainder incl. separators (":type=value" / "=value" / "")
    value_name = text.str.split("=", n=1).str[0].str.split(":", n=1).str[0]
    value_rest = text.str.replace(r"^[^:=]*", "", regex=True)

    name = pd.Series("", index=pdf.index, dtype=object)
    name = name.mask(paren_like, before_paren)
    name = name.mask(k == "call", last_seg)
    name = name.mask(k == "import", text)
    name = name.mask(value_like, value_name)
    name = name.mask(is_media, media)

    detail = pd.Series("", index=pdf.index, dtype=object)
    detail = detail.mask(paren_like, in_paren)
    detail = detail.mask((k == "call") & dotted, text)
    detail = detail.mask(value_like, value_rest)
    detail = detail.mask(is_media, media)
    detail = detail.mask(k == "doc", text)

    is_def = k == "def"
    modifier = pd.Series("", index=pdf.index, dtype=object)
    modifier = modifier.mask(
        is_def, text.str.extract(MODIFIER_RE, expand=False).fillna("")
    )
    ret = pd.Series("", index=pdf.index, dtype=object)
    ret = ret.mask(is_def, text.str.extract(RETURN_RE, expand=False).fillna(""))
    is_type = k.isin(tuple(_TYPE_KINDS))
    tparams = pd.Series("", index=pdf.index, dtype=object)
    tparams = tparams.mask(
        is_type, text.str.extract(TPARAMS_RE, expand=False).fillna("")
    )

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "span_idx": pdf["span_idx"],
            "mention_type": mention_type,
            "name": name,
            "detail": detail,
            "media_ref": media,
            "offset": pdf["offset"],
            "modifier": modifier,
            "ret": ret,
            "tparams": tparams,
        }
    )


def parse_mentions_pandas(spans_df: DataFrame) -> DataFrame:
    """Reference path: Arrow-batched vectorized parse via mapInPandas."""
    s = explode_spans(spans_df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _parse_batch(pdf)

    return s.mapInPandas(run, schema=MENTIONS)
