"""ummon_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
Nayshins/ummon reference (a Rust code-analysis KG tool; see SURVEY.md):
an interleaved text+media document corpus (``doc_id``,
``spans: array<struct<kind,text,media_ref,offset>>``) flows through a
vectorized parse stage into typed entity mentions, then node/edge
construction with the reference's ID-synthesis and dedupe semantics,
entity linking + connected-components canonicalization, and materializes
``(subj, pred, obj)`` triples into partitioned node/edge tables, with
graph queries (who-calls, transitive-depends, entity-neighborhood), the
reference's select/traversal query language, and a relevance-ranking
pipeline — all expressed as Catalyst-optimizable DataFrame plans.
"""

__version__ = "0.1.0"
