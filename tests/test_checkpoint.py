"""Checkpoint/resume tests: full run, warm resume skips every stage,
mid-run kill resumes without recomputing completed stages, and
upstream-change invalidation cascades."""

from __future__ import annotations

import json
import os

import pytest

from conftest import SF_SMOKE

from ummon_spark.checkpoint import CheckpointManager, run_pipeline_checkpointed

STAGES = (
    "spans",
    "mentions",
    "nodes_base",
    "edges",
    "nodes",
    "canonical_map",
    "canonical_edges",
)


def test_full_run_then_warm_resume(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    cp1 = run_pipeline_checkpointed(spark, SF_SMOKE, base, "r1")
    assert [s for s in STAGES if cp1.results[s].skipped] == []
    counts1 = {s: cp1.results[s].row_count for s in STAGES}
    assert counts1["edges"] > 0 and counts1["nodes"] > counts1["nodes_base"]
    # per-partition counters recorded
    assert sum(cp1.results["edges"].partition_counts.values()) == counts1["edges"]

    # warm resume: every stage skipped, same counts and hashes
    cp2 = run_pipeline_checkpointed(spark, SF_SMOKE, base, "r2")
    assert all(cp2.results[s].skipped for s in STAGES)
    assert {s: cp2.results[s].row_count for s in STAGES} == counts1
    assert all(
        cp2.results[s].content_hash == cp1.results[s].content_hash for s in STAGES
    )


def test_kill_midrun_resume_skips_completed(spark, tmp_path):
    base = str(tmp_path / "ckpt2")
    # simulate a killed run: only the first two stages completed
    from ummon_spark.corpus import load_spans
    from ummon_spark.operators.parse import parse_mentions

    cp = CheckpointManager(spark, base, "partial")
    spans = cp.stage("spans", lambda: load_spans(spark, SF_SMOKE), (), SF_SMOKE)
    cp.stage("mentions", lambda: parse_mentions(spans), ("spans",))
    spans_mtime = os.path.getmtime(os.path.join(base, "spans", "_MANIFEST.json"))

    cp2 = run_pipeline_checkpointed(spark, SF_SMOKE, base, "resumed")
    assert cp2.results["spans"].skipped and cp2.results["mentions"].skipped
    assert not cp2.results["edges"].skipped
    # completed stage untouched on disk
    assert os.path.getmtime(os.path.join(base, "spans", "_MANIFEST.json")) == spans_mtime
    # checkpoint log has one line per completed stage
    with open(os.path.join(base, "_checkpoints.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert [l["stage"] for l in lines][:2] == ["spans", "mentions"]


def test_signature_change_invalidates_downstream(spark, tmp_path):
    base = str(tmp_path / "ckpt3")
    cp1 = run_pipeline_checkpointed(spark, SF_SMOKE, base, "r1")
    # poison the mentions manifest input signature -> mentions and all
    # downstream recompute; spans stays cached
    mp = os.path.join(base, "mentions", "_MANIFEST.json")
    man = json.load(open(mp))
    man["input_signature"] = "stale"
    json.dump(man, open(mp, "w"))
    cp2 = run_pipeline_checkpointed(spark, SF_SMOKE, base, "r2")
    assert cp2.results["spans"].skipped
    assert not cp2.results["mentions"].skipped
    # recomputed deterministically: hashes unchanged from run 1
    assert cp2.results["mentions"].content_hash == cp1.results["mentions"].content_hash
    assert cp2.results["canonical_edges"].content_hash == cp1.results["canonical_edges"].content_hash


CURATE_STAGES = ("input", "quality", "exact_dedupe", "near_dedupe", "stratified_cap")


@pytest.fixture(scope="module")
def curate_docs(spark):
    rows = [
        (i, f"doc {i} shares many common stop the a of words tok{i % 7}", "en")
        for i in range(30)
    ] + [(100 + i, "dup dup dup identical body", "de") for i in range(4)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_checkpointed_matches_plain(spark, tmp_path, curate_docs):
    from ummon_spark.datapipe.curate import (
        CurationConfig,
        curate,
        curate_checkpointed,
    )

    cfg = CurationConfig(min_tokens=3, n_per_stratum=50)
    kept_plain, rep_plain = curate(curate_docs, cfg)
    kept_cp, rep_cp = curate_checkpointed(
        spark, curate_docs, str(tmp_path / "cc"), cfg, input_signature="t"
    )
    assert rep_cp.counts == rep_plain.counts
    assert sorted(r["doc_id"] for r in kept_cp.collect()) == sorted(
        r["doc_id"] for r in kept_plain.collect()
    )
    # per-stage lineage rows on disk: manifest with count + hash + counters
    for s in CURATE_STAGES:
        man = json.load(open(tmp_path / "cc" / s / "_MANIFEST.json"))
        assert man["row_count"] == rep_cp.counts[s]
        assert "content_hash" in man and man["partition_counts"]


def test_curate_checkpointed_resume(spark, tmp_path, curate_docs):
    """A run killed after exact_dedupe resumes past the completed
    stages and recomputes only the remainder, bit-identically."""
    import shutil

    from ummon_spark.datapipe.curate import CurationConfig, curate_checkpointed

    cfg = CurationConfig(min_tokens=3, n_per_stratum=50)
    base = tmp_path / "cr"
    _, rep1 = curate_checkpointed(spark, curate_docs, str(base), cfg, "t")
    hashes1 = {
        s: json.load(open(base / s / "_MANIFEST.json"))["content_hash"]
        for s in CURATE_STAGES
    }
    # simulate the kill: later stages never committed
    for s in ("near_dedupe", "stratified_cap"):
        shutil.rmtree(base / s)

    from ummon_spark.checkpoint import CheckpointManager
    from ummon_spark.datapipe import curate as curate_mod

    calls = []
    orig = CheckpointManager.stage

    def spy(self, name, build, input_stages=(), extra_signature=""):
        def wrapped():
            calls.append(name)
            return build()

        return orig(self, name, wrapped, input_stages, extra_signature)

    CheckpointManager.stage = spy
    try:
        kept2, rep2 = curate_checkpointed(spark, curate_docs, str(base), cfg, "t")
    finally:
        CheckpointManager.stage = orig
    # completed stages resumed from parquet, not rebuilt
    assert calls == ["near_dedupe", "stratified_cap"]
    assert rep2.counts == rep1.counts
    hashes2 = {
        s: json.load(open(base / s / "_MANIFEST.json"))["content_hash"]
        for s in CURATE_STAGES
    }
    assert hashes2 == hashes1
