"""Triple-level precision/recall vs a golden fixture set.

The BASELINE correctness criterion is triple P/R >= 0.95 against the
reference's emitted (subj, pred, obj) set. This computes it with two
anti-join counts — no collect, scales to any fixture size — plus a
per-predicate breakdown for diagnosing which edge builder drifted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE = ("subj", "pred", "obj")


@dataclass
class PRReport:
    precision: float
    recall: float
    n_emitted: int
    n_golden: int
    n_matched: int
    per_pred: dict[str, dict[str, float]]

    def passes(self, threshold: float = 0.95) -> bool:
        return self.precision >= threshold and self.recall >= threshold


def triple_pr(emitted: DataFrame, golden: DataFrame) -> PRReport:
    e = emitted.select(*TRIPLE).distinct()
    g = golden.select(*TRIPLE).distinct()
    n_e = e.count()
    n_g = g.count()
    matched = e.join(g, list(TRIPLE), "left_semi")
    n_m = matched.count()

    per = {}
    stats = (
        e.withColumn("_side", F.lit("e"))
        .unionByName(g.withColumn("_side", F.lit("g")))
        .groupBy("pred", "_side")
        .count()
        .collect()
    )
    m_stats = matched.groupBy("pred").count().collect()
    e_by = {r["pred"]: r["count"] for r in stats if r["_side"] == "e"}
    g_by = {r["pred"]: r["count"] for r in stats if r["_side"] == "g"}
    m_by = {r["pred"]: r["count"] for r in m_stats}
    for pred in sorted(set(e_by) | set(g_by)):
        m = m_by.get(pred, 0)
        per[pred] = {
            "precision": m / e_by[pred] if e_by.get(pred) else 0.0,
            "recall": m / g_by[pred] if g_by.get(pred) else 0.0,
            "emitted": e_by.get(pred, 0),
            "golden": g_by.get(pred, 0),
        }
    return PRReport(
        precision=n_m / n_e if n_e else 1.0,
        recall=n_m / n_g if n_g else 1.0,
        n_emitted=n_e,
        n_golden=n_g,
        n_matched=n_m,
        per_pred=per,
    )
