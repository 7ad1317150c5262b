"""Alert rules with severity + event-time cooldown suppression.

Reference: src/streaming/realtime_gold_processor.py:97-118 (AlertRule with
severity + cooldown_minutes), :333-397 (built-in rules), :608-689 (per-batch
condition check with a recent-alerts cache for dedup). The reference
implements cooldown as a wall-clock cache TTL on the driver; here it is an
EVENT-TIME semantic over the metric series, so it is deterministic,
replayable, and batch-testable: a violation fires only if no alert for the
same rule fired within the preceding ``cooldown_minutes`` — measured against
the last alert actually KEPT, not merely the previous violation (a
burst-long violation fires once per cooldown period, matching the
reference's cache behavior).

Kept-based suppression is a sequential scan per rule, which no window
function expresses (each decision depends on the accumulated kept set).
``applyInPandas`` runs it grouped by rule: the input is the already
aggregated metric series (windows per rule), thousands of rows at most even
at 100 TB of raw events — the heavy aggregation upstream stays in native
Spark; only the KB-scale suppression scan crosses into Arrow.
"""

from __future__ import annotations

import operator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = {
    ">": operator.gt,
    ">=": operator.ge,
    "<": operator.lt,
    "<=": operator.le,
    "==": operator.eq,
    "!=": operator.ne,
}

SEVERITIES = ("info", "low", "medium", "high", "critical")


@dataclass(frozen=True)
class CooldownAlertRule:
    rule_id: str
    metric_col: str
    op: str  # > >= < <= == !=
    threshold: float
    severity: str = "medium"
    cooldown_minutes: int = 5


def find_violations(
    metrics: DataFrame, rules: list[CooldownAlertRule], ts_col: str
) -> DataFrame:
    """All threshold violations, one row per (rule, metric window):
    (rule_id, severity, cooldown_min, window_start, metric_value).
    Union of per-rule filters — each a pushdown-friendly predicate over the
    aggregated metric frame."""
    parts = []
    for r in rules:
        if r.op not in _OPS:
            raise ValueError(f"unknown operator {r.op!r}")
        if r.severity not in SEVERITIES:
            raise ValueError(f"unknown severity {r.severity!r}")
        cond = _OPS[r.op](F.col(r.metric_col), F.lit(r.threshold))
        parts.append(
            metrics.filter(cond).select(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit(r.severity).alias("severity"),
                F.lit(r.cooldown_minutes).cast("int").alias("cooldown_min"),
                F.col(ts_col).alias("window_start"),
                F.col(r.metric_col).cast("double").alias("metric_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def apply_cooldown(violations: DataFrame) -> DataFrame:
    """Kept-based cooldown suppression per rule_id (sequential scan in
    Arrow batches; see module docstring for why this is not a window fn)."""
    schema = violations.schema

    def _suppress(pdf):
        import pandas as pd

        pdf = pdf.sort_values("window_start")
        cd = pd.to_timedelta(int(pdf["cooldown_min"].iloc[0]), unit="m")
        keep, last = [], None
        for ts in pdf["window_start"]:
            fire = last is None or ts >= last + cd
            keep.append(fire)
            if fire:
                last = ts
        return pdf[pd.Series(keep, index=pdf.index)]

    return violations.groupBy("rule_id").applyInPandas(_suppress, schema)


def evaluate_with_cooldown(
    metrics: DataFrame, rules: list[CooldownAlertRule], ts_col: str
) -> DataFrame:
    """Full pipeline: violations → kept-based cooldown → fired alerts
    (rule_id, severity, window_start, metric_value)."""
    fired = apply_cooldown(find_violations(metrics, rules, ts_col))
    return fired.select("rule_id", "severity", "window_start", "metric_value")
