"""Declarative threshold alerting over per-window verdict metrics.

Engine realization of the reference's config-driven ``AlertManager``
(``/root/reference/DESIGN.md:674-747``): each rule names a metric, a
comparison, a threshold, a severity and a message template; rules evaluate
over the per-window lineage/verdict rows the pipeline already emits, and
fired alerts append to a Parquet history log (the reference keeps
``alert_history`` in process memory, ``DESIGN.md:685-687``).

Metrics addressable by rules: any key of ``WindowResult.verdict_row()``
(``n_rows``, ``n_violations``, ``quality_score``, ``drift_detected``,
``wall_s``) plus ``counters.<name>`` (e.g. ``counters.sha256|content``)
and ``violation_rate`` (= n_violations / n_rows).
"""

from __future__ import annotations

import operator
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

_OPS = {">": operator.gt, ">=": operator.ge, "<": operator.lt,
        "<=": operator.le, "==": operator.eq, "!=": operator.ne}


@dataclass(frozen=True)
class AlertRule:
    name: str
    metric: str                    # e.g. "quality_score", "counters.sha256|content"
    comparison: str                # one of > >= < <= == !=
    threshold: float
    severity: str = "warning"      # info | warning | critical
    message: str = "{name}: {metric} {comparison} {threshold} (value={value})"

    @classmethod
    def from_dict(cls, d: dict) -> "AlertRule":
        return cls(name=d["name"], metric=d["metric"],
                   comparison=d.get("comparison", ">"),
                   threshold=float(d["threshold"]),
                   severity=d.get("severity", "warning"),
                   message=d.get("message", cls.message))

    def value_of(self, verdict: dict) -> float | None:
        if self.metric == "violation_rate":
            n = verdict.get("n_rows") or 0
            return (verdict.get("n_violations", 0) / n) if n else 0.0
        if self.metric.startswith("counters."):
            return verdict.get("counters", {}).get(self.metric[len("counters."):])
        v = verdict.get(self.metric)
        return float(v) if isinstance(v, bool) else v

    def evaluate(self, verdict: dict) -> dict | None:
        value = self.value_of(verdict)
        if value is None:
            return None
        if _OPS[self.comparison](value, self.threshold):
            return {
                "rule": self.name,
                "severity": self.severity,
                "window_id": int(verdict.get("window_id", -1)),
                "metric": self.metric,
                "value": float(value),
                "threshold": float(self.threshold),
                "message": self.message.format(
                    name=self.name, metric=self.metric,
                    comparison=self.comparison, threshold=self.threshold,
                    value=value),
            }
        return None


DEFAULT_RULES = [
    AlertRule("low_quality", "quality_score", "<", 0.95, "warning"),
    AlertRule("drift", "drift_detected", "==", 1, "critical"),
    AlertRule("any_sha_mismatch", "counters.sha256|content", ">", 0, "critical"),
    AlertRule("high_violation_rate", "violation_rate", ">", 0.05, "critical"),
    # run-level (window_id = -1 synthetic verdict from run_validation):
    # the upstream writer changed the table shape between runs
    AlertRule("schema_drift", "schema_drift", "==", 1, "critical"),
    AlertRule("schema_violations", "schema_violations", ">", 0, "critical"),
]

_ALERT_SCHEMA = pa.schema([
    ("rule", pa.string()), ("severity", pa.string()), ("window_id", pa.int64()),
    ("metric", pa.string()), ("value", pa.float64()), ("threshold", pa.float64()),
    ("message", pa.string()),
])


class AlertManager:
    def __init__(self, rules: list[AlertRule] | None = None,
                 history_path: str | None = None):
        self.rules = rules if rules is not None else list(DEFAULT_RULES)
        self.history_path = history_path

    @classmethod
    def from_config(cls, rules: list[dict], history_path: str | None = None):
        return cls([AlertRule.from_dict(r) for r in rules], history_path)

    def evaluate(self, verdicts: list[dict]) -> list[dict]:
        """Evaluate every rule over every verdict row; append fired alerts
        to the history log (append-only Parquet part files)."""
        fired = []
        for v in verdicts:
            for rule in self.rules:
                a = rule.evaluate(v)
                if a:
                    fired.append(a)
        if fired and self.history_path:
            os.makedirs(self.history_path, exist_ok=True)
            n_existing = len(os.listdir(self.history_path))
            pq.write_table(
                pa.Table.from_pylist(fired, schema=_ALERT_SCHEMA),
                os.path.join(self.history_path, f"alerts-{n_existing:06d}.parquet"))
        return fired

    def history(self) -> pa.Table:
        if not self.history_path or not os.path.isdir(self.history_path):
            return _ALERT_SCHEMA.empty_table()
        parts = sorted(os.listdir(self.history_path))
        if not parts:
            return _ALERT_SCHEMA.empty_table()
        return pa.concat_tables(
            [pq.read_table(os.path.join(self.history_path, p)) for p in parts])
