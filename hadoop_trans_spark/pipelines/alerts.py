"""Structured alert sink — replaces the reference's SMTP email alerting
(`SendEmail.java:23-49`, hard-coded 163.com credentials; a bug we do not
reproduce). Alerts are structured records: logged, collected on the
report object, and optionally appended to a JSONL audit file.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import asdict, dataclass

log = logging.getLogger("hadoop_trans_spark.alerts")


@dataclass
class Alert:
    severity: str  # info | warning | error
    kind: str  # conflict | missing_source | verify_mismatch | compact_failure
    table: str
    partition: str
    message: str
    ts: float = 0.0

    def __post_init__(self) -> None:
        if not self.ts:
            self.ts = time.time()


class AlertSink:
    def __init__(self, jsonl_path: str | None = None) -> None:
        self.alerts: list[Alert] = []
        self.jsonl_path = jsonl_path

    def emit(self, alert: Alert) -> None:
        self.alerts.append(alert)
        log.log(
            logging.ERROR if alert.severity == "error" else logging.WARNING,
            "[%s] %s %s/%s: %s",
            alert.kind, alert.severity, alert.table, alert.partition, alert.message,
        )
        if self.jsonl_path:
            with open(self.jsonl_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(asdict(alert)) + "\n")
