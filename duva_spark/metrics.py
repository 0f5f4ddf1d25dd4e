"""Prometheus-compatible metrics (C7) — text exposition format on the
stdlib, no prometheus_client dependency.

Reference metrics reproduced (app/utils/onadata_utils.py:37-47, served
at /metrics via app/main.py:56-64):
- ``in_progress_hyper_import`` gauge — syncs currently running;
- ``successful_hyper_database_imports`` counter;
- ``failed_hyper_database_imports`` counter.

The exposition format is the published Prometheus text format
(``# HELP`` / ``# TYPE`` / ``name value``), so a real Prometheus scrape
of the control-plane server works unmodified. Spark's own executor/task
metrics remain available through its native Prometheus servlet; these
are the *product-level* sync counters the reference exposes.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class _Metric:
    name: str
    help: str
    kind: str  # "gauge" | "counter"
    value: float = 0.0


@dataclass
class MetricsRegistry:
    """Thread-safe registry of the sync metrics + text exposition."""

    _mu: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self):
        self.in_progress = _Metric(
            "in_progress_hyper_import",
            "Number of Import processes currently running for Tableau Hyper databases",
            "gauge",
        )
        self.successful = _Metric(
            "successful_hyper_database_imports",
            "Number of successfull imports to a hyper database",
            "counter",
        )
        self.failed = _Metric(
            "failed_hyper_database_imports",
            "Number of failed imports to a hyper database",
            "counter",
        )
        self._all = [self.in_progress, self.successful, self.failed]

    def inc(self, metric: _Metric, delta: float = 1.0) -> None:
        with self._mu:
            metric.value += delta

    @contextmanager
    def track_sync(self):
        """Wrap one sync run: gauge up while running, success/failure
        counter on the way out (the reference wraps start_csv_import
        the same way)."""
        self.inc(self.in_progress, 1)
        try:
            yield
        except BaseException:
            self.inc(self.in_progress, -1)
            self.inc(self.failed, 1)
            raise
        else:
            self.inc(self.in_progress, -1)
            self.inc(self.successful, 1)

    def exposition(self) -> str:
        """Prometheus text format, one block per metric."""
        with self._mu:
            lines = []
            for m in self._all:
                lines.append(f"# HELP {m.name} {m.help}")
                lines.append(f"# TYPE {m.name} {m.kind}")
                v = int(m.value) if m.value == int(m.value) else m.value
                lines.append(f"{m.name} {v}")
            return "\n".join(lines) + "\n"
