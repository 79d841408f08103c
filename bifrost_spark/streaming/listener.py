"""Telemetry (reference A20–A21 parity): per-query metrics via
StreamingQueryListener instead of Dropwizard meters.

The reference meters per-(topic,partition) message rates, upload timers and
channel-depth gauges (telemetry.clj, async.clj:8-14) and ships them to
Riemann/StatsD.  Spark's listener surfaces the same signals per micro-batch:
``numInputRows``, ``inputRowsPerSecond``, ``processedRowsPerSecond``, batch
``durationMs`` (≈ upload timer), and sink commit progress (≈ offset-commit
meter).  ``MetricsListener`` keeps a bounded in-memory history and an
optional StatsD UDP emitter (stdlib socket, fire-and-forget like the
reference's reporters — telemetry.clj:30-39).
"""

from __future__ import annotations

import json
import socket
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Bounded-history streaming metrics with optional StatsD emission."""

    def __init__(self, statsd_host: str | None = None, statsd_port: int = 8125,
                 history: int = 100) -> None:
        self.progress: deque = deque(maxlen=history)
        self._statsd = (statsd_host, statsd_port) if statsd_host else None
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM) if statsd_host else None

    @classmethod
    def from_env(cls, environ=None, history: int = 100) -> "MetricsListener":
        """Reference telemetry.clj:30-39 parity: the daemon reads
        ``STATSD_HOST`` / ``STATSD_PORT`` from the environment — unset host
        means metrics stay in-memory only."""
        import os

        env = os.environ if environ is None else environ
        host = env.get("STATSD_HOST") or None
        port = int(env.get("STATSD_PORT", "8125"))
        return cls(statsd_host=host, statsd_port=port, history=history)

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self._emit("bifrost.query.started", 1)
        # A24 parity: the reference gauges its build number at startup
        # (version.clj:1-12 + telemetry reporter); encode semver as one
        # numeric gauge (major·10⁴ + minor·10² + patch)
        self._emit("bifrost.build", _build_number())

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.progress.append(p)
        self._emit("bifrost.rows.input", p.get("numInputRows", 0))
        rps = p.get("inputRowsPerSecond")
        if rps is not None:
            self._emit("bifrost.rows.input_per_sec", rps)
        for name, ms in (p.get("durationMs") or {}).items():
            self._emit(f"bifrost.batch.{name.lower()}_ms", ms)
        # observe()-collected in-flight quality counters (archive.py):
        # {observation_name: {metric: value}} — emitted under
        # bifrost.observed.<observation>.<metric>
        for obs_name, metrics in (p.get("observedMetrics") or {}).items():
            for mname, mval in (metrics or {}).items():
                if isinstance(mval, (int, float)):
                    self._emit(f"bifrost.observed.{obs_name}.{mname}", mval)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._emit("bifrost.query.terminated", 1)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- StatsD (counter/gauge lines, fire-and-forget UDP) ------------------
    def _emit(self, metric: str, value) -> None:
        if not self._sock:
            return
        try:
            self._sock.sendto(f"{metric}:{value}|g".encode(), self._statsd)
        except OSError:
            pass  # telemetry must never take down the pipeline

    # -- convenience --------------------------------------------------------
    def total_input_rows(self) -> int:
        return int(sum(p.get("numInputRows", 0) for p in self.progress))


def _build_number() -> int:
    """Semver → single gauge value (0.2.1 → 201), tolerant of suffixes."""
    from bifrost_spark import __version__

    parts = []
    for p in __version__.split(".")[:3]:
        digits = "".join(ch for ch in p if ch.isdigit())
        parts.append(int(digits or 0))
    while len(parts) < 3:
        parts.append(0)
    major, minor, patch = parts
    return major * 10_000 + minor * 100 + patch
