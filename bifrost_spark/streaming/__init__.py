"""Structured-Streaming archival pipeline (bifrost parity) + telemetry."""
