"""Reusable distributed operators (dedup, similarity) used by the query layer."""
