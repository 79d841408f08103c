"""Operator catalog generator: ``python -m bifrost_spark.catalog`` prints
the OPERATORS.md markdown table from the live registry, so the published
inventory can never drift from the code."""

from __future__ import annotations

import bifrost_spark.registry as registry


def render() -> str:
    registry._ensure_loaded()
    lines = [
        "# OPERATORS — generated catalog of every registered query",
        "",
        "Generated from `bifrost_spark.registry` (source of truth behind",
        "`__spark_entry__.py::queries()/oracle_sql()`).  Check: `oracle` =",
        "DuckDB hash-compare (row count + schema + order-insensitive values),",
        "`rows-only` = randomized/Python-path per SURVEY.md §5.2 policy.",
        "Regenerate: `python -m bifrost_spark.catalog > OPERATORS.md`.",
        "",
        f"Total: {len(registry.REGISTRY)} queries, "
        f"{sum(1 for s in registry.REGISTRY.values() if s.oracle)} oracle-checked.",
        "",
        "| query id | check | summary |",
        "|---|---|---|",
    ]
    for name in sorted(registry.REGISTRY):
        spec = registry.REGISTRY[name]
        first = (spec.doc or "").strip().split("\n\n")[0].replace("\n", " ")
        first = " ".join(first.split())
        if len(first) > 160:
            first = first[:157] + "..."
        check = "oracle" if spec.oracle else "rows-only"
        lines.append(f"| `{name}` | {check} | {first} |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    print(render(), end="")
