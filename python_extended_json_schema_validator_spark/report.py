"""Report sink + exit codes (SURVEY.md §2.1 S9/S11).

The reference emits a JSON array report: one entry per schema, then
one entry per document with its error list; ``--error-report`` keeps
only erroring entries, ``--annotation`` extracts a JSONPath from each
doc into its entry (__main__.py:311-338,389-434).  Exit codes:
0 ok, 2 doc errors, 3 schema errors, 1 no schema loaded
(__main__.py:302-304,351-357,461-465) — with the [verified] quirk that
in report mode doc errors do NOT propagate to the exit code.

Scale note: the JSON-array report is a driver-side artifact for
human-sized outputs (the reference's use case).  At 10^12 rows you
write ``result.violations`` to a table instead — ``write_violations``
does that; ``json_report`` collect()s and is guarded accordingly.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import ValidationResult

REPORT_COLLECT_LIMIT = 100_000


def json_report(
    result: ValidationResult,
    error_report: bool = False,
    annotations: Optional[Dict[str, str]] = None,
    limit: int = REPORT_COLLECT_LIMIT,
) -> list:
    """Reference-shaped report: one entry per row ``{file, errors:
    [{reason, description, path}...]}`` (+ optional annotation
    columns), per table.  error_report ⇔ --error-report."""
    out = []
    for table, df in result.tables.items():
        spec = result.specs[table]
        rid = F.col(spec.row_id).cast("string").alias("row_id")
        viol = (
            result.violations_for(table)
            .groupBy("row_id")
            .agg(
                F.collect_list(
                    F.struct("reason", "constraint_id", "observed_value", "path")
                ).alias("errors")
            )
        )
        ann_cols = []
        if annotations:
            ann_cols = [
                F.col(col).cast("string").alias(name)
                for name, col in annotations.items()
                if col in df.columns
            ]
        rows = df.select(rid, *ann_cols).join(viol, "row_id", "left")
        if error_report:
            rows = rows.where(F.size(F.coalesce("errors", F.array())) > 0)
        collected = rows.limit(limit + 1).collect()
        if len(collected) > limit:
            raise ValueError(
                f"report for {table} exceeds {limit} rows - write "
                "result.violations to a table instead (write_violations)"
            )
        for r in collected:
            entry = {"file": r.row_id, "table": table, "errors": []}
            if annotations:
                entry["annotations"] = {
                    k: r[k] for k in annotations if k in r.__fields__
                }
            for e in r.errors or []:
                entry["errors"].append(
                    {
                        "reason": e.reason,
                        "description": f"{e.constraint_id}: "
                        f"{e.observed_value!r}",
                        "path": e.path,
                    }
                )
            out.append(entry)
    return out


def write_violations(result: ValidationResult, path: str, fmt: str = "parquet"):
    """The scale path: violations as a table (⇔ report file)."""
    w = result.violations.write.mode("overwrite")
    (w.parquet(path) if fmt == "parquet" else w.json(path))


def exit_code(
    n_schema_errors: int,
    n_doc_errors: int,
    schemas_loaded: bool = True,
    report_mode: bool = False,
) -> int:
    """The reference CLI contract (__main__.py:302-304,351-357,461-465):
    1 = no usable schema, 3 = schema errors, 2 = doc errors — EXCEPT in
    report mode, where doc errors do not set the exit code ([verified]
    quirk: loopExitCode at :391-413 is never propagated)."""
    if not schemas_loaded:
        return 1
    if n_schema_errors:
        return 3
    if n_doc_errors and not report_mode:
        return 2
    return 0
