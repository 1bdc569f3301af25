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
write ``result.violations`` to a table instead (``write_violations``),
or consume ``report_df`` — the SAME entry shape as a lazy DataFrame,
no driver collect; ``json_report`` is its bounded driver-side
rendering (limit-guarded).
"""

from __future__ import annotations

import json
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import ValidationResult

REPORT_COLLECT_LIMIT = 100_000


def _table_report_df(
    result: ValidationResult,
    table: str,
    annotations: Optional[Dict[str, str]] = None,
    doc_json_col: Optional[str] = None,
    annotation_path: Optional[str] = None,
) -> DataFrame:
    """One table's report entries as a LAZY DataFrame ``(file,
    annotations map<string,string>, errors array<struct<reason,
    constraint_id, observed_value, path>>[, json, annot])`` — one
    narrow groupBy(row_id) + left join, no driver materialization.

    ``doc_json_col``: column holding each row's document JSON text
    (``__raw`` on shredded tables) — embedded as ``json``, the
    distributed twin of ``--verbose-report`` (reference
    __main__.py:421-424).  ``annotation_path``: a ``$.a.b`` JSONPath
    extracted per document into ``annot`` (⇔ --annotation,
    __main__.py:418-421) via JVM get_json_object — string-rendered
    (objects/arrays as JSON text, scalars bare)."""
    df = result.tables[table]
    spec = result.specs[table]
    rid = F.col(spec.row_id).cast("string").alias("file")
    viol = (
        result.violations_for(table)
        .groupBy("row_id")
        .agg(
            F.collect_list(
                F.struct("reason", "constraint_id", "observed_value", "path")
            ).alias("errors")
        )
        .withColumnRenamed("row_id", "file")
    )
    ann_pairs = []
    if annotations:
        for name, col in annotations.items():
            if col in df.columns:
                ann_pairs.extend([F.lit(name), F.col(col).cast("string")])
    ann_col = (
        F.create_map(*ann_pairs)
        if ann_pairs
        else F.lit(None).cast("map<string,string>")
    )
    cols = [rid, ann_col.alias("annotations")]
    if doc_json_col is not None:
        raw = (
            F.col(doc_json_col)
            if doc_json_col in df.columns
            else F.lit(None).cast("string")
        )
        cols.append(raw.alias("json"))
        if annotation_path is not None:
            jp = annotation_path
            if not jp.startswith("$"):
                jp = "$." + jp
            cols.append(F.get_json_object(raw, jp).alias("annot"))
    return df.select(*cols).join(viol, "file", "left")


def _has_errors(col: str = "errors"):
    return F.col(col).isNotNull() & (F.size(col) > 0)


def report_df(
    result: ValidationResult,
    error_report: bool = False,
    annotations: Optional[Dict[str, str]] = None,
    doc_json_col: Optional[str] = None,
    annotation_path: Optional[str] = None,
) -> DataFrame:
    """The SCALE path for reports: every table's entries as ONE lazy
    DataFrame ``(table, file, annotations, errors[, json, annot])`` —
    the distributed analogue of ``json_report`` (which is built on the
    same per-table frames, so the shapes agree by construction).
    ``doc_json_col``/``annotation_path`` make the scale report
    feature-complete vs the driver path's verbose mode (document
    embedding + per-doc annotation, SuiteResult.report(quiet=False,
    annotation=...)) — parity-tested entry-for-entry in
    tests/test_sources_dispatch_report.py.  At 10^12 rows write this
    to a table; nothing is collected to the driver."""
    extra = (
        (["json", "annot"] if annotation_path is not None else ["json"])
        if doc_json_col is not None
        else []
    )
    frames = [
        _table_report_df(
            result, table, annotations, doc_json_col, annotation_path
        ).select(
            F.lit(table).alias("table"), "file", "annotations", *extra,
            "errors",
        )
        for table in result.tables
    ]
    if not frames:
        extra_ddl = "".join(
            f", {c} string" for c in extra
        )
        return result.violations.sparkSession.createDataFrame(
            [],
            "table string, file string, annotations map<string,string>"
            + extra_ddl
            + ", errors array<struct<reason:string, constraint_id:string, "
            "observed_value:string, path:string>>",
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.where(_has_errors()) if error_report else out


def json_report(
    result: ValidationResult,
    error_report: bool = False,
    annotations: Optional[Dict[str, str]] = None,
    limit: int = REPORT_COLLECT_LIMIT,
) -> list:
    """Reference-shaped report: one entry per row ``{file, errors:
    [{reason, description, path}...]}`` (+ optional annotation
    columns), per table.  error_report ⇔ --error-report.  Built on the
    same lazy frames as ``report_df`` (driver-side only the bounded
    collect + description formatting)."""
    out = []
    for table in result.tables:
        rows = _table_report_df(result, table, annotations)
        if error_report:
            rows = rows.where(_has_errors())
        collected = rows.limit(limit + 1).collect()
        if len(collected) > limit:
            raise ValueError(
                f"report for {table} exceeds {limit} rows - write "
                "result.violations to a table instead (write_violations) "
                "or consume report_df lazily"
            )
        for r in collected:
            entry = {"file": r.file, "table": table, "errors": []}
            if annotations:
                entry["annotations"] = dict(r.annotations or {})
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
