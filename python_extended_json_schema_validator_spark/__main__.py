"""CLI — the reference validator's command shape on Spark
(⇔ ``python -m extended_json_schema_validator jsonSchemaDir json_files...``,
reference __main__.py:100-471).  A user of the reference switches by
changing the module name:

    python -m python_extended_json_schema_validator_spark \\
        schemas/ docs_dir_or_files... \\
        [-C config.yaml] [--report out.json] [--error-report]
        [--verbose-report] [--guess-schema] [--use-schemas URI ...]
        [--iter-arrays] [--schema_id_path PATH] [--dot-report out.dot T]
        [--fix] [--annotation PATH] [-c] [-q|-v|-d] [--log-file F]
        [--cache-dir D] [--invalidate] [--read-only] [--warm-up]
        [--lazy-load] [-V] [--master local[N]]

``--fix`` (⇔ reference --fix, __main__.py:180-184,374-452): on any
validation error, write an error-only report and launch ``$EDITOR``
(default ``vi``) on the report plus the erroring files, then rescan
and re-validate; the cycle repeats until everything passes or the
user interrupts.  The editor is a subprocess seam — tests drive it
with a scripted "editor" (tests/test_fix_loop.py).

Exit codes match the reference: 0 clean, 1 no schema loaded, 2 any
document validation error (__main__.py:302-471).  With only a schema
dir given, schemas are loaded + report written and the exit code is
3 on schema-load failures (schema-validation-only mode).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shlex
import signal
import subprocess
import sys
import tempfile


def _pkg_version() -> str:
    from . import __version__

    return __version__


def _setup_logging(args) -> None:
    """⇔ reference logging flags (__main__.py:106-140): -d > -v > -q >
    default WARNING for the engine's own messages."""
    import logging

    level = logging.WARNING
    if args.debug:
        level = logging.DEBUG
    elif args.verbose:
        level = logging.INFO
    elif args.quiet:
        level = logging.ERROR
    kwargs = {"level": level}
    if args.log_format:
        kwargs["format"] = args.log_format
    if args.log_file:
        kwargs["filename"] = args.log_file
    logging.basicConfig(**kwargs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python_extended_json_schema_validator_spark",
        description="PySpark-native extended-JSON-Schema validation",
    )
    ap.add_argument("jsonSchemaDir", help="directory (or file) of JSON Schemas")
    ap.add_argument("json_files", nargs="*", help="document dirs/files to validate")
    ap.add_argument("-C", "--config", help="YAML/JSON config (key providers etc.)")
    ap.add_argument("--report", help="write the JSON report here")
    ap.add_argument("--error-report", action="store_true",
                    help="report only entries with errors")
    ap.add_argument("--quiet-report", action="store_true",
                    help="accepted for back-compat: quiet IS the default "
                    "(reference parity) — see --verbose-report")
    ap.add_argument("--verbose-report", action="store_true",
                    dest="verbose_report",
                    help="embed the validated json contents (doc entries) "
                    "and schema bodies (schema entries) in the report "
                    "(⇔ reference --verbose-report, __main__.py:196-202: "
                    "the report is quiet by default)")
    ap.add_argument("--guess-schema", action="store_true",
                    help="brute-force schemas for docs with no schema id")
    ap.add_argument("--use-schemas", nargs="+", default=None,
                    help="restrict --guess-schema to these URIs")
    ap.add_argument("--iter-arrays", action="store_true",
                    help="shred array inputs, one element per entry")
    ap.add_argument("--no-library-fallback", action="store_false",
                    dest="library_fallback", default=True,
                    help="OPT OUT of the library-verdict escape hatch. "
                    "By default (round 6, reference parity) schemas "
                    "whose compilation recorded warnings (partially-"
                    "enforced shapes) validate through the jsonschema "
                    "library in an Arrow-batched stage, so a default "
                    "run never under-reports vs the reference "
                    "(extensible_validator.py:1163-1194 enforces every "
                    "shape unconditionally); compiled-clean schemas "
                    "never enter Python either way.  Opting out trades "
                    "warned schemas' full enforcement for a Python-"
                    "stage-free plan on their documents")
    ap.add_argument("--library-fallback", action="store_true",
                    dest="library_fallback",
                    help=argparse.SUPPRESS)  # pre-round-6 spelling, now a no-op
    ap.add_argument("--fix", action="store_true", dest="do_fix",
                    help="on validation errors, launch $EDITOR on the "
                    "report + erroring files, then re-validate; repeats "
                    "until clean (⇔ reference --fix, __main__.py:374-452)")
    ap.add_argument("--annotation", default=None,
                    help="dotted/indexed path (e.g. $._id) extracted from "
                    "each validated doc into the report entry's 'annot' key")
    ap.add_argument("-c", "--continue", action="store_true", dest="do_continue",
                    help="accepted for reference-CLI compatibility; the "
                    "distributed engine always evaluates every violation, "
                    "so this is the only behavior")
    ap.add_argument("-q", "--quiet", action="store_true",
                    help="only engine warnings and errors")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="informational messages")
    ap.add_argument("-d", "--debug", action="store_true",
                    help="debug messages")
    ap.add_argument("--log-file", default=None,
                    help="send log messages to this file")
    ap.add_argument("--log-format", default=None,
                    help="logging format string")
    ap.add_argument("--cache-dir", dest="cache_dir", default=None,
                    help="disk cache for remote key-provider responses "
                    "(⇔ extension caches)")
    ap.add_argument("--invalidate", action="store_true",
                    help="drop cached provider responses on startup")
    ap.add_argument("--read-only", dest="cache_read_only",
                    action="store_true",
                    help="use the cache but never write to it")
    ap.add_argument("--warm-up", action="store_true",
                    help="accepted for compatibility: providers are "
                    "always fetched once, eagerly, per run")
    ap.add_argument("--lazy-load", action="store_true",
                    help="accepted for compatibility (see --warm-up)")
    ap.add_argument("-V", "--version", action="version",
                    version="%(prog)s version " + _pkg_version())
    ap.add_argument("--schema_id_path", default=None,
                    help="dotted path of the schema id inside each doc")
    ap.add_argument("--dot-report", nargs=2, metavar=("FILE", "TITLE"),
                    help="write a DOT graph of the loaded schemas")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)
    _setup_logging(args)
    if args.invalidate and args.cache_dir:
        from .providers import invalidate_cache

        invalidate_cache(args.cache_dir)

    from .schemas import SCHEMA_KEY_PROBES, load_schemas, parse_json_or_yaml
    from .suite import extract_annotation, run_suite, scan_documents

    probes = (
        (args.schema_id_path,) if args.schema_id_path else SCHEMA_KEY_PROBES
    )
    config = parse_json_or_yaml(args.config) if args.config else None

    if not args.json_files:
        # schema-validation-only mode (⇔ exit 3 on load failures)
        registry, issues = load_schemas(args.jsonSchemaDir)
        for i in issues:
            print(f"{i.file}: {i.reason}: {i.description}", file=sys.stderr)
        if args.dot_report and registry:
            from .graph import dot_from_registry

            with open(args.dot_report[0], "w") as fh:
                fh.write(dot_from_registry(registry, title=args.dot_report[1]))
        if args.report:
            entries = [
                {
                    "file": cs.file,
                    "uri": uri,
                    "schema_hash": cs.schema_hash,
                    "errors": [],
                    # quiet by default (reference parity) —
                    # --verbose-report embeds the schema body
                    **({"schema": cs.schema} if args.verbose_report else {}),
                }
                for uri, cs in sorted(registry.items())
            ]
            with open(args.report, "w") as fh:
                json.dump(entries, fh, indent=4, sort_keys=True)
        if not registry:
            return 1
        return 3 if issues else 0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(args.master)
        .appName("extended-json-schema-validator")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --fix always writes a report for the editor to read; a temp one
    # if --report was not given (⇔ reference __main__.py:376-382,452)
    fix_report = args.report
    temp_report = None
    if args.do_fix and fix_report is None:
        fd, temp_report = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        fix_report = temp_report

    while True:
        docs = []
        for path in args.json_files:
            docs.extend(
                scan_documents(path, iterate_over_arrays=args.iter_arrays)
            )
        res = run_suite(
            spark,
            args.jsonSchemaDir,
            [(f, d) for f, d, e in docs if e is None],
            config=config,
            probes=probes,
            guess_unmatched=(args.use_schemas or args.guess_schema),
            cache_dir=args.cache_dir,
            cache_read_only=args.cache_read_only,
            library_fallback=args.library_fallback,
        )
        for f, _, e in docs:
            if e is not None:
                res.per_file.setdefault(f, []).append("fatal")

        if fix_report:
            annmap = None
            if args.annotation:
                annmap = {}
                for f, d, e in docs:
                    if e is None:
                        found, val = extract_annotation(d, args.annotation)
                        if found:
                            annmap[f] = val
            with open(fix_report, "w") as fh:
                json.dump(
                    res.report(
                        annot=annmap,
                        # quiet by DEFAULT, --verbose-report flips it
                        # (reference parity, __main__.py:196-202) and
                        # embeds each doc's parsed contents as "json"
                        quiet=not args.verbose_report,
                        docs={f: d for f, d, e in docs if e is None},
                        annotation=args.annotation,
                        # fix mode writes error-only entries, like the
                        # reference's `elif args.doFix: continue` skip
                        # (__main__.py:414-416)
                        error_report=args.error_report or args.do_fix,
                    ),
                    fh,
                    indent=4,
                    sort_keys=True,
                    default=str,
                )

        # array-shredded entries are named "file [i]" — the editor
        # needs the real file, deduped, in a stable order
        err_files = sorted(
            {
                re.sub(r" \[\d+\]$", "", f)
                for f, v in res.per_file.items()
                if v
            }
        )
        if not (args.do_fix and err_files):
            break
        # ⇔ reference __main__.py:436-447: $EDITOR (default vi) gets
        # the report first, then every erroring document, through the
        # shell; ^C forwards SIGINT to the editor before re-raising
        editor = os.environ.get("EDITOR", "vi")
        cmdline = " ".join(shlex.quote(p) for p in [fix_report] + err_files)
        fix_proc = subprocess.Popen(f"{editor} {cmdline}", shell=True)
        try:
            fix_proc.wait()
        except KeyboardInterrupt:
            fix_proc.send_signal(signal.SIGINT)
            raise

    if temp_report is not None:
        os.unlink(temp_report)

    if args.dot_report and res.registry:
        from .graph import dot_from_registry

        with open(args.dot_report[0], "w") as fh:
            fh.write(dot_from_registry(res.registry, title=args.dot_report[1]))

    for i in res.schema_issues:
        print(f"{i.file}: {i.reason}: {i.description}", file=sys.stderr)
    n_bad = sum(1 for v in res.per_file.values() if v)
    print(
        f"{len(res.per_file)} documents, {n_bad} with errors, "
        f"{len(res.registry)} schemas",
        file=sys.stderr,
    )
    if any("fatal" in v for v in res.per_file.values()):
        return 2
    return res.exit_code


if __name__ == "__main__":
    sys.exit(main())
