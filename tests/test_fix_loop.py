"""--fix loop parity (⇔ reference __main__.py:374-452): on errors the
CLI writes an error-only report, launches $EDITOR on [report, bad
files...], re-validates, and repeats until clean.  The editor here is
a scripted subprocess that records its argv and rewrites the bad doc.
"""

import json
import os
import sys

DRAFT = "http://json-schema.org/draft-07/schema#"

SCHEMA = {
    "$schema": DRAFT,
    "$id": "fix://t/1.0",
    "type": "object",
    "properties": {"v": {"type": "integer", "minimum": 0}},
    "required": ["v"],
}


def _write_suite(tmp_path):
    schemas = tmp_path / "schemas"
    docs = tmp_path / "docs"
    schemas.mkdir()
    docs.mkdir()
    (schemas / "s.json").write_text(json.dumps(SCHEMA))
    (docs / "good.json").write_text(
        json.dumps({"@schema": "fix://t/1.0", "v": 7})
    )
    (docs / "bad.json").write_text(
        json.dumps({"@schema": "fix://t/1.0", "v": -3})
    )
    return schemas, docs


def _write_editor(tmp_path):
    """A scripted $EDITOR: log argv, then set v=5 in every doc arg
    (argv[1] is the report file — left alone, like a user would
    read it to learn what to fix)."""
    log = tmp_path / "editor.log"
    script = tmp_path / "editor.py"
    script.write_text(
        "import json, sys\n"
        f"open({str(log)!r}, 'a').write(json.dumps(sys.argv[1:]) + '\\n')\n"
        "for p in sys.argv[2:]:\n"
        "    doc = json.load(open(p))\n"
        "    doc['v'] = 5\n"
        "    json.dump(doc, open(p, 'w'))\n"
    )
    return script, log


def test_fix_loop_edits_until_clean(spark, tmp_path, monkeypatch):
    from python_extended_json_schema_validator_spark.__main__ import main

    schemas, docs = _write_suite(tmp_path)
    script, log = _write_editor(tmp_path)
    monkeypatch.setenv("EDITOR", f"{sys.executable} {script}")

    rc = main([str(schemas), str(docs), "--fix"])
    assert rc == 0

    calls = [json.loads(l) for l in log.read_text().splitlines()]
    # exactly one editor round: [temp report, bad.json]
    assert len(calls) == 1
    assert calls[0][1:] == [str(docs / "bad.json")]
    report_path = calls[0][0]
    # the temp report existed for the editor, was error-only, and is
    # unlinked after the loop (⇔ __main__.py:451-452)
    assert not os.path.exists(report_path)
    # the doc really was fixed on disk and now validates
    assert json.load(open(docs / "bad.json"))["v"] == 5


def test_fix_loop_with_report_keeps_final_clean_report(
    spark, tmp_path, monkeypatch
):
    from python_extended_json_schema_validator_spark.__main__ import main

    schemas, docs = _write_suite(tmp_path)
    script, log = _write_editor(tmp_path)
    monkeypatch.setenv("EDITOR", f"{sys.executable} {script}")
    rep = tmp_path / "rep.json"

    rc = main([str(schemas), str(docs), "--fix", "--report", str(rep),
               "--quiet-report"])
    assert rc == 0
    calls = [json.loads(l) for l in log.read_text().splitlines()]
    assert calls[0][0] == str(rep)
    # final iteration rewrote the report clean: fix mode is error-only,
    # so only the schema entry remains
    entries = json.load(open(rep))
    assert [e for e in entries if "uri" in e]
    assert not [e for e in entries if e.get("errors")]


def test_fix_skipped_when_already_clean(spark, tmp_path, monkeypatch):
    from python_extended_json_schema_validator_spark.__main__ import main

    schemas, docs = _write_suite(tmp_path)
    (docs / "bad.json").write_text(
        json.dumps({"@schema": "fix://t/1.0", "v": 1})
    )
    script, log = _write_editor(tmp_path)
    monkeypatch.setenv("EDITOR", f"{sys.executable} {script}")
    rc = main([str(schemas), str(docs), "--fix"])
    assert rc == 0
    assert not log.exists()  # editor never launched
