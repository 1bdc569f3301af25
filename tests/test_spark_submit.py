"""The spark-submit launch surface (spark_submit_main.py), driven as
the north rule prescribes: ``spark-submit --py-files engine.zip`` in a
fresh subprocess, exit codes per the reference contract (0 clean, 2
document errors), resume via the manifest, and ``--ledgers`` wiring
all four cross-increment ledger families from one flag.

Marked by duration, not skipped: two JVM launches ≈ 2 min — the only
coverage of the actual cluster-launch invocation path.
"""

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_engine(path):
    pkg = os.path.join(REPO, "python_extended_json_schema_validator_spark")
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def _submit(extra, env=None):
    cmd = [
        "spark-submit",
        "--master",
        "local[4]",
        "--py-files",
        extra.pop("pyfiles"),
        os.path.join(REPO, "spark_submit_main.py"),
        "--sf-dir",
        "/root/testdata/sf0.001",
        *extra.pop("args"),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, cwd=REPO,
        env=env,
    )
    summary = None
    for line in proc.stdout.splitlines():
        if line.startswith('{"run_id"'):
            summary = json.loads(line)
    return proc.returncode, summary, proc


def test_spark_submit_ledgers_resume_cycle(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    _zip_engine(zip_path)
    out = str(tmp_path / "vo")
    ledgers = f"{out}/ledgers"
    # --av (round 7) attaches deterministic audio/video payload
    # columns and enables their ledger families alongside the five
    # originals — one flag pair drives all SEVEN in two launches
    args = ["--output", out, "--ledgers", ledgers, "--av"]

    # run 1: violations found (exit 2), all seven ledgers recorded
    rc1, s1, p1 = _submit({"pyfiles": zip_path, "args": args})
    assert rc1 == 2, p1.stderr[-2000:]
    assert s1["n_violations"] > 0 and s1["partitions"] == 16
    assert sorted(os.listdir(ledgers)) == [
        "audio", "drift", "hll", "keys", "neardup", "phash", "video"
    ]

    # run 2: resume — nothing pending, exit 0; the empty increment's
    # zero-row ledger appends must not poison seq (next_seq coalesce)
    rc2, s2, p2 = _submit({"pyfiles": zip_path, "args": args})
    assert rc2 == 0, p2.stderr[-2000:]
    assert s2["n_violations"] == 0 and s2["partitions"] == 0
    assert s1["run_id"] != s2["run_id"]
