"""Systematic format-checker differential: every FORMATS entry that is
ACTIVE in this jsonschema install must agree with the library's own
checker function on a hand battery + seeded fuzz (the reference passes
a plain jsonschema.FormatChecker — extensible_validator.py:132-138,
1164 — so the library IS the parity target).  `uri`/`hostname` are
engine extras (inactive in a bare install) and are excluded here.
"""

import random

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.checks import row_checks

BATTERY = {
    "date": [
        "2024-01-02", "2024-02-29", "2023-02-29", "2024-02-31",
        "2024-13-01", "2024-1-2", "24-01-02", "2024-01-02T", "x",
    ],
    "time": [
        "12:30:45", "1:30:45", "012:30:45", "23:59:59", "24:00:00",
        "12:30:60", "12:30:61", "12:30", "12:30:45.5", "12:30:45Z",
        "9:05:00", "09:5:00", "12:30:4", "9:5:4", "12:059:00", "xx:30:45", "",
    ],
    "date-time": [
        "2024-01-02T12:30:45Z", "2024-01-02t12:30:45z",
        "2024-01-02 12:30:45Z", "2024-01-02T12:30:45",
        "2024-02-31T12:30:45Z", "2024-02-29T00:00:00+05:30",
        "2023-02-29T00:00:00Z", "2024-01-02T12:30:45.123456-08:00",
        "2024-01-02T24:00:00Z", "2024-01-02T12:30:60Z",
        "2024-01-02T12:30:45+24:00", "2024-01-02T12:30:45-00:60",
        "2024-01-02T12:30:45+0500", "not a datetime",
    ],
    "email": ["a@b", "a@b.c", "@", "ab", "user name@x", ""],
    "idn-email": ["a@b", "ab", "é@b"],
    "uuid": [
        "12345678-1234-1234-1234-123456789abc",
        "12345678-1234-1234-1234-123456789ABC",
        "z2345678-1234-1234-1234-123456789abc",
        "12345678123412341234123456789abc", "",
    ],
    "ipv4": [
        "1.2.3.4", "255.255.255.255", "256.1.1.1", "01.2.3.4",
        "1.2.3", "1.2.3.4.5", "", "a.b.c.d",
    ],
    "ipv6": [
        "::", "::1", "1::", "2001:db8::1", "1:2:3:4:5:6:7:8",
        "1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7", "02001:db8::1",
        "1::2::3", "fe80::", "2001:db8::1%eth0", ":",
        "::ffff:1.2.3.4", "::ffff:01.2.3.4", "1:2:3:4:5:6:1.2.3.4",
        "1:2:3:4:5::1.2.3.4", "1::5:1.2.3.4", "::1.2.3.4",
        "1:2:3:4:5:6:7:1.2.3.4", "1.2.3.4", "abcd:ef01:2345:6789:abcd:ef01:2345:6789",
        "ABCD::EF01", "12345::1", "g::1", "1:2:3:4:5:6:256.1.1.1",
        "::ffff:1.2.3.4.5", "1:2:3:4:5:6:7:", ":2:3:4:5:6:7:8",
        "1:2:3:4:5:6::7:8", "::2:3:4:5:6:7:8",
    ],
    "json-pointer": [
        "", "/", "//", "/a/b", "/a~0b", "/a~1b", "/a~2b", "/a~",
        "a/b", "/~", "/a b", "/ünïcode",
    ],
    "relative-json-pointer": [
        "0", "5", "01/a", "1/a", "0#", "1#/a", "-1/a", "#", "0/",
        "2/a~1b", "10/x", "0x",
    ],
    "regex": ["^a+$", "[", "(?P<x>a)", "a{2,1}", "(", "a|b", "\\k<x>"],
    "idn-hostname": ["example.com", "ex..com", "-bad.com", "münchen.de",
                     "a" * 64 + ".com"],
}


def test_formats_match_jsonschema_checkers(spark):
    import jsonschema

    fc = jsonschema.FormatChecker()
    bad = []
    for fmt, values in BATTERY.items():
        assert fmt in fc.checkers, f"{fmt} not active in this install"
        df = spark.createDataFrame([(v,) for v in values], "v string")
        pred = row_checks._format_pred(fmt, F.col("v"))
        got = {r.v: bool(r.ok) for r in df.select("v", pred.alias("ok")).collect()}
        want = {v: fc.conforms(v, fmt) for v in values}
        for v in values:
            if got[v] != want[v]:
                bad.append((fmt, v, got[v], want[v]))
    assert not bad, f"{len(bad)} mismatches (fmt, value, engine, jsonschema): {bad[:10]}"


def test_ipv6_fuzz_vs_ipaddress(spark):
    """Seeded fuzz over colon/hex/dot soup — the regex must agree with
    ipaddress.IPv6Address acceptance everywhere."""
    import jsonschema

    fc = jsonschema.FormatChecker()
    rng = random.Random(20260817)
    alphabet = "0123456789abcdefABCDEF:.%"
    values = set()
    for _ in range(400):
        n = rng.randint(1, 40)
        values.add("".join(rng.choice(alphabet) for _ in range(n)))
    # mutations of valid addresses
    base = ["2001:db8::1", "1:2:3:4:5:6:7:8", "::ffff:1.2.3.4", "fe80::"]
    for b in base:
        for _ in range(50):
            s = list(b)
            op = rng.random()
            if op < 0.4 and s:
                s.insert(rng.randrange(len(s)), rng.choice(alphabet))
            elif op < 0.8 and len(s) > 1:
                del s[rng.randrange(len(s))]
            else:
                s[rng.randrange(len(s))] = rng.choice(alphabet)
            values.add("".join(s))
    values = sorted(values)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    pred = row_checks._format_pred("ipv6", F.col("v"))
    got = {r.v: bool(r.ok) for r in df.select("v", pred.alias("ok")).collect()}
    bad = [
        (v, got[v], fc.conforms(v, "ipv6"))
        for v in values
        if got[v] != fc.conforms(v, "ipv6")
    ]
    assert not bad, f"{len(bad)} ipv6 mismatches: {bad[:10]}"
