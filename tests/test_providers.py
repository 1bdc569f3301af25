"""Provider-populated dimensions (FIXTURES.md F8 ⇔ reference
test-data fk_with_inline; pk_check.py:148-155,206-300)."""

from python_extended_json_schema_validator_spark import (
    ForeignKeySpec,
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from python_extended_json_schema_validator_spark.providers import (
    InlineProvider,
    TableProvider,
    canonical_key_py,
)
from tests.conftest import viol_set


def specs():
    dim = TableSpec(name="dim8", row_id="row_id", primary_keys=[KeySpec(("a", "b"))])
    fact = TableSpec(
        name="fact8",
        row_id="row_id",
        foreign_keys=[ForeignKeySpec(("ra", "rb"), ref_table="dim8")],
    )
    return dim, fact


def test_f8_inline_provider_no_dim_rows(spark):
    """dim table has NO rows at all; keys come purely from the inline
    provider (fk_with_inline)."""
    dim, fact = specs()
    prov = InlineProvider(
        table="dim8",
        keys=[("uno", "diez"), ("dos", "veinte"), ("tres", "treinta")],
    )
    fdf = spark.createDataFrame(
        [("f1", "uno", "diez"), ("f2", "dos", "20")],
        "row_id string, ra string, rb string",
    )
    res = ValidationEngine([dim, fact], providers=[prov]).validate({"fact8": fdf})
    assert viol_set(res.violations) == {
        ("fk:fact8.ra,rb->dim8", "stale_fk", "f2", '["dos","20"]')
    }


def test_f8_provider_unions_with_observed_keys(spark):
    dim, fact = specs()
    prov = InlineProvider(table="dim8", keys=[("uno", "diez")])
    ddf = spark.createDataFrame(
        [("d1", "dos", "veinte")], "row_id string, a string, b string"
    )
    fdf = spark.createDataFrame(
        [("f1", "uno", "diez"), ("f2", "dos", "veinte"), ("f3", "x", "y")],
        "row_id string, ra string, rb string",
    )
    res = ValidationEngine([dim, fact], providers=[prov]).validate(
        {"dim8": ddf, "fact8": fdf}
    )
    assert viol_set(res.violations) == {
        ("fk:fact8.ra,rb->dim8", "stale_fk", "f3", '["x","y"]')
    }


def test_allow_provider_duplicates_shadow_world(spark):
    """allow_duplicates=True (default): a row repeating a provider key
    is NOT a duplicate — the provider world is a shadow only the FK
    pass sees (pk_check.py:216-240)."""
    dim, fact = specs()
    prov = InlineProvider(table="dim8", keys=[("uno", "diez")], allow_duplicates=True)
    ddf = spark.createDataFrame(
        [("d1", "uno", "diez")], "row_id string, a string, b string"
    )
    res = ValidationEngine([dim, fact], providers=[prov]).validate({"dim8": ddf})
    assert viol_set(res.violations) == set()


def test_disallow_provider_duplicates(spark):
    dim, fact = specs()
    prov = InlineProvider(table="dim8", keys=[("uno", "diez")], allow_duplicates=False)
    ddf = spark.createDataFrame(
        [("d1", "uno", "diez"), ("d2", "dos", "veinte")],
        "row_id string, a string, b string",
    )
    res = ValidationEngine([dim, fact], providers=[prov]).validate({"dim8": ddf})
    assert viol_set(res.violations) == {
        ("pk:a,b", "dup_pk", "d1", '["uno","diez"]')
    }


def test_table_provider(spark):
    """External dimension table (⇔ remote HTTP provider, loaded as a
    distributed read instead of a driver GET)."""
    dim, fact = specs()
    ext = spark.createDataFrame(
        [("uno", "diez")], "ka string, kb string"
    )
    prov = TableProvider(table="dim8", df=ext, members=("ka", "kb"))
    fdf = spark.createDataFrame(
        [("f1", "uno", "diez"), ("f2", "no", "pe")],
        "row_id string, ra string, rb string",
    )
    res = ValidationEngine([dim, fact], providers=[prov]).validate({"fact8": fdf})
    assert viol_set(res.violations) == {
        ("fk:fact8.ra,rb->dim8", "stale_fk", "f2", '["no","pe"]')
    }


def test_canonical_key_py():
    assert canonical_key_py(("uno", "diez")) == '["uno","diez"]'
    assert canonical_key_py("uno") == '"uno"'
    assert canonical_key_py(2) == "2"
    assert canonical_key_py(("solo",)) == '"solo"'


def test_fetch_remote_provider_protocol(spark):
    """Remote provider drop-in (pk_check.py:157-204): GET
    urljoin(base, last-path-segment + '/') with the Accept header,
    newline-split key list, blank lines dropped, failed bases skipped."""
    from python_extended_json_schema_validator_spark.providers import (
        fetch_remote_provider,
    )

    seen = []

    def opener(url):
        seen.append(url)
        if "bad" in url:
            raise OSError("connection refused")
        return 200, "uno\ndos\n\ntres\n"

    prov = fetch_remote_provider(
        "http://example.org/schemas/sample/1.0",
        ["http://keys-bad.example/", "http://keys.example/v1/"],
        accept="text/plain",
        allow_duplicates=False,
        opener=opener,
    )
    assert seen == [
        "http://keys-bad.example/1.0/",
        "http://keys.example/v1/1.0/",
    ]
    assert prov.keys == ["uno", "dos", "tres"]
    assert not prov.allow_duplicates
    dim = {r["__key"] for r in prov.dimension(spark).collect()}
    assert dim == {'"uno"', '"dos"', '"tres"'}


def test_remote_provider_via_suite_config(spark):
    """The reference's remote-provider YAML grammar drives run_suite:
    fetched keys feed the FK dimension of a documentless dim schema."""
    from python_extended_json_schema_validator_spark.suite import (
        providers_from_config,
    )

    cfg = {
        "primary_key": {
            "accept": "text/plain",
            "provider": "http://keys.example/base/",
            "schema_prefix": "remote://fact/1.0",
        }
    }

    def opener(url):
        assert url == "http://keys.example/base/1.0/"
        return 200, "uno\ndos\n"

    provs = providers_from_config(
        cfg, schema_uris=["remote://dim/1.0", "remote://fact/1.0"], opener=opener
    )
    assert len(provs) == 1 and provs[0].table == "remote://dim/1.0"
    assert provs[0].keys == ["uno", "dos"]


def test_provider_cache_dir(tmp_path):
    """--cache-dir semantics: 200-responses persist across runs,
    --invalidate drops them, --read-only never writes."""
    from python_extended_json_schema_validator_spark.providers import (
        invalidate_cache,
    )
    from python_extended_json_schema_validator_spark.suite import (
        providers_from_config,
    )

    calls = []

    def opener(url):
        calls.append(url)
        return 200, "k1\nk2\n"

    cfg = {"primary_key": {"accept": "text/plain",
                           "provider": "http://cache.test/base/"}}
    uris = ["x://dim/1.0"]
    cache = str(tmp_path / "c")

    p1 = providers_from_config(cfg, uris, opener=opener, cache_dir=cache)
    assert len(p1) == 1 and p1[0].keys == ["k1", "k2"]
    assert len(calls) == 1

    p2 = providers_from_config(cfg, uris, opener=opener, cache_dir=cache)
    assert len(calls) == 1, "second run must hit the disk cache"
    assert p2[0].keys == p1[0].keys

    assert invalidate_cache(cache) == 1
    providers_from_config(cfg, uris, opener=opener, cache_dir=cache)
    assert len(calls) == 2, "invalidate forces a refetch"

    ro = str(tmp_path / "ro")
    providers_from_config(cfg, uris, opener=opener, cache_dir=ro,
                          cache_read_only=True)
    providers_from_config(cfg, uris, opener=opener, cache_dir=ro,
                          cache_read_only=True)
    assert len(calls) == 4, "read-only never populates the cache"
    import os
    assert not os.path.exists(ro)


def test_remote_provider_loopback_http(spark):
    """The provider_remote contract query end-to-end: a REAL urllib
    GET against a loopback http.server — Accept header enforced
    (406 otherwise), newline split with blank-drop, and a 500ing
    first base skipped per reference semantics (pk_check.py:157-204).
    The driver's oracle gate re-proves values; this pins the plumbing
    in CI."""
    import __spark_entry__ as entry

    df = entry.q_provider_remote(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    # sf0.001 nation: 25 rows over regions 0-4; provider serves R0-R2
    assert len(rows) == 10
    assert {r.reason for r in rows} == {"stale_fk"}
    assert {r.observed_value for r in rows} == {"R3", "R4"}
