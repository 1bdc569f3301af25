"""Key providers (SURVEY.md §2.1 S7/S8): externally-supplied PK values
that pre-populate a dimension before validation.

The reference supports an inline YAML provider
(pk_check.py:148-155, consumed :206-300) and a remote HTTP provider
(pk_check.py:157-204).  Spark-first translation: a provider is just
another small dimension DataFrame unioned into the FK-join dimension —
inline lists become broadcast literal frames; remote providers become
``spark.read`` of an external table (never per-executor HTTP).

``allow_provider_duplicates`` (pk_check.py:216-240): when True the
provider keys live in a *shadow world* — only the FK pass sees them,
so a document repeating a provider key is NOT a duplicate.  When
False, provider keys are real recorded keys: any surviving row whose
key matches a provider key is a ``dup_pk`` (the provider is "first").
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def canonical_key_py(values) -> str:
    """Driver-side twin of keys.canonical_key for literal provider
    values — the same semantics as the reference's GenKeyStrings
    (index_check.py:262-293): a single atomic value is its JSON scalar
    literal; a tuple is the compact JSON array.  ensure_ascii=False so
    provider keys byte-match Spark's raw-UTF-8 literals (keys must
    join across provider dims, typed tables, and shredded tables)."""
    if isinstance(values, (list, tuple)):
        if len(values) == 1:
            values = values[0]
        else:
            return json.dumps(list(values), sort_keys=True,
                              separators=(",", ":"), ensure_ascii=False)
    return json.dumps(values, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


@dataclass
class InlineProvider:
    """Literal key values feeding one table's PK dimension
    (⇔ ``primary_key.inline_provider[schemaURI]`` in the reference's
    YAML config, example test-data/fk_with_inline/ejv_inline.yaml)."""

    table: str
    keys: List = field(default_factory=list)
    refers_to: Optional[str] = None  # feed only this named PK (None = all)
    allow_duplicates: bool = True  # ⇔ allow_provider_duplicates

    def dimension(self, spark: SparkSession) -> DataFrame:
        from .keys import canon_literal_norm

        canon = sorted({canonical_key_py(k) for k in self.keys})
        df = spark.createDataFrame([(k,) for k in canon], "__key string")
        # float keys re-render through the engine's canonical double
        # expression so provider dims byte-join typed-column keys
        # (keys.canon_literal_norm; ints/strings pass through)
        return df.select(canon_literal_norm(F.col("__key")).alias("__key"))


def fetch_remote_provider(
    table: str,
    url_bases,
    accept: str,
    refers_to: Optional[str] = None,
    allow_duplicates: bool = True,
    opener=None,
) -> InlineProvider:
    """Drop-in for the reference's REMOTE key provider config
    (pk_check.py:157-204): for each base URL, GET
    ``urljoin(base, <last path segment of the schema URI> + "/")``
    with the given Accept header and parse the body as a
    newline-separated key list (blank lines dropped); failures are
    logged-and-skipped like the reference.  The (small) fetched list
    becomes an InlineProvider — the driver does ONE HTTP GET, never
    the executors.

    ``opener``: injectable ``url -> (status, text)`` for tests; the
    default uses urllib with the Accept header.
    """
    import logging
    from urllib.parse import urljoin, urlparse
    from urllib.request import Request, urlopen

    log = logging.getLogger(__name__)

    def _default_opener(url: str):
        req = Request(url, headers={"Accept": accept})
        with urlopen(req) as f:  # pragma: no cover - network path
            return f.getcode(), str(f.read(), "utf-8")

    opener = opener or _default_opener
    if isinstance(url_bases, str):
        url_bases = [url_bases]
    keys: List = []
    rel = urlparse(table).path.split("/")[-1]
    for base in url_bases:
        url = urljoin(base, rel + "/")
        try:
            code, body = opener(url)
        except Exception as e:
            log.error("Unable to fetch remote keys from %s: %s", url, e)
            continue
        if code != 200:
            log.error("Unable to fetch remote keys from %s [%s]", url, code)
            continue
        keys.extend(line for line in body.split("\n") if line != "")
    return InlineProvider(
        table=table, keys=keys, refers_to=refers_to,
        allow_duplicates=allow_duplicates,
    )


def cached_opener(cache_dir: str, base_opener, read_only: bool = False):
    """Disk cache around a provider ``url -> (status, text)`` opener
    (⇔ the reference's extension cache controlled by --cache-dir /
    --read-only, abstract_check.py:118-160): responses persist as
    ``<cache_dir>/<sha1(url)>.json`` so repeated validation runs skip
    the network.  Only 200s are cached (failures retry next run);
    ``read_only`` uses existing entries but never writes."""
    import hashlib
    import json as _json
    import os

    if not read_only:
        os.makedirs(cache_dir, exist_ok=True)

    def opener(url: str):
        path = os.path.join(
            cache_dir, hashlib.sha1(url.encode()).hexdigest() + ".json"
        )
        if os.path.exists(path):
            with open(path) as fh:
                hit = _json.load(fh)
            return hit["status"], hit["text"]
        code, body = base_opener(url)
        if code == 200 and not read_only:
            with open(path, "w") as fh:
                _json.dump({"url": url, "status": code, "text": body}, fh)
        return code, body

    return opener


def invalidate_cache(cache_dir: str) -> int:
    """⇔ --invalidate: drop every cached provider response; returns
    the number of entries removed."""
    import glob
    import os

    n = 0
    for f in glob.glob(os.path.join(cache_dir, "*.json")):
        os.unlink(f)
        n += 1
    return n


@dataclass
class TableProvider:
    """External dimension table provider (⇔ the remote HTTP provider,
    pk_check.py:157-204 — but loaded as a distributed read, not a
    driver GET).  ``df`` must contain the key member columns; the
    engine canonicalizes them with the same key algebra as data
    rows."""

    table: str
    df: DataFrame = None
    members: Sequence[str] = ()
    refers_to: Optional[str] = None
    allow_duplicates: bool = True

    def dimension(self, spark: SparkSession) -> DataFrame:
        from .keys import key_columns
        from pyspark.sql import functions as F

        key, _ = key_columns(list(self.members), df=self.df)
        return (
            self.df.select(key.alias("__key"))
            .where(F.col("__key").isNotNull())
            .distinct()
        )
