"""Referential family (SURVEY.md §2.4 J1-J6): ``foreign_keys`` /
``join_keys`` as joins against key-dimension DataFrames.

The reference probes each FK tuple against in-heap PK/index dicts in a
second pass (fk_check.py:285-482).  Here:

- J1 (FK gather) is a lazy projection of ``(canonical key, row_id,
  observed)`` from the *surviving* fact rows — no shuffle until the
  join executes.
- J2/J3 (membership) is a LEFT join against the DISTINCT-key dim plus
  a miss filter — Catalyst + AQE pick broadcast-hash when the dim is
  small (the common case) and sort-merge otherwise.  Callers can force
  broadcast for provider dims known to be tiny.
- J4 (refers_to names a key with no recorded values): the probe
  against an empty dim misses every FK row → stale_* "key not found".
- J5 (dangling) is decided at RUNTIME, like the reference: a schema
  URI enters the probe-able contexts only when at least one of its key
  worlds has ``len(values) > 0`` (fk_check.py:305-317).  So a target
  whose declared keys recorded ZERO values (empty table, or every row
  revoked by pass 1) yields dangling_*, not stale_*.  The emptiness
  test is a 1-row ``limit(1)``-count flag frame over the UNION of all
  the target's key worlds, broadcast-cross-joined into the same plan —
  no driver-side .count() job.  Only a target with no key declarations
  and no providers at all is statically dangling (dim short-circuit).
- ``limit_scope``: when the RESOLVED target key is scoped, the probe
  tuple is prefixed with the FK document's own scope (fk_check.py:
  405-411 prepends fkVals.where) and the stored dim keys carry the
  target document's scope (index_check.py:346-349) — see
  uniqueness.key_dimension.  Cross-scope FKs are therefore stale.
- Unnamed FKs match ANY recorded PK world of the target
  (fk_check.py:399,429-434) → the dim is the UNION of all the
  target's PK dims; join_keys target index worlds instead
  (join_check.py:20-51 binds joinClass=IndexKey).  Named worlds are
  confined per join class too: an FK ``refers_to`` resolves among the
  target's PRIMARY KEYS only, a JK's among its INDEXES only
  (fk_check.py:296-327 filters contexts on ``className ==
  self.joinClass.__name__`` before by_name registration).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import errors
from ..keys import key_columns, key_strings, members_fan_out
from ..spec import ForeignKeySpec, TableSpec


def fk_tuples(
    df: DataFrame,
    spec: TableSpec,
    fk: ForeignKeySpec,
    scoped: bool = False,
) -> DataFrame:
    """J1: project (row_id, __key, __observed) for one FK declaration,
    excluding rows with any NULL member (missing-member exclusion —
    the reference records no FKVals for them, fk_check.py:411-424).
    Array-step members FAN OUT to one probe per cartesian combination
    (every combination is checked, fk_check.py:425-449).

    ``scoped``: the RESOLVED target key has limit_scope, so the probe
    key is prefixed with this row's scope value (⇔ fkVals.where,
    fk_check.py:405-411).  Falls back to row_id when the fact table
    declares no scope_col (each row ⇔ its own source file)."""
    scope = spec.scope_col or spec.row_id
    rid = F.col(spec.row_id).cast("string").alias("__row_id")
    if members_fan_out(fk.members, df, spec.canonical_json):
        karr, oarr = key_strings(
            fk.members,
            df,
            canonical=spec.canonical_json,
            limit_scope=scoped,
            scope_col=scope if scoped else None,
        )
        pairs = F.zip_with(
            karr, oarr, lambda k, o: F.struct(k.alias("k"), o.alias("o"))
        )
        return (
            df.select(rid, F.explode(pairs).alias("__p"))
            .select(
                "__row_id",
                F.col("__p.k").alias("__key"),
                F.col("__p.o").alias("__observed"),
            )
            .where(F.col("__key").isNotNull())
        )
    key, obs = key_columns(
        fk.members,
        limit_scope=scoped,
        scope_col=scope if scoped else None,
        df=df,
        canonical=spec.canonical_json,
    )
    return (
        df.select(
            rid,
            key.alias("__key"),
            obs.alias("__observed"),
        )
        .where(F.col("__key").isNotNull())
    )


def union_dims(dims: List[DataFrame]) -> Optional[DataFrame]:
    if not dims:
        return None
    out = dims[0]
    for d in dims[1:]:
        out = out.unionByName(d)
    return out.distinct() if len(dims) > 1 else out


def referential_violations(
    fact_df: DataFrame,
    fact_spec: TableSpec,
    fk: ForeignKeySpec,
    dim: Optional[DataFrame],
    kind: str = "fk",
    broadcast_dim: bool = False,
    probe_scoped: bool = False,
    pool_dim: Optional[DataFrame] = None,
) -> DataFrame:
    """Violations for one FK/JK declaration.

    dim: the key dimension ``(__key)`` the probe joins against (named
    world for refers_to, union of the class's worlds otherwise).
    pool_dim: any frame that is non-empty IFF the target's key worlds
    of this join class recorded at least one value — its runtime
    emptiness decides stale vs dangling (see module docstring J5).
    Callers should pass the cheapest such frame: the UNION of RAW
    (pre-distinct) keyed projections + provider dims, so the
    ``limit(1)`` flag scan stops at the first surviving key row
    without paying the dim's distinct exchange.  ``dim is None and
    pool_dim is None`` means the target declares no keys of this class
    and no provider feeds it — statically dangling, no flag frame.
    kind: 'fk' → stale_fk/dangling_fk, 'jk' → stale_fk/dangling_jk.
    """
    # Reference quirk, [verified] by differential test: join-key misses
    # report reason "stale_fk", NOT "stale_jk" — fk_check.py:378,440
    # hardcode the string instead of using self._errorReason, so
    # JoinKey's declared stale_jk (join_check.py:22) is never emitted.
    # Only the dangling reason respects the subclass (fk_check.py:469).
    stale = errors.STALE_FK
    dangling = errors.DANGLING_FK if kind == "fk" else errors.DANGLING_JK
    cid = f"{kind}:{fact_spec.name}.{fk.label}"
    fkt = fk_tuples(fact_df, fact_spec, fk, scoped=probe_scoped)
    path = F.lit("/" + ",".join(fk.members)).alias("path")

    out_cols = lambda reason_col: [  # noqa: E731
        F.lit(cid).alias("constraint_id"),
        reason_col.alias("reason"),
        F.col("__row_id").alias("row_id"),
        F.col("__observed").alias("observed_value"),
        path,
    ]

    if dim is None and pool_dim is None:
        return fkt.select(*out_cols(F.lit(dangling)))

    if pool_dim is None:
        pool_dim = dim
    # 1-row emptiness flag; limit(1) short-circuits the scan (and with
    # a raw pre-distinct pool frame, skips the dim exchange entirely).
    flag = (
        pool_dim.select(F.lit(1).alias("__one"))
        .limit(1)
        .agg(F.count(F.lit(1)).alias("__c"))
        .select((F.col("__c") > 0).alias("__has_keys"))
    )

    if dim is None:
        # refers_to named a key the target never declared: probe an
        # empty world (all rows miss) while the pool flag still decides
        # stale vs dangling
        dim = fkt.sparkSession.createDataFrame([], "__key string")
    else:
        dim = dim.select("__key")
    if broadcast_dim:
        dim = F.broadcast(dim)

    # When the pool is runtime-empty the dim is empty too (every world
    # of the class is), so the anti-join returns ALL fk rows — exactly
    # the set the reference flags dangling.  The conditional reason is
    # therefore the ONLY extra work vs the plain stale anti-join; the
    # join stays LEFT ANTI (broadcastable, no retained match columns).
    misses = fkt.join(dim, on="__key", how="left_anti")
    return misses.crossJoin(F.broadcast(flag)).select(
        *out_cols(F.when(F.col("__has_keys"), F.lit(stale)).otherwise(F.lit(dangling)))
    )
