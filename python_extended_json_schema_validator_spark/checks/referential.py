"""Referential family (SURVEY.md §2.4 J1-J6): ``foreign_keys`` /
``join_keys`` as LEFT ANTI joins against key-dimension DataFrames.

The reference probes each FK tuple against in-heap PK/index dicts in a
second pass (fk_check.py:285-482).  Here:

- J1 (FK gather) is a lazy projection of ``(canonical key, row_id,
  observed)`` from the *surviving* fact rows — no shuffle until the
  join executes.
- J2/J3 (membership) is ``fk LEFT ANTI JOIN dim ON key`` — Catalyst +
  AQE pick broadcast-hash when the dim is small (the common case: a
  dim is DISTINCT keys) and sort-merge otherwise.  Callers can force
  broadcast for provider dims known to be tiny.
- J4 (refers_to names a key with no recorded values): the anti-join
  against an empty dim yields every FK row → stale_* "key not found",
  no special case needed.
- J5 (referenced table has no keys at all): reason flips to
  dangling_*.  Emptiness is decided inside the same plan via a
  1-row count subframe cross-joined in (no driver-side .count() job).
- Unnamed FKs match ANY recorded PK world of the target
  (fk_check.py:399,429-434) → the dim is the UNION of all the
  target's PK dims; join_keys target index worlds instead
  (join_check.py:20-51 binds joinClass=IndexKey).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import errors
from ..keys import key_columns
from ..spec import ForeignKeySpec, TableSpec


def fk_tuples(df: DataFrame, spec: TableSpec, fk: ForeignKeySpec) -> DataFrame:
    """J1: project (row_id, __key, __observed) for one FK declaration,
    excluding rows with any NULL member (missing-member exclusion —
    the reference records no FKVals for them, fk_check.py:411-424)."""
    key, obs = key_columns(fk.members, limit_scope=False, scope_col=None, df=df)
    return (
        df.select(
            F.col(spec.row_id).cast("string").alias("__row_id"),
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
) -> DataFrame:
    """Violations for one FK/JK declaration.

    dim: the unioned key dimension ``(__key)``.  ``None`` means the
    target has no key worlds at all — statically decidable (the target
    table declares no PK/index and no provider feeds it), which is
    exactly the reference's dangling condition (fk_check.py:453-476:
    the referenced schema URI absent from the PK contexts).  A dim
    that exists but is runtime-empty (declared keys, zero surviving
    rows) yields stale_* for every FK row via the anti-join — matching
    J4 "key not found" (fk_check.py:349-389) with no special case.
    kind: 'fk' → stale_fk/dangling_fk, 'jk' → stale_jk/dangling_jk.
    """
    # Reference quirk, [verified] by differential test: join-key misses
    # report reason "stale_fk", NOT "stale_jk" — fk_check.py:378,440
    # hardcode the string instead of using self._errorReason, so
    # JoinKey's declared stale_jk (join_check.py:22) is never emitted.
    # Only the dangling reason respects the subclass (fk_check.py:469).
    stale = errors.STALE_FK
    dangling = errors.DANGLING_FK if kind == "fk" else errors.DANGLING_JK
    cid = f"{kind}:{fact_spec.name}.{fk.label}"
    fkt = fk_tuples(fact_df, fact_spec, fk)
    path = F.lit("/" + ",".join(fk.members)).alias("path")

    if dim is None:
        return fkt.select(
            F.lit(cid).alias("constraint_id"),
            F.lit(dangling).alias("reason"),
            F.col("__row_id").alias("row_id"),
            F.col("__observed").alias("observed_value"),
            path,
        )

    if broadcast_dim:
        dim = F.broadcast(dim)

    return fkt.join(dim, on="__key", how="left_anti").select(
        F.lit(cid).alias("constraint_id"),
        F.lit(stale).alias("reason"),
        F.col("__row_id").alias("row_id"),
        F.col("__observed").alias("observed_value"),
        path,
    )
