"""Uniqueness family (SURVEY.md §2.3 A1-A5): ``unique`` /
``primary_key`` dedup + ``index`` / PK key-dimension extraction.

The reference detects duplicates with an in-heap dict probe in input
order (unique_check.py:133-148) — the "survivor" is whichever file
os.listdir yielded first, i.e. nondeterministic.  We replace it with a
deterministic hash-partitioned dedup window:

    row_number() OVER (PARTITION BY key [, scope] ORDER BY row_id)

survivor = min(row_id); every rn > 1 row is a violation.  One shuffle
per distinct key-column-set; the canonical key column is shared with
the referential pass (same shuffle key) so a PK used as an FK target
costs its shuffle once.

Scale notes (100 TB): the window shuffle hash-partitions on the
canonical key — the natural layout.  A pathologically hot key (e.g.
billions of rows sharing one phash) lands in one partition; for
metrics-only paths use stats.salted_group_count instead.  For the
dedup window itself hot keys are bounded by writing
``F.min(row_id).over(partitionBy(key))`` which Spark evaluates without
a sort for min — we keep row_number as it also yields stable dup
ordinals, and AQE handles moderate skew.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import errors
from ..keys import key_columns, key_strings, members_fan_out
from ..spec import KeySpec, TableSpec


def keyed(
    df: DataFrame,
    spec: TableSpec,
    ks: KeySpec,
    scope_fallback: bool = False,
    surv: Optional[Column] = None,
) -> DataFrame:
    """Project (row_id, __key, __observed) for one key declaration.
    Rows whose key is NULL (missing-member exclusion, SURVEY.md §1.3
    item 5) are dropped.  Members with array steps / array columns FAN
    OUT: one output row per cartesian key combination (GenKeyStrings,
    index_check.py:262-293) — explode drops empty arrays, so a row
    with any zero-valued member contributes no key, same as the scalar
    path.  ``scope_fallback``: use row_id as the scope when the table
    declares no scope_col (dims for scoped keys).  ``surv``: carry the
    pass-1 predicate through as a ``__surv`` flag (registration-time
    dup semantics need every ROW's registrations but only SURVIVING
    rows as key holders)."""
    scope = spec.scope_col or (spec.row_id if scope_fallback else None)
    rid = F.col(spec.row_id).cast("string").alias("__row_id")
    sv = (
        [F.coalesce(surv, F.lit(False)).alias("__surv")]
        if surv is not None
        else []
    )
    if members_fan_out(ks.members, df, spec.canonical_json):
        karr, oarr = key_strings(
            ks.members,
            df,
            canonical=spec.canonical_json,
            limit_scope=ks.limit_scope,
            scope_col=scope if ks.limit_scope else None,
        )
        pairs = F.zip_with(
            karr, oarr, lambda k, o: F.struct(k.alias("k"), o.alias("o"))
        )
        return (
            df.select(rid, F.explode(pairs).alias("__p"), *sv)
            .select(
                "__row_id",
                F.col("__p.k").alias("__key"),
                F.col("__p.o").alias("__observed"),
                *(["__surv"] if sv else []),
            )
            # a NULL scope value NULLs the scoped key — exclude, like
            # the scalar path's missing-member semantics
            .where(F.col("__key").isNotNull())
        )
    key, obs = key_columns(
        ks.members, ks.limit_scope, scope, df=df, canonical=spec.canonical_json
    )
    return (
        df.select(
            rid,
            key.alias("__key"),
            obs.alias("__observed"),
            *sv,
        )
        .where(F.col("__key").isNotNull())
    )


def dup_violations(
    df: DataFrame,
    spec: TableSpec,
    ks: KeySpec,
    reason: str,
    cid_prefix: str,
    strategy: str = "window",
    surv: Optional[Column] = None,
) -> DataFrame:
    """Duplicate-key violations with the reference's EXACT
    registration-time semantics ([verified] probes, round 5): every
    key registration that finds its key already present errors —
    including registrations of rows that themselves FAIL pass 1 (the
    reference registers/errors first, forget() runs after the doc's
    own errors print) — while only SURVIVING rows HOLD keys (a failing
    row's registrations are forgotten before the next doc probes).
    Within one row, fan-out registrations after the first of the same
    key always error (self-dups persist even on revoked rows).

    Declaratively: registration R of row X is flagged iff
      (a) some SURVIVING row Y with Y.row_id < X.row_id holds R.key, or
      (b) an earlier registration of the SAME row carries R.key.
    ``surv`` = the pass-1 predicate over ``df`` (all rows); omitting it
    treats every row as surviving, which collapses to the classic
    min-row_id-survivor window.

    Known residue (documented, inherently sequential): the reference's
    forget() also DE-registers the OTHER keys of a row whose only
    error is a dup — chains of cross-key revocations are
    order-dependent row-at-a-time state this one-pass form does not
    model (same class as the guess-mode divergence in run_suite's
    docstring).

    strategy='window' (default): one shuffle + per-key sort
    (row_number/rank + a preceding-rows max — same single Exchange).
    strategy='agg': skew-proof two-level hash aggregation; identical
    output multiset (parity-tested), bounded partition state at ANY
    key skew.

    ``surv=None`` means the caller proved EVERY row survives pass 1
    (the table declares no row checks), so the holder logic collapses:
    flagged ⇔ any earlier registration exists ⇔ row_number() > 1 —
    one window function instead of three over the same sort (r08;
    equivalence: with all rows surviving, prev-surviving-registration
    and same-row-earlier-registration both reduce to "some earlier
    row in the frame").
    """
    cid = f"{cid_prefix}:{ks.label}"
    path = F.lit("/" + ",".join(ks.members)).alias("path")
    if surv is None and strategy == "window":
        k = keyed(df, spec, ks)
        w = Window.partitionBy("__key").orderBy("__row_id")
        return (
            k.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > 1)
            .select(
                F.lit(cid).alias("constraint_id"),
                F.lit(reason).alias("reason"),
                F.col("__row_id").alias("row_id"),
                F.col("__observed").alias("observed_value"),
                path,
            )
        )
    k = keyed(df, spec, ks, surv=surv if surv is not None else F.lit(True))

    if strategy == "agg":
        per_rid = k.groupBy("__key", "__row_id").agg(
            F.count(F.lit(1)).alias("__c"),
            F.first("__observed").alias("__observed"),
            F.max("__surv").alias("__rsurv"),
        )
        per_key = per_rid.groupBy("__key").agg(
            F.sum("__c").alias("__total"),
            F.min(F.when(F.col("__rsurv"), F.col("__row_id"))).alias(
                "__first_surv"
            ),
        )
        dup_keys = per_key.where(F.col("__total") > 1)
        blamed = (
            per_rid.join(dup_keys, "__key")
            .withColumn(
                "__n",
                # earlier survivor holds the key → ALL c registrations
                # error; else the row's own first registration is the
                # holder → c-1 self-dups
                F.when(
                    F.col("__first_surv").isNotNull()
                    & (F.col("__first_surv") < F.col("__row_id")),
                    F.col("__c"),
                ).otherwise(F.col("__c") - 1),
            )
            .where(F.col("__n") > 0)
        )
        return blamed.select(
            F.lit(cid).alias("constraint_id"),
            F.lit(reason).alias("reason"),
            F.col("__row_id").alias("row_id"),
            F.col("__observed").alias("observed_value"),
            path,
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__i"),
        ).drop("__i")

    w = Window.partitionBy("__key").orderBy("__row_id")
    w_prec = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_surv = F.max(
        F.when(F.col("__surv"), F.lit(1)).otherwise(F.lit(0))
    ).over(w_prec)
    # row_number - rank > 0 ⇔ an earlier registration of the SAME row
    # (row_id ties) precedes this one in the frame
    flagged = (F.coalesce(prev_surv, F.lit(0)) == 1) | (
        F.row_number().over(w) > F.rank().over(w)
    )
    return (
        k.withColumn("__flag", flagged)
        .where(F.col("__flag"))
        .select(
            F.lit(cid).alias("constraint_id"),
            F.lit(reason).alias("reason"),
            F.col("__row_id").alias("row_id"),
            F.col("__observed").alias("observed_value"),
            path,
        )
    )


def key_dimension(df: DataFrame, spec: TableSpec, ks: KeySpec) -> DataFrame:
    """The key world as a dimension DataFrame ``(__key)`` — distinct
    canonical keys — the join target for the referential pass
    (reference holds these as IndexDef.values dicts,
    index_check.py:42-53; here they are just DataFrames).

    For an ``index`` declaration duplicates are allowed and no
    violations are emitted (index_check.py:295-370) — distinct() is
    all there is.

    ``limit_scope`` IS part of the stored key: the reference registers
    scoped key strings at index time (index_check.py:346-349 prepends
    the current file) and the FK probe prepends the probing document's
    file when the RESOLVED target key is scoped (fk_check.py:405-411
    ``obtainedValues = ([fkVals.where], *obtainedValues)``), so a
    cross-file FK to a scoped key is stale there — and here.  The
    fact-side twin is referential.fk_tuples(scoped=True).  When the
    table has no scope_col, row_id stands in for the reference's
    per-document file name."""
    return (
        keyed(df, spec, ks, scope_fallback=True)
        .select("__key")
        .where(F.col("__key").isNotNull())
        .distinct()
    )
