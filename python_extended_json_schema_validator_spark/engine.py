"""ValidationEngine — compiles a set of TableSpecs into DataFrame
plans and evaluates them over a dict of tables.

Pipeline (the Spark-first reshaping of the reference's two-pass loop,
extensible_validator.py:841-1397):

  pass 0 (driver, compile time)
      spec parsing + cross-spec validation (fk_no_schema etc.) —
      ⇔ reference schema load / meta-schema validation / bootstrap.
  pass 1 (one fused projection per table)
      row-level check battery → row violations + a ``pass1_ok``
      predicate.  Rows failing pass 1 are excluded from all key
      aggregation — the declarative form of the reference's forget()
      revocation (A6, verified fk_simple_example/bad_validation_2).
  key worlds (one shuffle per key-column-set)
      unique/pk dedup windows → dup_unique/dup_pk violations;
      pk/index key dimensions (+ provider unions) persisted for reuse.
  pass 2 (anti-joins)
      FK/JK tuples LEFT ANTI JOIN dimensions → stale_*/dangling_*.

Everything is lazy: ``validate`` returns a ValidationResult holding
unevaluated DataFrames; no Spark job runs until the caller acts.

Scale design: dims are DISTINCT canonical keys (small relative to
facts) so AQE converts the anti-joins to broadcast automatically; the
same canonical key column feeds both the dedup window and the FK join,
so a PK that is also an FK target is shuffled once per stage not per
constraint; provider dims are explicitly broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Dict, List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import errors
from .checks import referential, row_checks, uniqueness
from .providers import InlineProvider, TableProvider
from .spec import TableSpec, validate_spec_set


@dataclass
class EngineConfig:
    # providers are literal/small → force broadcast on their joins.
    # Deliberately NO dim-persist option: PK dims can be as large as
    # the table (distinct image_ids at 10^12 rows) — caching them is a
    # scale hazard; Catalyst reuses the scan and AQE broadcasts small
    # dims at runtime, which is the right default.
    broadcast_provider_dims: bool = True
    # 'window' (per-key sort; simple) or 'agg' (skew-proof two-level
    # hash aggregation — identical outputs, bounded partition state at
    # any key skew; see uniqueness.dup_violations)
    dedup_strategy: str = "window"


@dataclass
class ValidationResult:
    """Lazy bundle of validation outputs."""

    tables: Dict[str, DataFrame]
    specs: Dict[str, TableSpec]
    row_viol: Dict[str, DataFrame]
    key_viol: Dict[str, DataFrame]
    ref_viol: Dict[str, DataFrame]
    pass1_ok_col: Dict[str, object]  # table -> Column

    @property
    def violations(self) -> DataFrame:
        """All violations across tables, one DataFrame."""
        frames = (
            list(self.row_viol.values())
            + list(self.key_viol.values())
            + list(self.ref_viol.values())
        )
        return reduce(lambda a, b: a.unionByName(b), frames)

    def violations_for(self, table: str) -> DataFrame:
        frames = [
            d
            for d in (
                self.row_viol.get(table),
                self.key_viol.get(table),
                self.ref_viol.get(table),
            )
            if d is not None
        ]
        return reduce(lambda a, b: a.unionByName(b), frames)

    def verdicts(self, table: str) -> DataFrame:
        """(row_id, ok) per row — ok ⇔ the row appears in no violation
        (⇔ the reference's per-document error list being empty)."""
        spec = self.specs[table]
        df = self.tables[table]
        bad = self.violations_for(table).select("row_id").distinct()
        ids = df.select(F.col(spec.row_id).cast("string").alias("row_id"))
        return ids.join(bad.withColumn("__bad", F.lit(True)), "row_id", "left").select(
            "row_id", F.coalesce(~F.col("__bad"), F.lit(True)).alias("ok")
        )

    def partition_verdicts(self, table: str) -> DataFrame:
        """Per-partition pass/fail + counts (the north star's
        per-partition verdict): requires the table spec to declare
        scope_col as the partition column."""
        spec = self.specs[table]
        if not spec.scope_col:
            raise ValueError(f"{table} has no scope_col / partition column")
        df = self.tables[table]
        v = self.verdicts(table)
        ids = df.select(
            F.col(spec.row_id).cast("string").alias("row_id"),
            F.col(spec.scope_col).alias("partition"),
        )
        return (
            ids.join(v, "row_id")
            .groupBy("partition")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("n_failed"),
            )
            .withColumn("pass", F.col("n_failed") == 0)
        )


class ValidationEngine:
    def __init__(
        self,
        specs: Sequence[TableSpec],
        providers: Sequence[Union[InlineProvider, TableProvider]] = (),
        config: Optional[EngineConfig] = None,
    ):
        validate_spec_set(specs)
        self.specs: Dict[str, TableSpec] = {s.name: s for s in specs}
        self.providers = list(providers)
        self.config = config or EngineConfig()

    # -- compile helpers ---------------------------------------------------

    def _provider_dims(self, spark: SparkSession, table: str, key_name):
        """Provider dims feeding (table, named-or-any PK)."""
        out = []
        for p in self.providers:
            if p.table != table:
                continue
            if p.refers_to is not None and key_name is not None and p.refers_to != key_name:
                continue
            out.append(p.dimension(spark))
        return out

    def _provider_shadow(self, spark: SparkSession, table: str):
        """Dims of providers with allow_duplicates=False — these DO
        participate in duplicate detection (pk_check.py:216-240)."""
        return [
            p.dimension(spark)
            for p in self.providers
            if p.table == table and not p.allow_duplicates
        ]

    # -- main --------------------------------------------------------------

    def validate(self, tables: Dict[str, DataFrame]) -> ValidationResult:
        spark = next(iter(tables.values())).sparkSession if tables else None

        row_viol: Dict[str, DataFrame] = {}
        key_viol: Dict[str, DataFrame] = {}
        ref_viol: Dict[str, DataFrame] = {}
        survivors: Dict[str, DataFrame] = {}
        pass1_cols: Dict[str, object] = {}

        # ---- pass 1: row checks + survivor frames
        for name, df in tables.items():
            spec = self.specs.get(name)
            if spec is None:
                continue
            compiled = row_checks.compile_battery(spec.checks)
            ok = row_checks.pass1_ok(compiled)
            pass1_cols[name] = ok
            row_viol[name] = row_checks.row_violations(
                df, F.col(spec.row_id), compiled
            )
            survivors[name] = df.where(ok) if compiled else df

        # ---- key worlds: dup violations + dimensions
        # named_dims[(table, name)] / any_pk_dims[table] / any_idx_dims[table]
        named_dims: Dict[tuple, DataFrame] = {}
        any_pk_dims: Dict[str, List[DataFrame]] = {}
        any_idx_dims: Dict[str, List[DataFrame]] = {}

        for name, df in survivors.items():
            spec = self.specs[name]
            kv: List[DataFrame] = []
            for ks in spec.unique:
                kv.append(
                    uniqueness.dup_violations(
                        df, spec, ks, errors.DUP_UNIQUE, "unique",
                        strategy=self.config.dedup_strategy,
                    )
                )
            shadow = self._provider_shadow(spark, name)
            for ks in spec.primary_keys:
                kv.append(
                    uniqueness.dup_violations(
                        df, spec, ks, errors.DUP_PK, "pk",
                        strategy=self.config.dedup_strategy,
                    )
                )
                # non-shadow provider keys count as pre-recorded → any
                # surviving row matching one is a duplicate
                for pdim in shadow:
                    keyed = uniqueness.keyed(df, spec, ks)
                    kv.append(
                        keyed.join(F.broadcast(pdim), "__key", "left_semi").select(
                            F.lit(f"pk:{ks.label}").alias("constraint_id"),
                            F.lit(errors.DUP_PK).alias("reason"),
                            F.col("__row_id").alias("row_id"),
                            F.col("__observed").alias("observed_value"),
                            F.lit("/" + ",".join(ks.members)).alias("path"),
                        )
                    )
                dim = uniqueness.key_dimension(df, spec, ks)
                pdims = self._provider_dims(spark, name, ks.name)
                dim = referential.union_dims([dim, *pdims])
                if ks.name is not None:
                    named_dims[(name, ks.name)] = dim
                any_pk_dims.setdefault(name, []).append(dim)
            for ks in spec.indexes:
                # index: duplicates allowed, no violations (A3)
                dim = uniqueness.key_dimension(df, spec, ks)
                if ks.name is not None:
                    named_dims[(name, ks.name)] = dim
                any_idx_dims.setdefault(name, []).append(dim)
            if kv:
                key_viol[name] = reduce(lambda a, b: a.unionByName(b), kv)

        # tables declared with PKs/providers but not provided as data
        # still expose provider-fed dims (fk_with_inline: dim table has
        # NO rows at all, keys come purely from the provider)
        for spec in self.specs.values():
            if spec.name in survivors:
                continue
            for ks in spec.primary_keys:
                pdims = self._provider_dims(spark, spec.name, ks.name)
                if pdims:
                    dim = referential.union_dims(pdims)
                    if ks.name is not None:
                        named_dims[(spec.name, ks.name)] = dim
                    any_pk_dims.setdefault(spec.name, []).append(dim)

        # ---- pass 2: referential anti-joins
        for name, df in survivors.items():
            spec = self.specs[name]
            rv: List[DataFrame] = []
            for kind, fks in (("fk", spec.foreign_keys), ("jk", spec.join_keys)):
                for fk in fks:
                    dim = self._resolve_dim(
                        fk, kind, named_dims, any_pk_dims, any_idx_dims
                    )
                    is_provider_only = fk.ref_table not in survivors
                    rv.append(
                        referential.referential_violations(
                            df,
                            spec,
                            fk,
                            dim,
                            kind=kind,
                            broadcast_dim=(
                                self.config.broadcast_provider_dims
                                and is_provider_only
                                and dim is not None
                            ),
                        )
                    )
            if rv:
                ref_viol[name] = reduce(lambda a, b: a.unionByName(b), rv)

        return ValidationResult(
            tables=dict(tables),
            specs=self.specs,
            row_viol=row_viol,
            key_viol=key_viol,
            ref_viol=ref_viol,
            pass1_ok_col=pass1_cols,
        )

    def _resolve_dim(self, fk, kind, named_dims, any_pk_dims, any_idx_dims):
        """Dimension selection (J2/J3 world lookup):

        - refers_to → the named dim; if the name was never recorded the
          dim is an *empty-but-present* world only when the target
          declares it; a totally unknown name → None is wrong (the
          reference emits per-row stale "key not found", J4) → we
          return an empty dim so the anti-join emits stale for all.
        - unnamed FK → union of ALL the target's PK dims; unnamed JK →
          union of ALL the target's index dims (join_check.py binds
          IndexKey).  No worlds at all → None → dangling.
        """
        if fk.refers_to is not None:
            dim = named_dims.get((fk.ref_table, fk.refers_to))
            if dim is not None:
                return dim
            # named key not recorded anywhere → empty world → all stale
            spark = SparkSession.getActiveSession()
            return spark.createDataFrame([], "__key string")
        pool = any_pk_dims if kind == "fk" else any_idx_dims
        dims = pool.get(fk.ref_table, [])
        if not dims:
            return None
        return referential.union_dims(dims)
