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
    # 'window' (DEFAULT — one shuffle + per-key sort; the north star
    # prescribes "hash-partitioned dedup windows") or 'agg' (two-level
    # hash aggregation: bounded partition state at ANY key skew, but
    # TWO full-width shuffles + a join).  Identical output multisets —
    # parity-tested in tests/test_dedup_strategies.py.
    #
    # MEASURED (tools/skew_bench.py, local[8]): window wins even at
    # pathological skew within sort capacity — 5M rows / 20% hot key:
    # window 3.8 s vs agg 8.5 s; 40M rows / 50% hot key (20M-row hot
    # partition): window 63 s vs agg 100 s.  Switch to 'agg' only when
    # one key's rows exceed a single task's sort budget (≈ hot-key
    # rows × key width ≫ executor memory — at 10^12 rows with a
    # handful of phash values, that's when 'window' would OOM/spill
    # while 'agg' keeps hash-agg state bounded).
    dedup_strategy: str = "window"
    # ------------------------------------------------------------------
    # forget_mode POLICY (the one canonical statement — every other
    # surface refers here).  Semantics ([verified] round-5 reference
    # probes, extensible_validator.py:1200-1203): a doc whose ONLY
    # error is a duplicate key is forget()-ten too, de-registering its
    # OTHER keys — which can re-enable later docs' registrations, a
    # sequential cascade.  Two implementations:
    # - 'sequential': reference-EXACT clean-set fixpoint
    #   (_sequential_clean): iterate holders ↔ dups to convergence,
    #   O(cascade depth) narrow (row_id,key) joins + one
    #   localCheckpoint per keyed table.  Parity: 5 cascade
    #   differentials vs the actual reference
    #   (tests/test_library_fallback.py::
    #    test_sequential_forget_matches_reference).
    # - 'oneshot': holders = rows passing the ROW checks; dup errors
    #   do not revoke a row's other keys.  ONE window pass, no driver
    #   fixpoint — exact whenever no row both duplicates one key and
    #   holds another (the overwhelmingly common shape).
    # DEFAULTS, by surface:
    #   * reference-parity surfaces — run_suite / validate_json_table
    #     / the CLI (suite.py:438,787) — default to 'sequential':
    #     a reference user who switches must see identical reports
    #     out of the box, same rationale as library_fallback=True.
    #   * the engine API (this class) defaults to 'oneshot': it is
    #     the 10^12-row table surface, where per-table driver
    #     fixpoints + eager localCheckpoints are a real cost and
    #     cascades require a same-row dup-plus-held-key collision to
    #     matter.  This is the ONE pinned, intentional divergence —
    #     tests/test_library_fallback.py::
    #     test_oneshot_vs_sequential_divergence_documented fails if
    #     either default or either semantics drifts silently.
    # ------------------------------------------------------------------
    forget_mode: str = "oneshot"
    # iteration cap for the sequential fixpoint (strict raise beyond —
    # unconverged holder sets must never be mistaken for results)
    forget_max_iter: int = 25


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
            # a provider targeting one NAMED key feeds neither other
            # named keys nor unnamed ones
            if p.refers_to is not None and p.refers_to != key_name:
                continue
            out.append(p.dimension(spark))
        return out

    def _provider_shadow(self, spark: SparkSession, table: str, key_name):
        """Dims of providers with allow_duplicates=False — these DO
        participate in duplicate detection (pk_check.py:216-240).
        Filtered by refers_to exactly like _provider_dims: a provider
        targeting one named PK must not flag collisions on an
        unrelated PK of the same table."""
        out = []
        for p in self.providers:
            if p.table != table or p.allow_duplicates:
                continue
            if p.refers_to is not None and p.refers_to != key_name:
                continue
            out.append(p.dimension(spark))
        return out

    def _sequential_clean(
        self, spark: SparkSession, name: str, df: DataFrame,
        spec: TableSpec, struct_ok,
    ) -> Optional[DataFrame]:
        """The reference's CLEAN SET C* under sequential
        register-then-forget semantics ([verified] round-5 probes):
        X ∈ C* ⟺ X passes the row checks, has no self-duplicate
        registration, matches no shadow-provider key, and no EARLIER
        C* member holds any of X's unique/PK keys.  Self-referential
        through the order — computed by fixpoint iteration: starting
        from all struct-ok rows, each round recomputes dups against
        the current set; the iterates alternate over/under
        approximations of C* (more holders → more dups → fewer
        members → fewer holders ...), so equality of consecutive
        iterates IS convergence, reached in O(cascade depth) rounds.

        Scale shape: every frame is (row_id[, spec ordinal, key])
        strings — one groupBy + one join per round, localCheckpoint
        keeps lineage flat, convergence is two limit(1) anti-join
        probes.  Cascades are register-order chains across DISTINCT
        keys; like near-dup clusters they are shallow in practice.

        Returns the C* row_id frame (column ``__row_id``), or None
        when the table declares no unique/PK keys (no dup revocation
        possible — C* = struct-ok rows)."""
        from pyspark.sql import functions as F

        keyspecs = list(spec.unique) + list(spec.primary_keys)
        if not keyspecs:
            return None
        regs = None
        for i, ks in enumerate(keyspecs):
            k = uniqueness.keyed(df, spec, ks).select(
                F.lit(i).alias("__spec"), "__key", "__row_id"
            )
            regs = k if regs is None else regs.unionByName(k)
        regs = regs.localCheckpoint()

        S = (
            df.where(struct_ok)
            .select(F.col(spec.row_id).cast("string").alias("__row_id"))
            .distinct()
        )
        # a self-duplicate registration errors unconditionally → the
        # row is forgotten (probe F: revoked self-dups still error)
        selfdup = (
            regs.groupBy("__spec", "__key", "__row_id")
            .count()
            .where(F.col("count") > 1)
            .select("__row_id")
            .distinct()
        )
        S = S.join(selfdup, "__row_id", "left_anti")
        # shadow-provider keys are pre-registered before any doc: any
        # match errors → forgotten
        shadow_ids = None
        for ks in spec.primary_keys:
            for pdim in self._provider_shadow(spark, name, ks.name):
                hit = (
                    uniqueness.keyed(df, spec, ks)
                    .join(F.broadcast(pdim), "__key", "left_semi")
                    .select("__row_id")
                )
                shadow_ids = (
                    hit if shadow_ids is None
                    else shadow_ids.unionByName(hit)
                )
        if shadow_ids is not None:
            S = S.join(shadow_ids.distinct(), "__row_id", "left_anti")
        S = S.localCheckpoint()

        C = S
        for _ in range(self.config.forget_max_iter):
            first = (
                regs.join(C, "__row_id", "left_semi")
                .groupBy("__spec", "__key")
                .agg(F.min("__row_id").alias("__first"))
            )
            dup_ids = (
                regs.join(first, ["__spec", "__key"])
                .where(F.col("__first") < F.col("__row_id"))
                .select("__row_id")
                .distinct()
            )
            C2 = S.join(dup_ids, "__row_id", "left_anti").localCheckpoint()
            moved = (
                C2.join(C, "__row_id", "left_anti").limit(1).count()
                + C.join(C2, "__row_id", "left_anti").limit(1).count()
            )
            C = C2
            if moved == 0:
                return C
        raise RuntimeError(
            f"sequential forget fixpoint did not converge within "
            f"forget_max_iter={self.config.forget_max_iter} rounds for "
            f"table {name!r} (pathologically deep dup cascade); raise "
            f"the cap or use forget_mode='oneshot'."
        )

    # -- main --------------------------------------------------------------

    def validate(
        self,
        tables: Dict[str, DataFrame],
        row_overrides: Optional[Dict[str, object]] = None,
    ) -> ValidationResult:
        """``row_overrides``: {table: library-errors Column} — the
        library-fallback escape hatch (library_fallback.py).  For those
        tables the ROW battery is replaced by the jsonschema verdict
        (reasons, paths, revocation all from the library); key worlds
        and referential passes stay compiled and declarative.  Tables
        absent from the dict never touch Python."""
        spark = (
            next(iter(tables.values())).sparkSession
            if tables
            else SparkSession.getActiveSession()
        )

        row_viol: Dict[str, DataFrame] = {}
        key_viol: Dict[str, DataFrame] = {}
        ref_viol: Dict[str, DataFrame] = {}
        survivors: Dict[str, DataFrame] = {}
        pass1_cols: Dict[str, object] = {}
        # tables whose battery is EMPTY: pass 1 is vacuously true, so
        # dup detection can take the single-window fast path (r08 —
        # uniqueness.dup_violations surv=None)
        trivial_ok: Dict[str, bool] = {}

        # ---- pass 1: row checks + survivor frames
        for name, df in tables.items():
            spec = self.specs.get(name)
            if spec is None:
                continue
            ov_errs = (row_overrides or {}).get(name)
            if ov_errs is not None:
                from . import library_fallback as LF

                ok = LF.library_pass1_ok(ov_errs)
                pass1_cols[name] = ok
                trivial_ok[name] = False
                row_viol[name] = LF.library_row_violations(
                    df, F.col(spec.row_id), ov_errs
                )
                survivors[name] = df.where(ok)
                continue
            compiled = row_checks.compile_battery(
                spec.checks, json_mode=spec.canonical_json,
                formats=spec.custom_formats,
            )
            ok = row_checks.pass1_ok(compiled)
            pass1_cols[name] = ok
            trivial_ok[name] = not compiled
            row_viol[name] = row_checks.row_violations(
                df, F.col(spec.row_id), compiled
            )
            survivors[name] = df.where(ok) if compiled else df

        # ---- key worlds: dup violations + dimensions
        # Worlds are confined per join class, like the reference
        # (fk_check.py:296-327 filters contexts on joinClass before
        # by_name registration): FKs resolve among the target's PRIMARY
        # KEYS ("pk"), JKs among its INDEXES ("idx").
        # named_dims[(table, kclass, name)] → dim DataFrame
        # named_keys[(table, kclass, name)] → KeySpec (limit_scope)
        # any_dims[(table, kclass)] → list of dims
        # pool_scope[(table, kclass)] → limit_scope of the class's
        #   FIRST declared key (⇔ PKKeys.limit_scope, set from the
        #   first pkDef with values, fk_check.py:309-317 — declaration
        #   order stands in for the reference's dict order).
        named_dims: Dict[tuple, DataFrame] = {}
        named_keys: Dict[tuple, object] = {}
        any_dims: Dict[tuple, List[DataFrame]] = {}
        # cheap runtime-emptiness probes: RAW (pre-distinct) keyed
        # projections / provider dims — non-empty iff the class's pool
        # recorded any value; referential's limit(1) flag scans these
        # without paying the dim's distinct exchange
        any_probe: Dict[tuple, List[DataFrame]] = {}
        pool_scope: Dict[tuple, bool] = {}

        def _register(table, kclass, ks, dim, probe):
            if ks.name is not None:
                named_dims[(table, kclass, ks.name)] = dim
                named_keys[(table, kclass, ks.name)] = ks
            any_dims.setdefault((table, kclass), []).append(dim)
            any_probe.setdefault((table, kclass), []).append(probe)
            pool_scope.setdefault((table, kclass), ks.limit_scope)

        for name, df in survivors.items():
            spec = self.specs[name]
            # registration-time dup semantics ([verified] round-5
            # probes): EVERY row's registrations are reporters (a row
            # failing pass 1 still errors against present keys — the
            # reference's forget() runs only after its errors print),
            # while only CLEAN rows hold keys — so dup detection scans
            # the FULL table with the holder predicate as a flag.
            # forget_mode decides the holder set: 'oneshot' = rows
            # passing the row checks; 'sequential' = the reference-
            # exact clean-set fixpoint C* (dup errors revoke a row's
            # OTHER keys too, cascading — see _sequential_clean)
            full = tables[name]
            ok_col = pass1_cols[name]
            if self.config.forget_mode == "sequential":
                cstar = self._sequential_clean(
                    spark, name, full, spec, ok_col
                )
                if cstar is not None:
                    memb = cstar.select(
                        F.col("__row_id").alias("__cstar_id"),
                        F.lit(True).alias("__cstar"),
                    )
                    full = full.join(
                        memb,
                        full[spec.row_id].cast("string")
                        == memb["__cstar_id"],
                        "left",
                    ).drop("__cstar_id")
                    ok_col = F.coalesce(F.col("__cstar"), F.lit(False))
                    # dims, FK gather and pass-2 all read the CLEAN
                    # rows — forgotten rows contribute nothing
                    df = full.where(ok_col).drop("__cstar")
                    survivors[name] = df
            # empty battery + oneshot mode ⇒ every row provably
            # survives ⇒ the single-window dup fast path is exact
            # (sequential mode's dup revocation changes holders even
            # with no row checks, so it keeps the full holder logic)
            surv_arg = (
                None
                if trivial_ok.get(name)
                and self.config.forget_mode != "sequential"
                else ok_col
            )
            kv: List[DataFrame] = []
            for ks in spec.unique:
                kv.append(
                    uniqueness.dup_violations(
                        full, spec, ks, errors.DUP_UNIQUE, "unique",
                        strategy=self.config.dedup_strategy, surv=surv_arg,
                    )
                )
            for ks in spec.primary_keys:
                kv.append(
                    uniqueness.dup_violations(
                        full, spec, ks, errors.DUP_PK, "pk",
                        strategy=self.config.dedup_strategy, surv=surv_arg,
                    )
                )
                # non-shadow provider keys count as pre-recorded → any
                # row's registration matching one is a duplicate
                # (provider keys are never forgotten, so revoked rows
                # report too — same registration-time rule)
                shadow_dims = self._provider_shadow(spark, name, ks.name)
                keyed = (
                    uniqueness.keyed(full, spec, ks) if shadow_dims else None
                )
                for pdim in shadow_dims:
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
                raw = uniqueness.keyed(df, spec, ks, scope_fallback=True).select(
                    "__key"
                )
                pdims = self._provider_dims(spark, name, ks.name)
                dim = referential.union_dims([dim, *pdims])
                probe = raw
                for pdim in pdims:
                    probe = probe.unionByName(pdim)
                _register(name, "pk", ks, dim, probe)
            for ks in spec.indexes:
                # index: duplicates allowed, no violations (A3)
                dim = uniqueness.key_dimension(df, spec, ks)
                raw = uniqueness.keyed(df, spec, ks, scope_fallback=True).select(
                    "__key"
                )
                _register(name, "idx", ks, dim, raw)
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
                    _register(spec.name, "pk", ks, dim, dim)

        # ---- pass 2: referential joins
        for name, df in survivors.items():
            spec = self.specs[name]
            rv: List[DataFrame] = []
            for kind, fks in (("fk", spec.foreign_keys), ("jk", spec.join_keys)):
                for fk in fks:
                    dim, pool_dim, scoped = self._resolve_dim(
                        fk, kind, named_dims, named_keys, any_dims, any_probe,
                        pool_scope,
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
                            probe_scoped=scoped,
                            pool_dim=pool_dim,
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

    def _resolve_dim(self, fk, kind, named_dims, named_keys, any_dims,
                     any_probe, pool_scope):
        """Dimension selection (J2/J3 world lookup) →
        ``(dim, pool_dim, probe_scoped)``:

        - refers_to → the named dim of the matching join class; an
          unknown/undeclared name probes an *empty* world (per-row
          stale "key not found", fk_check.py:349-389) while the class
          pool still decides stale vs dangling at runtime.
        - unnamed FK → union of ALL the target's PK dims; unnamed JK →
          union of ALL its index dims (join_check.py binds IndexKey).
        - probe_scoped = the RESOLVED key's limit_scope (named:
          uDef.limit_scope, fk_check.py:390-398; unnamed: the pool's
          first key, :309-317).
        - (None, None, False) → no worlds declared/fed at all →
          statically dangling.
        """
        kclass = "pk" if kind == "fk" else "idx"
        probes = any_probe.get((fk.ref_table, kclass), [])
        pool_dim = None
        if probes:
            pool_dim = probes[0]
            for p in probes[1:]:
                pool_dim = pool_dim.unionByName(p)
        if fk.refers_to is not None:
            dim = named_dims.get((fk.ref_table, kclass, fk.refers_to))
            if dim is not None:
                ks = named_keys[(fk.ref_table, kclass, fk.refers_to)]
                return dim, pool_dim, ks.limit_scope
            # named key not recorded anywhere → dim=None with a
            # non-None pool probes an empty world → stale for all
            # (unless the whole pool is runtime-empty too → dangling)
            return None, pool_dim, False
        dim = referential.union_dims(any_dims.get((fk.ref_table, kclass), []))
        return dim, pool_dim, pool_scope.get((fk.ref_table, kclass), False)
