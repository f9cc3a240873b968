"""MERGE INTO — clause builder + two-job execution.

Mirrors the reference's merge operation (reference:
crates/core/src/operations/merge/mod.rs — full outer join :1022, ordered
WHEN clauses compiled to a CASE action column :1214-1216,1287-1402;
python surface python/deltalake/table.py:1403-1851) with delta-spark's
two-job physical shape, which is the scalable strategy on Spark:

* job A (insert path): source LEFT ANTI join target-candidates on the
  join predicate -> ordered not-matched clause predicates -> insert rows.
* job B (rewrite path): target rows from *rewrite files only* LEFT OUTER
  join source -> ordered CASE over matched / not-matched-by-source
  clauses -> copy/update/delete per row.

Rewrite files are chosen like the reference's early filter + MergeBarrier
(merge/filter.rs, merge/barrier.rs): source min/max over equi-join keys
prune target files by stats/partitions; files with zero matched rows are
never rewritten. When not-matched-by-source clauses exist every file is
a rewrite file (those clauses touch unmatched target rows anywhere).

Duplicate-match validation (merge/validation.rs): if any target row
matches more than one source row while matched update/delete clauses
exist, the merge errors out.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from delta_rs_spark.log import commit as commit_mod
from delta_rs_spark.log import snapshot as snap_mod
from delta_rs_spark.log.actions import Add, CommitInfo, Remove, now_ms
from delta_rs_spark.log.commit import DeltaError, TransactionInfo
from delta_rs_spark.operators.cdc import (
    CHANGE_TYPE_COL,
    can_fuse_cdc_write,
    cdf_enabled,
    write_change_data,
    write_data_and_change_files,
)
from delta_rs_spark.operators.util import match_touched_files
from delta_rs_spark.plans.skipping import col_types_from_schema_json, prune_files

_ACTION = "__delta_rs_action"
_TMARK = "__delta_rs_t"
_SMARK = "__delta_rs_s"
_TID = "__delta_rs_tid"
_CLS = "__delta_rs_match_cls"

COPY, DELETE = -1, -2
# duplicate-match participation classes (reference merge/mod.rs:561)
_CLS_IGNORE, _CLS_NOOP, _CLS_UNCOND_DELETE, _CLS_ACTION = 0, 1, 2, 3


class MergeError(DeltaError):
    pass


def _sql_literal(v: Any) -> str:
    """A collected Python value as a SQL literal the early-filter
    language (plans.skipping parse path and Spark SQL) both read."""
    import datetime as _dt

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    return str(v)


def _recompute_generated(df: DataFrame, schema, cols: list[str], coded_clauses) -> DataFrame:
    """Recompute generated columns on rows an update clause touched,
    unless that clause assigned the column explicitly — evaluated over the
    post-update projection so generation expressions see new values
    (reference: write/generated_columns.rs applied to merge)."""
    from delta_rs_spark.writer import GENERATION_KEY

    out = []
    changed = False
    for c in cols:
        gen_expr = (schema[c].metadata or {}).get(GENERATION_KEY)
        if not gen_expr:
            out.append(F.col(c))
            continue
        recompute_codes = [
            code
            for code, cl in coded_clauses
            if cl.kind == "update" and c not in (cl.updates or {})
        ]
        if not recompute_codes:
            out.append(F.col(c))
            continue
        changed = True
        out.append(
            F.when(F.col(_ACTION).isin(recompute_codes), F.expr(gen_expr))
            .otherwise(F.col(c))
            .cast(schema[c].dataType)
            .alias(c)
        )
    if not changed:
        return df
    extras = [
        F.col(f"`{c}`") for c in df.columns if c not in cols and c != _ACTION
    ]  # e.g. row tracking's materialized columns — pass through
    return df.select(*out, *extras, F.col(_ACTION))


@dataclass
class _Clause:
    kind: str  # update | delete | insert
    predicate: str | None
    updates: dict[str, str] | None  # None => *_all


@dataclass
class TableMerger:
    """Fluent MERGE builder (reference: python/deltalake/table.py:1403+)."""

    dt: Any
    source: Any
    predicate: str
    source_alias: str | None = None
    target_alias: str | None = None
    merge_schema: bool = False  # schema evolution (reference: merge/mod.rs:1047-1080)
    commit_properties: Any = None  # CommitProperties (reference table.py merge args)
    post_commithook_properties: Any = None
    # error_on_type_mismatch=False (reference merge arg): assignment
    # results that cannot cast to the target type become NULL for
    # NULLABLE columns instead of erroring (safe cast — reference
    # python/tests/test_merge.py test_merge_safe_cast_*); non-nullable
    # targets still fail loudly (strict ANSI cast here, the reference's
    # 'Invalid data found' check there).
    safe_cast: bool = False
    matched: list[_Clause] = field(default_factory=list)
    not_matched: list[_Clause] = field(default_factory=list)
    not_matched_by_source: list[_Clause] = field(default_factory=list)

    def _out_cast(self, expr, target_field):
        """Assignment result -> target column type. Safe mode + nullable
        target: failed casts become NULL (try_cast); everything else is
        the strict ANSI cast that errors on malformed values."""
        if self.safe_cast and target_field.nullable:
            return expr.try_cast(target_field.dataType)
        return expr.cast(target_field.dataType)

    # -- clause builders --------------------------------------------------
    def when_matched_update(self, updates: dict[str, str], predicate: str | None = None):
        self.matched.append(_Clause("update", predicate, dict(updates)))
        return self

    def when_matched_update_all(self, predicate: str | None = None, except_cols: list[str] | None = None):
        self.matched.append(_Clause("update", predicate, None))
        self._matched_except = except_cols or []
        return self

    def when_matched_delete(self, predicate: str | None = None):
        self.matched.append(_Clause("delete", predicate, {}))
        return self

    def when_not_matched_insert(self, updates: dict[str, str], predicate: str | None = None):
        self.not_matched.append(_Clause("insert", predicate, dict(updates)))
        return self

    def when_not_matched_insert_all(self, predicate: str | None = None, except_cols: list[str] | None = None):
        self.not_matched.append(_Clause("insert", predicate, None))
        self._insert_except = except_cols or []
        return self

    def when_not_matched_by_source_update(self, updates: dict[str, str], predicate: str | None = None):
        self.not_matched_by_source.append(_Clause("update", predicate, dict(updates)))
        return self

    def when_not_matched_by_source_delete(self, predicate: str | None = None):
        self.not_matched_by_source.append(_Clause("delete", predicate, {}))
        return self

    # -- execution --------------------------------------------------------
    def _aliases(self) -> tuple[str, str]:
        return self.target_alias or "target", self.source_alias or "source"

    def _auto_updates(self, clause: _Clause, cols: list[str], src_cols: set[str], except_cols: list[str]) -> dict[str, str]:
        """Expand *_all into explicit per-column assignments."""
        _t, s = self._aliases()
        out = {}
        for c in cols:
            if c in except_cols:
                continue
            if c in src_cols:
                out[c] = f"{s}.`{c}`"
        return out

    def _equi_join_pairs(self) -> list[tuple[str, str]]:
        """(target_col, source_col) pairs from the join predicate's
        top-level equality conjuncts, extracted from the Catalyst
        expression AST (reference: merge/filter.rs rewrites the expression
        tree the same way).

        The predicate is parsed with the session's SQL parser, the
        top-level ``And`` chain is flattened, and a conjunct binds a
        (target_col, source_col, nullsafe) triple only when it is
        ``EqualTo`` / ``EqualNullSafe`` between two 2-part attributes
        qualified by the two aliases (either order; backquotes,
        whitespace, and odd casing are the parser's problem, not ours).
        Anything else — function-wrapped columns, arithmetic, OR/NOT
        *inside* a conjunct — contributes nothing but, per AND
        semantics, cannot invalidate pairs bound by sibling conjuncts. A predicate whose root is OR yields no conjuncts and
        therefore no early filter. Falls back to conservative regex
        matching when the JVM parser is unreachable."""
        try:
            root = (
                self.dt.spark._jsparkSession.sessionState()
                .sqlParser()
                .parseExpression(self.predicate)
            )
        except Exception:
            return self._equi_join_pairs_regex()
        t, s = self._aliases()

        def flatten_and(e):
            if e.getClass().getSimpleName() == "And":
                yield from flatten_and(e.left())
                yield from flatten_and(e.right())
            else:
                yield e

        def attr(e) -> tuple[str, str] | None:
            if e.getClass().getSimpleName() != "UnresolvedAttribute":
                return None
            parts = e.nameParts()
            if parts.size() != 2:
                return None
            return str(parts.apply(0)).lower(), str(parts.apply(1))

        pairs = []
        for conj in flatten_and(root):
            cls = conj.getClass().getSimpleName()
            if cls not in ("EqualTo", "EqualNullSafe"):
                continue
            # EqualNullSafe pairs prune too, but only when the collected
            # source values contain no NULL (a null key matches null
            # partitions/stats that IN/BETWEEN would wrongly skip) — the
            # strip phase checks that with the same aggregation
            nullsafe = cls == "EqualNullSafe"
            a, b = attr(conj.left()), attr(conj.right())
            if a is None or b is None:
                continue
            if a[0] == t.lower() and b[0] == s.lower():
                pairs.append((a[1], b[1], nullsafe))
            elif a[0] == s.lower() and b[0] == t.lower():
                pairs.append((b[1], a[1], nullsafe))
        return pairs

    _STATIC_CMP = {
        "EqualTo": "=",
        "LessThan": "<",
        "LessThanOrEqual": "<=",
        "GreaterThan": ">",
        "GreaterThanOrEqual": ">=",
    }

    def _static_target_conjuncts(self) -> list[str]:
        """Target-only static conjuncts of the join predicate — e.g.
        ``target.cat = 'b'`` in ``t.cat = 'b' AND t.id = s.id`` — kept in
        the early filter so a partition-scoped merge prunes by them
        (reference merge/filter.rs generalize_filter's NoReference case:
        conjuncts without a source reference pass through verbatim).
        Same binding-conjunct rule as _equi_join_pairs: only members of
        the flattened top-level And chain qualify; the whitelist (cmp /
        IN / IS [NOT] NULL between a target-qualified attribute and
        literals) is exactly the language plans.skipping prunes on."""
        try:
            root = (
                self.dt.spark._jsparkSession.sessionState()
                .sqlParser()
                .parseExpression(self.predicate)
            )
        except Exception:
            return []
        t, _s = self._aliases()

        def flatten_and(e):
            if e.getClass().getSimpleName() == "And":
                yield from flatten_and(e.left())
                yield from flatten_and(e.right())
            else:
                yield e

        def tcol(e) -> str | None:
            if e.getClass().getSimpleName() != "UnresolvedAttribute":
                return None
            parts = e.nameParts()
            if parts.size() != 2 or str(parts.apply(0)).lower() != t.lower():
                return None
            return str(parts.apply(1))

        def lit_sql(e) -> str | None:
            return e.sql() if e.getClass().getSimpleName() == "Literal" else None

        out: list[str] = []
        for conj in flatten_and(root):
            cls = conj.getClass().getSimpleName()
            if cls in self._STATIC_CMP:
                op = self._STATIC_CMP[cls]
                c, lit = tcol(conj.left()), lit_sql(conj.right())
                if c is not None and lit is not None:
                    out.append(f"{c} {op} {lit}")
                    continue
                c, lit = tcol(conj.right()), lit_sql(conj.left())
                if c is not None and lit is not None:
                    out.append(f"{lit} {op} {c}")
            elif cls == "In":
                c = tcol(conj.value())
                if c is None:
                    continue
                lits = [lit_sql(conj.list().apply(i)) for i in range(conj.list().size())]
                if all(x is not None for x in lits):
                    out.append(f"{c} IN ({', '.join(lits)})")
            elif cls in ("IsNull", "IsNotNull"):
                c = tcol(conj.child())
                if c is not None:
                    out.append(
                        f"{c} IS NULL" if cls == "IsNull" else f"{c} IS NOT NULL"
                    )
        return out

    def _equi_join_pairs_regex(self) -> list[tuple[str, str]]:
        """Regex fallback (pre-AST formulation): whole-conjunct
        ``t.col = s.col`` matching, disabled entirely under top-level
        OR/NOT since textual splitting cannot prove precedence."""
        from delta_rs_spark.plans.skipping import _has_top_level_or_not, split_conjuncts

        if _has_top_level_or_not(self.predicate):
            return []
        t, s = self._aliases()
        col = r"`?([\w]+)`?"
        pat_ts = re.compile(
            rf"^\s*{re.escape(t)}\.{col}\s*(<=>|==|=)\s*{re.escape(s)}\.{col}\s*$"
        )
        pat_st = re.compile(
            rf"^\s*{re.escape(s)}\.{col}\s*(<=>|==|=)\s*{re.escape(t)}\.{col}\s*$"
        )
        pairs = []
        for conj in split_conjuncts(self.predicate):
            m = pat_ts.match(conj)
            if m:
                pairs.append((m.group(1), m.group(3), m.group(2) == "<=>"))
                continue
            m = pat_st.match(conj)
            if m:
                pairs.append((m.group(3), m.group(1), m.group(2) == "<=>"))
        return pairs

    # distinct source partition combinations above this count fall back
    # to min/max BETWEEN (bounds the driver collect and the predicate
    # string; the reference expands uncapped — filter.rs:353-368)
    _PARTITION_IN_CAP = 1024
    # interval-union refinement (r11): histogram buckets per stats-pair
    # column, max emitted arms, occupancy fraction above which the
    # union is no tighter than the plain BETWEEN, and the candidate
    # file count below which the extra source pass isn't worth a job
    _UNION_BUCKETS = 64
    _UNION_MAX_ARMS = 16
    _UNION_MAX_COVER = 0.75
    _UNION_MIN_FILES = 8

    def _strip_target_only_predicate(
        self, source_df: DataFrame, part_cols: list[str]
    ) -> str | None:
        """Early-filter construction (reference: merge/filter.rs
        try_construct_early_filter + generalize_filter): for equi-join
        conjuncts ``target.col = source.col``,

        - PARTITION target columns get an ``IN (...)`` conjunct over the
          source's DISTINCT values (filter.rs:324-368 — "conjunction
          between the distinct partitions"): sparse, non-contiguous
          source keys then prune whole partitions a min/max BETWEEN
          would over-include;
        - non-partition columns get min/max BETWEEN on the file stats.

        Both come from ONE grouped aggregation over the source (group by
        the partition-pair columns, min/max the stats-pair columns);
        above _PARTITION_IN_CAP distinct combinations everything falls
        back to one global min/max pass. Source NULL keys never
        equi-match, so dropping them from the lists is exact — EXCEPT
        for ``<=>`` (EqualNullSafe) pairs, where a NULL key matches NULL
        partitions/stats: those pairs prune only when the source side
        provably has no NULLs (checked in the same aggregation), else
        the conjunct is skipped. Only safe when the predicate is a pure
        conjunction — an OR/NOT branch would make the extracted pairs
        non-binding and over-prune (skip entirely then)."""
        static = self._static_target_conjuncts()
        pairs = self._equi_join_pairs()
        # stats bounds stash: the interval-union refinement (second
        # prune stage in execute()) reuses this invocation's min/max
        # aggregates instead of re-running them as a fresh job
        self._stats_bounds: dict[str, tuple[str, bool, Any, Any, int]] = {}
        # source row count, stashed when an aggregation here makes a
        # complete pass anyway (metrics-only; None = caller counts)
        self._n_source: int | None = None
        if not pairs:
            # static-only filter (reference filter.rs: "return our filter
            # with static only predicates")
            return " AND ".join(static) if static else None
        part_set = set(part_cols)
        part_pairs = [p for p in pairs if p[0] in part_set]
        stats_pairs = [p for p in pairs if p[0] not in part_set]

        def _between(tc: str, mns: list, mxs: list, n_null: int, ns: bool) -> str | None:
            if not mns or not mxs or (ns and n_null):
                return None
            return (
                f"{tc} >= {_sql_literal(min(mns))}"
                f" AND {tc} <= {_sql_literal(max(mxs))}"
            )

        if part_pairs:
            cap = self._PARTITION_IN_CAP
            keys = [
                F.col(sc).alias(f"p{i}")
                for i, (_tc, sc, _ns) in enumerate(part_pairs)
            ]
            aggs = [F.count(F.lit(1)).alias("__cnt")]
            for i, (_tc, sc, ns) in enumerate(stats_pairs):
                aggs.append(F.min(sc).alias(f"mn{i}"))
                aggs.append(F.max(sc).alias(f"mx{i}"))
                aggs.append(
                    F.sum(F.col(sc).isNull().cast("long")).alias(f"nn{i}")
                )
            grouped = source_df.groupBy(*keys).agg(*aggs)
            rows = grouped.limit(cap + 1).collect()
            if rows and len(rows) <= cap:
                # the group set is complete, so the per-group counts sum
                # to the source row count — no separate count job
                self._n_source = sum(int(r["__cnt"]) for r in rows)
                conj = list(static)
                for i, (tc, _sc, ns) in enumerate(part_pairs):
                    raw = {r[f"p{i}"] for r in rows}
                    if ns and None in raw:
                        continue  # null key matches null partitions: no prune
                    vals = raw - {None}
                    if vals:
                        try:
                            ordered = sorted(vals)
                        except TypeError:
                            ordered = sorted(vals, key=repr)
                        lits = ", ".join(_sql_literal(v) for v in ordered)
                        conj.append(f"{tc} IN ({lits})")
                for i, (tc, sc, ns) in enumerate(stats_pairs):
                    # the group set is complete (<= cap), so min/max over
                    # the per-group aggregates equals the global bounds
                    mns = [r[f"mn{i}"] for r in rows if r[f"mn{i}"] is not None]
                    mxs = [r[f"mx{i}"] for r in rows if r[f"mx{i}"] is not None]
                    n_null = sum(int(r[f"nn{i}"] or 0) for r in rows)
                    self._stats_bounds[tc] = (
                        sc,
                        ns,
                        min(mns) if mns else None,
                        max(mxs) if mxs else None,
                        n_null,
                    )
                    b = _between(tc, mns, mxs, n_null, ns)
                    if b:
                        conj.append(b)
                return " AND ".join(conj) if conj else None
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        for i, (_tc, sc, ns) in enumerate(pairs):
            aggs.append(F.min(sc).alias(f"mn{i}"))
            aggs.append(F.max(sc).alias(f"mx{i}"))
            aggs.append(F.sum(F.col(sc).isNull().cast("long")).alias(f"nn{i}"))
        row = source_df.agg(*aggs).collect()[0]
        self._n_source = int(row["__cnt"])
        conj = list(static)
        for i, (tc, sc, ns) in enumerate(pairs):
            mn, mx = row[f"mn{i}"], row[f"mx{i}"]
            self._stats_bounds[tc] = (sc, ns, mn, mx, int(row[f"nn{i}"] or 0))
            b = _between(
                tc,
                [mn] if mn is not None else [],
                [mx] if mx is not None else [],
                int(row[f"nn{i}"] or 0),
                ns,
            )
            if b:
                conj.append(b)
        return " AND ".join(conj) if conj else None

    def _interval_union_predicate(
        self, source_df: DataFrame, part_cols: list[str]
    ) -> str | None:
        """Second-stage candidate refinement (r11): the early filter's
        min/max BETWEEN collapses a MULTI-MODAL source key set into one
        interval that can cover the whole table — the index-maintenance
        shape exactly (takedown ids at the low end + new-crawl ids at
        the high end spanned every id-clustered file, so an O(changes)
        sync still SCANNED O(corpus) at discovery). For each numeric
        stats-pair column, histogram the source values into
        ``_UNION_BUCKETS`` equal-width buckets (one distinct-bucket job
        over the change-batch-sized source, <= buckets rows collected),
        merge adjacent occupied buckets into intervals, pad each by one
        bucket width (swallows double-rounding at the bucket edges so
        the union stays a provable SUPERSET of the source values), and
        emit the canonical ``(tc BETWEEN .. OR tc BETWEEN ..)`` spelling
        plans/skipping.py evaluates exactly against file min/max.
        Returns None when no pair yields a union materially tighter
        than its plain BETWEEN. Only called when > _UNION_MIN_FILES
        candidates survive the first prune, so cheap merges never pay
        the extra pass."""
        import math

        # _equi_join_pairs only binds members of the top-level And chain
        # (an OR-rooted predicate yields no pairs), so every pair here
        # is a binding conjunct — same safety argument as the early
        # filter itself. The min/max bounds come from the stash the
        # early-filter aggregation already computed this invocation —
        # only the bucket-occupancy pass is a new job.
        part_set = set(part_cols)
        bounds = getattr(self, "_stats_bounds", {})
        conj: list[str] = []
        B = self._UNION_BUCKETS
        for tc, (sc, ns, mn, mx, n_null) in bounds.items():
            if tc in part_set:
                continue
            if ns and n_null:
                continue  # NULL-safe pair with source NULLs: no prune
            ok_types = (
                isinstance(mn, (int, float))
                and isinstance(mx, (int, float))
                and not isinstance(mn, bool)
                and not isinstance(mx, bool)
            )
            if not ok_types or mx <= mn:
                continue
            span = float(mx - mn)
            if not math.isfinite(span) or span <= 0:
                continue
            bucket = F.least(
                F.greatest(
                    F.floor(
                        (F.col(sc).cast("double") - F.lit(float(mn)))
                        / F.lit(span)
                        * F.lit(B)
                    ).cast("long"),
                    F.lit(0),
                ),
                F.lit(B - 1),
            )
            occ = sorted(
                int(r["b"])
                for r in source_df.where(F.col(sc).isNotNull())
                .select(bucket.alias("b"))
                .distinct()
                .collect()
            )
            if not occ:
                continue
            runs: list[tuple[int, int]] = []
            start = prev = occ[0]
            for b in occ[1:]:
                if b == prev + 1:
                    prev = b
                    continue
                runs.append((start, prev))
                start = prev = b
            runs.append((start, prev))
            covered = sum(e - s + 1 for s, e in runs)
            if (
                len(runs) < 2
                or len(runs) > self._UNION_MAX_ARMS
                or covered / B > self._UNION_MAX_COVER
            ):
                continue
            is_int = isinstance(mn, int) and isinstance(mx, int)
            arms = []
            for s_, e_ in runs:
                lo = mn + span * (s_ - 1) / B  # one-bucket outward pad
                hi = mn + span * (e_ + 2) / B
                if is_int:
                    lo, hi = int(math.floor(lo)), int(math.ceil(hi))
                lo, hi = max(lo, mn), min(hi, mx)
                arms.append(
                    f"{tc} BETWEEN {_sql_literal(lo)} AND {_sql_literal(hi)}"
                )
            conj.append("(" + " OR ".join(arms) + ")")
        return " AND ".join(conj) if conj else None

    def execute(self) -> dict[str, Any]:
        from delta_rs_spark.table import read_snapshot_df
        from delta_rs_spark.writer import _to_spark_df, write_files

        spark = self.dt.spark
        table_path = self.dt.table_uri
        snapshot = snap_mod.load_snapshot(table_path)
        from delta_rs_spark.plans.column_mapping import ensure_writable

        ensure_writable(snapshot)
        part_cols = snapshot.partition_columns
        schema = self.dt.schema()
        cols = [f.name for f in schema.fields]
        t, s = self._aliases()

        # identity columns (delta-spark parity, r12): update clauses may
        # never assign one; insert clauses GENERATE any identity column
        # they leave unassigned (ALWAYS and BY DEFAULT alike), and may
        # assign one explicitly only under GENERATED BY DEFAULT. The
        # concrete assignment maps exist post-expansion — all guards and
        # the generation plan are built there.
        from delta_rs_spark.plans import identity as _ident

        _idents = _ident.identity_fields(schema)

        source_df = _to_spark_df(self.source, spark)
        src_cols = set(source_df.columns)
        source_df = source_df.persist()
        # num_source_rows (metrics-only) rides the early-filter
        # aggregation when that runs a complete pass (r12: was its own
        # job); the fallback count at the end reads the cached blocks
        num_source_rows: int | None = None

        schema_changed = False
        if self.merge_schema:
            from delta_rs_spark.writer import _merge_schemas

            merged = _merge_schemas(schema, source_df.schema)
            schema_changed = merged.json() != schema.json()
            schema = merged
            cols = [f.name for f in schema.fields]

        # expand *_all clauses
        for cl in self.matched:
            if cl.kind == "update" and cl.updates is None:
                cl.updates = self._auto_updates(cl, cols, src_cols, getattr(self, "_matched_except", []))
        for cl in self.not_matched:
            if cl.updates is None:
                cl.updates = self._auto_updates(cl, cols, src_cols, getattr(self, "_insert_except", []))
        id_plan: dict[str, dict] = {}
        if _idents:
            # post-expansion guards (update_all/insert_all have concrete
            # assignment maps only now): no update clause — *_all
            # included — may assign an identity column; insert clauses
            # generate unassigned identity columns and may assign one
            # explicitly only under GENERATED BY DEFAULT (except_cols is
            # the insert_all escape hatch for ALWAYS tables whose source
            # carries the column). id_plan records, per identity column,
            # whether any clause generates — it drives both the per-row
            # generation below and the same-commit watermark Metadata.
            for cl in self.matched + self.not_matched_by_source:
                if cl.kind == "update":
                    _ident.reject_identity_assignment(
                        cl.updates or {}, schema, "MERGE update clause"
                    )
            for cl in self.not_matched:
                for f in _idents:
                    step = int((f.metadata or {}).get(_ident.META_STEP, 1))
                    if f.name in (cl.updates or {}):
                        if not bool(
                            (f.metadata or {}).get(_ident.META_ALLOW, False)
                        ):
                            raise DeltaError(
                                f"MERGE insert cannot assign GENERATED ALWAYS "
                                f"identity column {f.name!r} (explicit values "
                                "need GENERATED BY DEFAULT)"
                            )
                        id_plan.setdefault(
                            f.name, {"step": step, "explicit": True}
                        )
                    else:
                        id_plan[f.name] = {"step": step, "explicit": False}

        all_adds = list(snapshot.files.values())
        col_types = col_types_from_schema_json(
            __import__("json").loads(snapshot.schema_string)
        )
        from delta_rs_spark.plans.column_mapping import snapshot_physical_of

        early = self._strip_target_only_predicate(source_df, part_cols)
        num_source_rows = self._n_source
        candidates = (
            prune_files(all_adds, early, part_cols, col_types, snapshot_physical_of(snapshot))
            if early
            else all_adds
        )
        if len(candidates) > self._UNION_MIN_FILES:
            # the plain early filter left many files — a multi-modal
            # source key set (index maintenance: low-id updates + high-id
            # appends) defeats a single min/max interval; try the
            # interval-union refinement (one extra change-batch-sized
            # pass, only paid here where it can actually save file scans)
            union_pred = self._interval_union_predicate(source_df, part_cols)
            if union_pred:
                candidates = prune_files(
                    candidates,
                    union_pred,
                    part_cols,
                    col_types,
                    snapshot_physical_of(snapshot),
                )

        # ---- choose rewrite files ---------------------------------------
        if self.not_matched_by_source:
            rewrite_adds = all_adds
        elif self.matched:
            # the fp column is bound inside the scan (before any
            # select/union/alias — hidden metadata columns do not survive
            # those, and DV tables union two branches)
            cand_fp = read_snapshot_df(
                spark,
                snapshot,
                table_path,
                files=candidates,
                file_path_col="__delta_rs_fp",
            )
            touched_rows = (
                cand_fp.alias(t)
                .join(source_df.alias(s), F.expr(self.predicate), "inner")
                .select(F.col("__delta_rs_fp").alias("fp"))
                .groupBy("fp")
                .count()
                .collect()
            )
            touched = match_touched_files(touched_rows, table_path, candidates)
            rewrite_adds = [a for a in candidates if a.path in touched]
        else:
            rewrite_adds = []

        # ---- job B: rewrite path ----------------------------------------
        # DV mode (delta.enableDeletionVectors=true): acted target rows
        # (updated/deleted) are DV-marked dead in place and only updated
        # rows are re-written; COPY rows stay in their files untouched —
        # write amplification O(rows acted on), not O(rows in touched
        # files). The reference rewrites whole files for merge.
        from delta_rs_spark.operators.delete import (
            dv_mark_rows,
            dv_write_enabled,
            group_rows_by_file,
        )

        dv_mode = dv_write_enabled(snapshot)
        # r13: fused data+CDC write — one job, one pass, no insert
        # persist (falls back for variant columns / write rules)
        fuse_cdc = cdf_enabled(snapshot) and can_fuse_cdc_write(snapshot)
        out_parts: list[DataFrame] = []
        metrics_rows: dict[int, int] = {}
        n_updated = n_deleted = n_copied = n_nmbs_updated = 0
        acted = None
        acted_pairs: list = []
        from delta_rs_spark.plans import row_tracking as _rt

        rt_on = _rt.enabled(snapshot.configuration)
        _mat_id, _mat_ver = _rt.materialized_names(snapshot.configuration)
        if rewrite_adds:
            t_df = read_snapshot_df(
                spark,
                snapshot,
                table_path,
                files=rewrite_adds,
                file_path_col="__delta_rs_fp" if (dv_mode or rt_on) else None,
                row_index_col="__delta_rs_ri" if (dv_mode or rt_on) else None,
                extra_physical_cols=[_mat_id, _mat_ver] if rt_on else None,
            )
            if rt_on:
                # materialize every target row's CURRENT id/version; the
                # rewrite projection below keeps the id for updated rows
                # and nulls their version (reader falls back to this
                # commit's defaultRowCommitVersion)
                _fmap = _rt.file_map_df(spark, rewrite_adds, table_path)
                t_df = (
                    t_df.join(
                        F.broadcast(_fmap),
                        F.col("__delta_rs_fp") == F.col("__rt_fp"),
                        "left",
                    )
                    .withColumn(
                        _mat_id,
                        F.coalesce(
                            F.col(_mat_id),
                            F.col("__rt_base") + F.col("__delta_rs_ri"),
                        ),
                    )
                    .withColumn(
                        _mat_ver, F.coalesce(F.col(_mat_ver), F.col("__rt_ver"))
                    )
                    .drop("__rt_fp", "__rt_base", "__rt_ver")
                )
                if not dv_mode:
                    t_df = t_df.drop("__delta_rs_fp", "__delta_rs_ri")
            for f in schema.fields:  # evolved columns read as NULL from old files
                if f.name not in t_df.columns:
                    t_df = t_df.withColumn(f.name, F.lit(None).cast(f.dataType))
            t_df = t_df.withColumn(_TMARK, F.lit(1)).withColumn(
                _TID, F.monotonically_increasing_id()
            )
            s_df = source_df.withColumn(_SMARK, F.lit(1))
            if self.matched:
                joined = t_df.alias(t).join(
                    s_df.alias(s), F.expr(self.predicate), "left_outer"
                )
            else:
                # nmbs-only merge: clauses read target columns only, so a
                # semi/anti split keeps exactly one row per target row — a
                # left_outer join would duplicate targets matched by
                # multiple source rows (allowed without matched clauses)
                tt = t_df.alias(t)
                ss = s_df.alias(s)
                sem = tt.join(ss, F.expr(self.predicate), "left_semi").withColumn(
                    _SMARK, F.lit(1)
                )
                ant = tt.join(ss, F.expr(self.predicate), "left_anti").withColumn(
                    _SMARK, F.lit(None).cast("int")
                )
                joined = sem.unionByName(ant).alias(t)

            matched_cond = F.col(_SMARK).isNotNull()
            action = None
            # (condition, action code, participation class): the class
            # drives duplicate-match validation (reference
            # merge/mod.rs:561 MatchParticipationClass + validation.rs):
            # per target row, >1 ACTION pairs — or an ACTION alongside an
            # UNCONDITIONAL DELETE — is ambiguous and errors; duplicate
            # no-ops and duplicate unconditional deletes are deterministic
            # and collapse to one winner instead.
            branches: list[tuple[Column, int, int]] = []
            code = 0
            coded_clauses: list[tuple[int, _Clause]] = []
            for cl in self.matched:
                cond = matched_cond
                if cl.predicate:
                    cond = cond & F.expr(cl.predicate)
                if cl.kind == "delete":
                    cls_v = _CLS_UNCOND_DELETE if cl.predicate is None else _CLS_ACTION
                else:
                    cls_v = _CLS_ACTION
                branches.append((cond, DELETE if cl.kind == "delete" else code, cls_v))
                coded_clauses.append((code, cl))
                code += 1
            for cl in self.not_matched_by_source:
                cond = ~matched_cond
                if cl.predicate:
                    cond = cond & F.expr(cl.predicate)
                # nmbs pairs can't duplicate (one row per unmatched target)
                branches.append((cond, DELETE if cl.kind == "delete" else code, _CLS_IGNORE))
                coded_clauses.append((code, cl))
                code += 1

            action = F.lit(COPY)
            cls = F.when(matched_cond, F.lit(_CLS_NOOP)).otherwise(F.lit(_CLS_IGNORE))
            for cond, c, cls_v in reversed(branches):
                action = F.when(cond, F.lit(c)).otherwise(action)
                cls = F.when(cond, F.lit(cls_v)).otherwise(cls)
            acted = joined.withColumn(_ACTION, action).withColumn(_CLS, cls).persist()
            live = acted

            if self.matched:
                # ONE job computes duplicate-match validation AND the
                # per-action winner counts (r12: these were two separate
                # passes over the persisted frame). Per target row:
                # winner = the max-(_CLS, _ACTION) pair — deterministic,
                # because rows tying on _CLS always carry the same
                # action (NOOP rows are all COPY, unconditional-delete
                # rows all DELETE, and two distinct ACTION codes on one
                # row is exactly the ambiguity error below).
                per_tid = acted.groupBy(_TID).agg(
                    F.max(F.struct(F.col(_CLS), F.col(_ACTION))).alias("__w"),
                    F.sum((F.col(_CLS) == _CLS_ACTION).cast("int")).alias("__na"),
                    F.sum(
                        (F.col(_CLS) == _CLS_UNCOND_DELETE).cast("int")
                    ).alias("__nu"),
                )
                summary = (
                    per_tid.groupBy(F.col(f"__w.{_ACTION}").alias(_ACTION))
                    .agg(
                        F.count(F.lit(1)).alias("count"),
                        F.max(
                            (
                                (F.col("__na") > 1)
                                | ((F.col("__na") > 0) & (F.col("__nu") > 0))
                            ).cast("int")
                        ).alias("__bad"),
                    )
                    .collect()
                )
                if any(r["__bad"] for r in summary):
                    raise MergeError(
                        "MERGE matched a target row with multiple source rows "
                        "that satisfy duplicate relevant WHEN MATCHED clauses"
                    )
                counts = {r[_ACTION]: r["count"] for r in summary}
                # winner per target row: the acting pair if any, else one
                # no-op pair (all no-op/unconditional-delete winners
                # produce identical output rows, so the tie is immaterial)
                win = W.partitionBy(_TID).orderBy(F.desc(_CLS))
                live = (
                    live.withColumn("__rn", F.row_number().over(win))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                counts = None

            if dv_mode:
                # rows the merge acts on die in place; collect their
                # physical addresses for DV marking (O(rows acted on))
                acted_pairs = (
                    live.filter(F.col(_ACTION) != COPY)
                    .groupBy(F.col("__delta_rs_fp").alias("fp"))
                    .agg(F.collect_list("__delta_rs_ri").alias("ris"))
                    .collect()
                )
            if counts is None:
                counts = {
                    r[_ACTION]: r["count"]
                    for r in live.groupBy(_ACTION).count().collect()
                }
            n_deleted = sum(
                v for k, v in counts.items() if k == DELETE
            )
            upd_codes = {c for c, cl in coded_clauses if cl.kind == "update"}
            matched_upd_codes = {c for c, cl in coded_clauses[: len(self.matched)] if cl.kind == "update"}
            n_updated = sum(v for k, v in counts.items() if k in matched_upd_codes)
            n_nmbs_updated = sum(v for k, v in counts.items() if k in upd_codes - matched_upd_codes)
            n_copied = counts.get(COPY, 0)

            proj = []
            for c in cols:
                col_expr = F.col(f"{t}.`{c}`")
                for code_i, cl in reversed(coded_clauses):
                    if cl.kind == "update":
                        upd = cl.updates or {}
                        if c in upd:
                            # cast INSIDE the branch: when/otherwise
                            # coerces mismatched branch types with an
                            # implicit strict cast, which would bypass
                            # the safe (try_cast) mode
                            col_expr = F.when(
                                F.col(_ACTION) == code_i,
                                self._out_cast(F.expr(upd[c]), schema[c]),
                            ).otherwise(col_expr)
                proj.append(col_expr.cast(schema[c].dataType).alias(c))
            out_flt = F.col(_ACTION) != DELETE
            if dv_mode:  # COPY rows stay in their (DV'd) files
                out_flt = out_flt & (F.col(_ACTION) != COPY)
            proj_rt = []
            if rt_on:
                _is_upd = (
                    F.col(_ACTION).isin(*upd_codes) if upd_codes else F.lit(False)
                )
                proj_rt = [
                    F.col(f"{t}.`{_mat_id}`").alias(_mat_id),
                    F.when(_is_upd, F.lit(None).cast("long"))
                    .otherwise(F.col(f"{t}.`{_mat_ver}`"))
                    .alias(_mat_ver),
                ]
            rewritten = live.filter(out_flt).select(
                *proj, *proj_rt, F.col(_ACTION)
            )
            rewritten = _recompute_generated(
                rewritten, schema, cols, coded_clauses
            )
            if fuse_cdc:
                # r13 (VERDICT r12 #2): tag the rewrite rows for the
                # fused single-job writer — updated rows are
                # update_postimage (routed to data files AND
                # _change_data/), everything else NULL (data only)
                rewritten = rewritten.withColumn(
                    CHANGE_TYPE_COL,
                    F.when(
                        F.col(_ACTION).isin(*upd_codes), F.lit("update_postimage")
                    ).otherwise(F.lit(None).cast("string"))
                    if upd_codes
                    else F.lit(None).cast("string"),
                )
            rewritten = rewritten.drop(_ACTION)
            out_parts.append(rewritten)

            if cdf_enabled(snapshot):
                t_proj = [F.col(f"{t}.`{c}`").alias(c) for c in cols]
                deleted_cdf = live.filter(F.col(_ACTION) == DELETE).select(*t_proj).withColumn(
                    CHANGE_TYPE_COL, F.lit("delete")
                )
                upd_filter = F.col(_ACTION).isin(*upd_codes) if upd_codes else F.lit(False)
                pre = live.filter(upd_filter).select(*t_proj).withColumn(
                    CHANGE_TYPE_COL, F.lit("update_preimage")
                )
                if fuse_cdc:
                    # postimage rows ride the tagged rewrite (one
                    # evaluation serves both sinks); delete/preimage
                    # rows join the same fused frame — align hidden
                    # row-tracking columns for the union (the writer
                    # drops them from change files anyway)
                    if rt_on:
                        for _h in (_mat_id, _mat_ver):
                            deleted_cdf = deleted_cdf.withColumn(
                                _h, F.lit(None).cast("long")
                            )
                            pre = pre.withColumn(_h, F.lit(None).cast("long"))
                    self._cdf_parts = [deleted_cdf, pre]
                else:
                    post = live.filter(upd_filter).select(*proj).withColumn(
                        CHANGE_TYPE_COL, F.lit("update_postimage")
                    )
                    self._cdf_parts = [deleted_cdf, pre, post]
            else:
                self._cdf_parts = []
        else:
            self._cdf_parts = []

        # ---- job A: insert path -----------------------------------------
        n_inserted = 0
        insert_df = None
        insert_persisted = False
        if self.not_matched:
            # r13 (VERDICT r12 #3, share the apply scan): when the
            # rewrite pass ran, the persisted `acted` frame already
            # holds every target row the anti-join could match against
            # — rewrite_adds covers the touched files (every match pair
            # lives in a touched file by definition, r12 #10b) and in
            # the nmbs case the whole table; rows outside `candidates`
            # satisfy the predicate for no source row (the early filter
            # proves it), so anti-joining against acted's target rows
            # is exactly equivalent to re-scanning the files — minus
            # the scan. Only insert-only merges (no rewrite pass) still
            # read the candidate files.
            if acted is not None:
                anti_tgt = acted.select(
                    *[F.col(f"{t}.`{c}`").alias(c) for c in cols]
                )
            else:
                anti_tgt = read_snapshot_df(
                    spark, snapshot, table_path, files=candidates
                )
            unmatched_src = source_df.alias(s).join(
                anti_tgt.alias(t), F.expr(self.predicate), "left_anti"
            )
            remaining = unmatched_src
            pieces = []
            for cl in self.not_matched:
                sel = remaining
                if cl.predicate:
                    sel = remaining.filter(F.expr(cl.predicate))
                    remaining = remaining.filter(~F.expr(cl.predicate).eqNullSafe(F.lit(True)))
                else:
                    remaining = remaining.limit(0)
                upd = cl.updates or {}
                proj = [
                    self._out_cast(
                        F.expr(upd[c]) if c in upd else F.lit(None), schema[c]
                    ).alias(c)
                    for c in cols
                ]
                piece = sel.select(*proj)
                # inserted rows: compute generated columns not set explicitly
                from delta_rs_spark.writer import GENERATION_KEY

                gen_missing = {
                    c: (schema[c].metadata or {}).get(GENERATION_KEY)
                    for c in cols
                    if c not in upd and (schema[c].metadata or {}).get(GENERATION_KEY)
                }
                if gen_missing:
                    piece = piece.select(
                        *[
                            F.expr(gen_missing[c]).cast(schema[c].dataType).alias(c)
                            if c in gen_missing
                            else F.col(c)
                            for c in cols
                        ]
                    )
                # identity generation is per CLAUSE: flag the rows this
                # clause leaves unassigned (another clause may assign the
                # same column explicitly under BY DEFAULT)
                for c, info in id_plan.items():
                    if not info["explicit"]:
                        piece = piece.withColumn(
                            f"__idgen_{c}", F.lit(c not in upd)
                        )
                pieces.append(piece)
            insert_df = pieces[0]
            for p_df in pieces[1:]:
                insert_df = insert_df.unionByName(p_df)
            for c, info in id_plan.items():
                if info["explicit"]:
                    continue
                # same scheme as the write path (plans/identity.py):
                # next-beyond-watermark + step * monotonically_increasing_id
                # — unique under any runtime partition count (mid's
                # partition ids span the whole union job), progression
                # membership and >watermark by construction; the persist
                # below pins the generated values before the write job
                start, step, hwm, _allow = _ident._params(schema[c])
                nxt = start if hwm is None else hwm + step
                gen = (
                    F.lit(nxt) + F.lit(step) * F.monotonically_increasing_id()
                ).cast(schema[c].dataType)
                insert_df = insert_df.withColumn(
                    c,
                    F.when(F.col(f"__idgen_{c}"), gen).otherwise(F.col(f"`{c}`")),
                ).drop(f"__idgen_{c}")
            if rt_on and out_parts:
                # the rewrite part carries materialized columns; inserted
                # rows take NULLs — fresh ids from the new file's base
                insert_df = insert_df.withColumn(
                    _mat_id, F.lit(None).cast("long")
                ).withColumn(_mat_ver, F.lit(None).cast("long"))
            if fuse_cdc:
                # r13: the fused writer routes "insert"-tagged rows to
                # BOTH sinks from one evaluation — no persist, no
                # second job (identity generation stays deterministic:
                # the frame is evaluated exactly once)
                insert_df = insert_df.withColumn(
                    CHANGE_TYPE_COL, F.lit("insert")
                )
                out_parts.append(insert_df)
            elif cdf_enabled(snapshot):
                # fallback: the CDF branch evaluates the insert frame a
                # second time — persist pins it (and any generated
                # identity values) across the two write jobs; without
                # CDF the frame is consumed exactly once inside the
                # write job, so neither a persist nor the r11 count job
                # is needed (n_inserted derives from the written files'
                # stats)
                insert_df = insert_df.persist()
                insert_persisted = True
                out_parts.append(insert_df)
                self._cdf_parts.append(
                    insert_df.drop(_mat_id, _mat_ver).withColumn(
                        CHANGE_TYPE_COL, F.lit("insert")
                    )
                )
            else:
                out_parts.append(insert_df)

        # ---- write + commit ---------------------------------------------
        actions: list = []
        if schema_changed:
            from delta_rs_spark.log.actions import Metadata

            meta = snapshot.metadata
            actions.append(
                Metadata(
                    schema_string=schema.json(),
                    partition_columns=part_cols,
                    configuration=meta.configuration,
                    id=meta.id,
                    name=meta.name,
                    description=meta.description,
                    created_time=meta.created_time,
                )
            )
        new_adds: list[Add] = []
        fused_cdc_actions: list = []
        if out_parts:
            result = out_parts[0]
            for p_df in out_parts[1:]:
                result = result.unionByName(p_df)
            if fuse_cdc:
                # ONE job writes data + change files from one pass over
                # the (cached) acted frame and the insert frame; the
                # delete/preimage branches union in as CDC-only rows
                for p_df in self._cdf_parts:
                    result = result.unionByName(p_df)
                self._cdf_parts = []
                new_adds, fused_cdc_actions = write_data_and_change_files(
                    result, table_path, part_cols, snapshot
                )
            else:
                from delta_rs_spark.writer import enforce_write_rules

                result = enforce_write_rules(result, snapshot)
                try:
                    # unpartitioned rewrites inherit the persisted acted
                    # frame's cache partitioning (32 tiny files per
                    # merge at local shuffle counts; cached plans defeat
                    # AQE coalescing) — rebalance to size-adaptive
                    # output files (guide §6; partitioned writes get the
                    # same control from write_files' repartition)
                    out_df = result if part_cols else result.hint("rebalance")
                    new_adds = write_files(out_df, table_path, part_cols)
                finally:
                    result.unpersist()
            actions.extend(new_adds)
        if id_plan and new_adds:
            # advance each written identity column's high watermark in
            # the SAME commit (writer.py does the same for appends) —
            # racing identity writers then conflict via MetadataChanged
            # instead of silently double-allocating
            _new_schema = _ident.watermark_updates(
                id_plan,
                schema,
                new_adds,
                table_path,
                spark,
                configuration=snapshot.configuration,
            )
            if _new_schema is not None:
                from delta_rs_spark.log.actions import Metadata

                queued = [a for a in actions if isinstance(a, Metadata)]
                if queued:
                    queued[-1].schema_string = _new_schema
                else:
                    meta = snapshot.metadata
                    actions.append(
                        Metadata(
                            schema_string=_new_schema,
                            partition_columns=part_cols,
                            configuration=meta.configuration,
                            id=meta.id,
                            name=meta.name,
                            description=meta.description,
                            created_time=meta.created_time,
                        )
                    )
        if fused_cdc_actions:
            actions.extend(fused_cdc_actions)
        if self._cdf_parts:
            cdf_all = self._cdf_parts[0]
            for p_df in self._cdf_parts[1:]:
                cdf_all = cdf_all.unionByName(p_df)
            actions.extend(write_change_data(cdf_all, table_path))

        ts = now_ms()
        if dv_mode:
            # only files with acted rows change; remove tombstones the old
            # (path, DV) pairing, the re-add carries the merged DV —
            # remove precedes its re-add (sequential replay)
            by_rel = group_rows_by_file(acted_pairs, table_path, rewrite_adds)
            removes, dv_readds, _ = dv_mark_rows(table_path, by_rel, rewrite_adds, ts)
            actions.extend(removes)
            actions.extend(dv_readds)
            n_copied = 0  # nothing is rewritten in DV mode
        else:
            removes = [
                Remove(a.path, ts, True, a.partition_values, a.size, deletion_vector=a.deletion_vector)
                for a in rewrite_adds
            ]
            actions.extend(removes)

        if num_source_rows is None:
            # early filter never made a complete source pass; the frame
            # is cached by now, so this is a cheap cached count
            num_source_rows = source_df.count()
        if insert_df is not None:
            # r12: the dedicated insert-count job is gone — the written
            # files' footer stats already hold the total output row
            # count, and the rewrite path's exact per-action counts say
            # how many of those rows it contributed (in DV mode COPY
            # rows stay in place and n_copied is already zeroed above)
            if all(a.num_records() is not None for a in new_adds):
                n_inserted = sum(a.num_records() for a in new_adds) - (
                    int(n_copied) + int(n_updated) + int(n_nmbs_updated)
                )
            else:  # footer stats unavailable — fall back to counting
                n_inserted = insert_df.count()
        metrics = {
            "num_source_rows": num_source_rows,
            "num_target_rows_inserted": int(n_inserted),
            "num_target_rows_updated": int(n_updated),
            "num_target_rows_deleted": int(n_deleted),
            "num_target_rows_copied": int(n_copied),
            "num_target_rows_updated_by_source_miss": int(n_nmbs_updated),
            "num_target_files_added": len(new_adds),
            "num_target_files_removed": len(removes),
            # early-filter visibility (reference mod.rs:691-693): how many
            # files the scan touched vs skipped outright by the filter
            "num_target_files_scanned": len(candidates),
            "num_target_files_skipped_during_scan": len(all_adds) - len(candidates),
            "num_output_rows": int(sum(a.num_records() or 0 for a in new_adds)),
        }
        if dv_mode:
            metrics["num_deletion_vectors_added"] = sum(
                1 for a in actions if isinstance(a, Add) and a.deletion_vector
            )
        op = CommitInfo(
            "MERGE",
            {
                "predicate": self.predicate,
                "matchedPredicates": [
                    {"actionType": c.kind, **({"predicate": c.predicate} if c.predicate else {})}
                    for c in self.matched
                ],
                "notMatchedPredicates": [
                    {"actionType": c.kind, **({"predicate": c.predicate} if c.predicate else {})}
                    for c in self.not_matched
                ],
                "notMatchedBySourcePredicates": [
                    {"actionType": c.kind, **({"predicate": c.predicate} if c.predicate else {})}
                    for c in self.not_matched_by_source
                ],
            },
            operation_metrics=metrics,
        )
        # the read set is every CANDIDATE file (the insert anti-join scans
        # them and file selection consults their stats), not just the
        # rewritten ones; with not_matched_by_source clauses or no early
        # filter the whole table was read (ADVICE r01: a concurrent DELETE
        # of a scanned-but-not-rewritten file must raise
        # ConcurrentDeleteReadError)
        from delta_rs_spark.plans import row_tracking as _rt

        txn = TransactionInfo(
            blind_append=False,
            read_files={a.path for a in candidates},
            read_whole_table=(early is None or bool(self.not_matched_by_source)),
            table_config=snapshot.configuration,
            rt_watermark=_rt.cached_watermark(snapshot),
            isolation_level=snapshot.configuration.get(
                "delta.isolationLevel", "WriteSerializable"
            ),
        )
        commit_mod.commit(
            table_path,
            actions,
            op,
            snapshot.version,
            txn,
            commit_properties=self.commit_properties,
            post_commit=self.post_commithook_properties,
        )

        source_df.unpersist()
        if acted is not None:
            acted.unpersist()
        if insert_persisted:
            insert_df.unpersist()
        self.dt.refresh()
        return metrics
