"""Incrementally-maintained materialized aggregates over a lake table.

The reference rebuilds every derived artifact with a full-table pass
(tis-index-builder's full-build flow, IndexSwapTaskFlowLauncher.java; the
only thing its incremental path maintains is the wide row itself).  Here
the snapshot-diff changelog in preimage mode (``LakeTable.changes(...,
with_preimage=True)``) makes ANY group-by aggregate self-maintaining: a
refresh reads O(delta) change rows instead of O(table) state, applies
signed contributions, and commits the per-group deltas to the view's own
lake table under the same exactly-once protocol as the engines — writer
fencing via ``expected_snapshot_id`` plus a source-snapshot watermark in
the commit summary, so a replayed/raced refresh is a conflict or a no-op,
never a double-apply.

Maintenance algebra per group g:

* ``count`` / ``sum``: exactly delta-maintainable — insert and
  update_postimage rows contribute +1/+v, delete and update_preimage rows
  contribute -1/-v; new = old + delta.  A per-sum non-null count is
  maintained alongside so an all-null group exposes SQL's ``NULL`` sum,
  not 0.  (Integral sums are exact; float sums accumulate in a different
  order than a rescan would — use integral columns where bit-equality
  matters.)
* ``min`` / ``max``: delta-maintainable while a group only GAINS rows
  (``least(old, batch_min)``); a retraction (delete / update_preimage)
  can remove the extremum, so retracted groups are recomputed from the
  source snapshot being caught up to.  A refresh with NO retractions
  (the insert-only common case) skips the recompute entirely.  The
  recompute read is restricted to the retracted groups: when the group
  column IS the source's physical layout key the read is file-pruned by
  bucket + zone map (O(retracted groups) IO — the per-domain rollup
  over a domain-laid-out table case); when it is the source primary key
  on a relocating table, per-file PK blooms prune; otherwise the exact
  group set is pushed down as an ``isin`` parquet filter but every base
  file may still be *opened* — O(table) IO column-pruned, O(retracted
  groups) shuffle/agg.  min/max under deletion is fundamentally not
  delta-maintainable without per-(group, value) auxiliary state; the
  recompute-retracted-groups fallback is the standard lake-native trade.
  ``create(..., exact_extrema=True)`` opts into exactly that auxiliary
  state (the standard IVM multiset trick): per aggregated column, a lake
  table of live (group, value) multiplicities — itself count-style
  delta-maintained from the same changelog, and CLUSTERED BY THE GROUP
  COLUMN, so a retraction recompute is a bucket + zone-map point lookup
  into the multiset — O(retracted groups) IO whatever the source's own
  layout, and the recompute never reads the source after bootstrap (the
  changelog's key-restricted preimage read, O(changed keys), is the only
  remaining source IO).  Cost: one extra
  bucket-restricted merge per refresh per aux column and O(distinct
  (group, value)) storage; each aux is fenced/watermarked on its own
  snapshot chain, so a crash between aux and view commits self-heals.
* ``avg`` is maintained as (double sum, non-null count) and derived at
  ``read()`` — exactly delta-maintainable like sum.
* ``var_pop`` / ``stddev_pop`` are maintained as the power-sum triple
  (sum, sum-of-squares, non-null count) — each term is a signed sum, so
  variance is delta-maintainable even under deletion with NO recompute
  path at all (unlike min/max).  ``read()`` derives
  var = (s2 - s1^2/n)/n (clamped at 0 against float cancellation) and
  stddev = sqrt(var).  Integral sources keep the power sums in exact
  int64 (s2 overflows earliest: |v| <= 3M is safe at 10^9 rows per
  group); float sources accumulate in a different order than a rescan
  would — the same caveat as ``sum``.
* ``histogram`` maintains an ``array<long>`` of fixed-bin counts (values
  clamp into the edge bins; exact int64 bin arithmetic for integral
  columns/bounds) — every bin is a signed sum, so the whole distribution
  is delta-maintainable under deletion with no recompute path.
  ``read_quantile_bins`` derives per-group percentiles from the
  maintained counts (cum*den >= n*num, division-free int64), and
  ``read_histogram`` explodes the raw bins.
* ``approx_distinct`` maintains a k-minimum-values sketch (the k
  smallest md5 hashes of the column, ``operators/analytics.py``'s
  deterministic KMV shape): inserts merge the batch's min-k into the
  stored min-k (min-k of a union = min-k of the min-k's — exact,
  order-insensitive), retractions recompute the group's sketch through
  the same restricted read as min/max (a removed value may sit in the
  sketch).  ``read()`` derives the estimate: exact below k, else
  (k-1)/kth-hash-as-fraction.  Sketches are built with the Arrow-batched
  partial-min-k + survivor-rank plan (O(k x batches) rows shuffle, never
  the values themselves).
* a group whose maintained row count reaches 0 is tombstoned; a later
  insert resurrects it through normal delta reconciliation.

At 10^10-event scale a refresh therefore shuffles the changelog
(O(changed keys)) plus, only when a min/max view saw retractions, the
retracted-group recompute (file-pruned to O(groups) IO when the group is
the layout key) — never the full view; untouched view buckets are not
even opened (bucket-restricted read).
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

N_COL = "_mv_n"  # maintained group cardinality; also the view's version col
AUX_N_COL = "_mvx_n"  # multiset multiplicity in an exact-extrema auxiliary
_SPEC_FILE = "mv.json"
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
AGG_FNS = {
    "count",
    "sum",
    "min",
    "max",
    "avg",
    "approx_distinct",
    "var_pop",
    "stddev_pop",
    "histogram",
}
#: default k for approx_distinct KMV sketches (overridable at create())
KMV_K = 256
#: bounded-collect cap for the retracted-group set (same policy as the
#: changelog's preimage_keys_max): within the cap the min/max recompute
#: read is key-restricted; above it, the column-pruned scan-plus-semi-join
RETRACTED_GROUPS_MAX = 65536
#: max rows per exact-extrema auxiliary base file: the multiset is sorted
#: by group inside each bucket, and bounded files are what give each file
#: a tight [group_min, group_max] zone — one unbounded file per bucket
#: would span the whole group range and nothing could prune.  A
#: group-restricted read costs O(wanted groups' files), so this bounds the
#: read granularity; 1M rows of the 2-3 narrow columns is a few MB of
#: parquet.  Measured (bench_matview.py, 64M-row source): finer files did
#: NOT read less — a single hash-scattered wanted group per file defeats
#: zone pruning at any granularity, and bigger files amortize parquet
#: overhead — so the default stays coarse; env-tunable for group-local
#: workloads (domain purges) where finer zones do pay.
AUX_FILE_ROWS = int(os.environ.get("TIS_MV_AUX_FILE_ROWS", 1_000_000))


def _nn(out: str) -> str:
    return f"_mv_nn_{out}"


def _s1(out: str) -> str:
    # first power-sum of a var_pop/stddev_pop state triple (the stored
    # ``out`` column holds the second power-sum, _nn the non-null count)
    return f"_mv_s1_{out}"


def _null_safe_on(left: DataFrame, right: DataFrame, cols: list[str]) -> Column:
    return reduce(Column.__and__, [left[c].eqNullSafe(right[c]) for c in cols])


class MaterializedView:
    """A group-by aggregate view stored as its own :class:`LakeTable`
    (keyed on the group columns) and maintained from the source table's
    preimage changelog.  ``create`` + ``full_build`` bootstrap it;
    ``refresh`` catches it up to the source's current snapshot."""

    def __init__(self, spark: SparkSession, path: str, source: LakeTable | None = None):
        self.spark = spark
        self.path = path
        self.table = LakeTable.load(spark, path)
        with open(os.path.join(path, _SPEC_FILE)) as f:
            spec = json.load(f)
        self.group_cols: list[str] = spec["group_cols"]
        self.aggs: list[tuple[str, str, str | None]] = [tuple(a) for a in spec["aggs"]]
        self.kmv_k: int = int(spec.get("kmv_k", KMV_K))
        #: histogram output -> (lo, hi, n_bins)
        self.hist_specs: dict[str, tuple] = {
            out: tuple(s) for out, s in spec.get("hist_specs", {}).items()
        }
        self.source = source if source is not None else LakeTable.load(spark, spec["source"])
        #: exact-extrema multiset auxiliaries: value column -> LakeTable of
        #: per-(group, value) live multiplicities (see _aux_path)
        self.aux: dict[str, LakeTable] = {
            c: LakeTable.load(spark, self._aux_path(path, c))
            for c in spec.get("aux_cols", [])
        }

    # ------------------------------------------------------------ lifecycle

    @staticmethod
    def _aux_path(path: str, col: str) -> str:
        return os.path.join(path, f"aux_{col}")

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        source: LakeTable,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str | None]],
        num_buckets: int = 16,
        kmv_k: int = KMV_K,
        exact_extrema: bool = False,
        hist_specs: dict[str, tuple[float, float, int]] | None = None,
    ) -> "MaterializedView":
        """Define the view (no data yet — call ``full_build``).  ``aggs``
        maps output column -> (fn, source column); fn in {approx_distinct,
        avg, count, max, min, stddev_pop, sum, var_pop} (count takes no
        column).  Aggregated columns must exist in the source schema at
        create time.  ``avg`` is stored as its (double sum, non-null
        count) pair, ``var_pop``/``stddev_pop`` as the power-sum triple
        (sum, sum-of-squares, non-null count) and ``approx_distinct`` as
        its min-``kmv_k`` hash sketch, all derived at ``read()``.

        ``histogram`` aggs additionally require an entry in ``hist_specs``
        mapping the output to ``(lo, hi, n_bins)``: the state is an
        ``array<long>`` of per-bin counts (values clamp into the edge
        bins), each a signed sum — delta-maintainable under deletion with
        no recompute path, and the basis for the derived
        :meth:`read_quantile_bins` percentiles.

        ``exact_extrema=True`` additionally maintains, for every column a
        min/max/approx_distinct agg reads, a per-(group, value) multiset
        auxiliary (its own lake table under the view's directory, clustered
        by the group column) — the standard IVM trick that makes extrema
        delta-maintainable under deletion.  Retraction recomputes then read
        O(retracted groups) aux files and never rescan the source (the
        changelog's O(changed keys) preimage read is the only source IO
        left), at the cost of one extra bucket-restricted merge per
        refresh and O(distinct (group, value)) aux storage."""
        src_schema = source.current_snapshot().schema
        src_fields = {f.name: f for f in src_schema.fields}
        hist_specs = dict(hist_specs or {})  # never mutate the caller's dict
        for c in group_cols:
            assert c in src_fields, f"group col {c!r} not in source schema"
        fields = [T.StructField(c, src_fields[c].dataType) for c in group_cols]
        fields.append(T.StructField(N_COL, T.LongType()))
        norm: list[tuple[str, str, str | None]] = []
        for out, (fn, col) in aggs.items():
            if fn not in AGG_FNS:
                raise ValueError(
                    f"unsupported agg fn {fn!r} for output {out!r}; "
                    f"supported: {sorted(AGG_FNS)} (avg is maintained as "
                    "sum+count, var_pop/stddev_pop as sum+sumsq+count; "
                    "other aggs need per-group auxiliary state and are "
                    "not delta-maintainable here)"
                )
            assert out not in {f.name for f in fields}, f"duplicate output {out!r}"
            if fn == "count":
                fields.append(T.StructField(out, T.LongType()))
                norm.append((out, fn, None))
                continue
            assert col in src_fields, f"agg col {col!r} not in source schema"
            st = src_fields[col].dataType
            if fn in ("sum", "avg"):
                ot = (
                    T.DoubleType()
                    if fn == "avg" or not isinstance(st, _INTEGRAL)
                    else T.LongType()
                )
                fields.append(T.StructField(out, ot))
                fields.append(T.StructField(_nn(out), T.LongType()))
            elif fn in ("var_pop", "stddev_pop"):
                ot = T.LongType() if isinstance(st, _INTEGRAL) else T.DoubleType()
                fields.append(T.StructField(out, ot))  # sum of squares
                fields.append(T.StructField(_s1(out), ot))  # sum
                fields.append(T.StructField(_nn(out), T.LongType()))
            elif fn == "histogram":
                spec = hist_specs.get(out)
                if spec is None:
                    raise ValueError(
                        f"histogram agg {out!r} needs hist_specs[{out!r}] = "
                        "(lo, hi, n_bins)"
                    )
                lo, hi, nb = spec[:3]  # tolerate an already-extended spec
                assert hi > lo and int(nb) >= 1, spec
                # exact integer binning (engine-portable DIV arithmetic)
                # when the column and both bounds are integral
                exact = (
                    isinstance(st, _INTEGRAL)
                    and float(lo).is_integer()
                    and float(hi).is_integer()
                )
                hist_specs[out] = (lo, hi, int(nb), bool(exact))
                fields.append(T.StructField(out, T.ArrayType(T.LongType())))
            elif fn == "approx_distinct":
                fields.append(T.StructField(out, T.ArrayType(T.StringType())))
            else:
                fields.append(T.StructField(out, st))
            norm.append((out, fn, col))
        aux_cols: list[str] = []
        if exact_extrema:
            aux_cols = sorted(
                {c for _, fn, c in norm if fn in ("min", "max", "approx_distinct")}
            )
            clash = [c for c in aux_cols if c in group_cols]
            assert not clash, (
                f"exact_extrema cannot track extrema OF a group column {clash} "
                "(its per-group extremum is the group value itself — drop the "
                "agg or the option)"
            )
        LakeTable.create(
            spark,
            path,
            T.StructType(fields),
            key_cols=list(group_cols),
            version_col=N_COL,
            num_buckets=num_buckets,
        )
        for c in aux_cols:
            # the multiset: one row per live (group, value), clustered by
            # the leading group column so a retracted-group recompute is a
            # bucket + zone-map point lookup — file-pruned BY CONSTRUCTION,
            # whatever the source's own layout is
            LakeTable.create(
                spark,
                MaterializedView._aux_path(path, c),
                T.StructType(
                    [T.StructField(g, src_fields[g].dataType) for g in group_cols]
                    + [
                        T.StructField(c, src_fields[c].dataType),
                        T.StructField(AUX_N_COL, T.LongType()),
                    ]
                ),
                key_cols=list(group_cols) + [c],
                version_col=AUX_N_COL,
                num_buckets=num_buckets,
                layout_col=group_cols[0],
            )
        with open(os.path.join(path, _SPEC_FILE), "w") as f:
            json.dump(
                {
                    "source": source.path,
                    "group_cols": list(group_cols),
                    "aggs": norm,
                    "kmv_k": kmv_k,
                    "aux_cols": aux_cols,
                    "hist_specs": {
                        out: list(spec)
                        for out, spec in hist_specs.items()
                        if any(o == out and fn == "histogram" for o, fn, _ in norm)
                    },
                },
                f,
            )
        return MaterializedView(spark, path, source=source)

    # ------------------------------------------------------------- helpers

    def _types(self) -> dict[str, T.DataType]:
        return {f.name: f.dataType for f in self.table.current_snapshot().schema.fields}

    def _bin_expr(self, col: str, out: str) -> Column:
        """Histogram bin index of ``col`` under ``out``'s spec: values
        clamp into the edge bins, nulls stay null.  With integral column
        and bounds the index is pure int64 DIV arithmetic (bit-identical
        across engines); otherwise floor of a double ratio.  Negative
        pre-clamp indexes may truncate vs floor differently across
        engines, but both land <= 0 and the clamp makes them equal."""
        lo, hi, nb = self.hist_specs[out][:3]
        exact = bool(self.hist_specs[out][3]) if len(self.hist_specs[out]) > 3 else False
        if exact:
            raw = F.expr(
                f"((CAST(`{col}` AS BIGINT) - {int(lo)}L) * {int(nb)}L) "
                f"DIV {int(hi) - int(lo)}L"
            )
        else:
            raw = F.floor(
                (F.col(col).cast("double") - F.lit(float(lo)))
                * int(nb)
                / F.lit(float(hi) - float(lo))
            )
        z = F.lit(0).cast("long")
        clamped = F.least(F.greatest(raw.cast("long"), z), F.lit(int(nb) - 1).cast("long"))
        # greatest/least SKIP nulls (greatest(NULL, 0) = 0), so gate
        # explicitly: a null value belongs to no bin
        return F.when(F.col(col).isNotNull(), clamped)

    def _hist_array(self, col: str, out: str, weight: Column, alias: str | None = None) -> Column:
        """Per-bin signed-count aggregate expression (one array column):
        each bin is an independent signed sum, so the histogram is
        delta-maintainable exactly like count/sum."""
        nb = int(self.hist_specs[out][2])
        b = self._bin_expr(col, out)
        return F.array(
            *[
                F.coalesce(
                    F.sum(F.when(b == i, weight).otherwise(F.lit(0))), F.lit(0)
                ).cast("long")
                for i in range(nb)
            ]
        ).alias(alias or out)

    def _agg_exprs(self) -> list[Column]:
        types = self._types()
        exprs = [F.count(F.lit(1)).cast("long").alias(N_COL)]
        for out, fn, col in self.aggs:
            if fn == "count":
                exprs.append(F.count(F.lit(1)).cast("long").alias(out))
            elif fn in ("sum", "avg"):
                st = types[out]
                exprs.append(F.coalesce(F.sum(F.col(col).cast(st)), F.lit(0).cast(st)).alias(out))
                exprs.append(F.count(col).cast("long").alias(_nn(out)))
            elif fn in ("var_pop", "stddev_pop"):
                st = types[out]
                v = F.col(col).cast(st)
                exprs.append(F.coalesce(F.sum(v * v), F.lit(0).cast(st)).alias(out))
                exprs.append(F.coalesce(F.sum(v), F.lit(0).cast(st)).alias(_s1(out)))
                exprs.append(F.count(col).cast("long").alias(_nn(out)))
            elif fn == "histogram":
                exprs.append(self._hist_array(col, out, F.lit(1)))
            elif fn == "min":
                exprs.append(F.min(col).alias(out))
            elif fn == "max":
                exprs.append(F.max(col).alias(out))
            # approx_distinct: built by _kmv_sketch and joined by callers
        return exprs

    def _kmv_sketch(self, rows: DataFrame, col: str, out: str) -> DataFrame:
        """min-k sketch of md5('kmv:'||col) per group over ``rows``: an
        Arrow-batched partial min-k keeps the k smallest hashes per
        (group, arrow-batch) with no exchange, so only O(k x batches)
        survivor rows shuffle into the global rank — the two-stage plan
        proven by operators/analytics.py::kmv_distinct_sketch.  min-k of
        a union = min-k of the per-part min-k's, so the result is exact
        and batching-independent (deterministic across engines and
        cluster sizes, unlike HLL registers)."""
        k = self.kmv_k
        gcols = self.group_cols
        h = rows.select(
            *gcols,
            F.md5(F.concat(F.lit("kmv:"), F.col(col).cast("string"))).alias("_h"),
        ).filter(F.col("_h").isNotNull())
        schema = T.StructType(
            [h.schema[c] for c in gcols] + [T.StructField("_h", T.StringType())]
        )

        def partial_min_k(batches):
            for pdf in batches:
                yield (
                    pdf.drop_duplicates()  # KMV is over DISTINCT values
                    .sort_values("_h")
                    .groupby(gcols, sort=False, dropna=False)
                    .head(k)
                )

        # cross-batch duplicates survive the partial pass; the survivor
        # set is O(k x batches) rows, so a distinct here is metadata-cheap
        survivors = h.mapInPandas(partial_min_k, schema=schema).distinct()
        w = Window.partitionBy(*gcols).orderBy("_h")
        ranked = survivors.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= k
        )
        return ranked.groupBy(*gcols).agg(
            F.array_sort(F.collect_list("_h")).alias(out)
        )

    def _join_sketches(self, agg: DataFrame, rows: DataFrame, rename=None) -> DataFrame:
        """Left-join one min-k sketch per approx_distinct agg (built over
        ``rows``) onto ``agg``; absent groups (all-null column) coalesce
        to the empty sketch.  The sketch side's group columns are renamed
        before the join: agg and the sketch usually share lineage (both
        derive from the same scan), and a same-attribute equality would
        silently degenerate to a trivially-true self-join predicate."""
        gcols = self.group_cols
        for out, fn, col in self.aggs:
            if fn != "approx_distinct":
                continue
            name = rename(out) if rename else out
            sk = self._kmv_sketch(rows, col, name).select(
                *[F.col(c).alias(f"_skg_{c}") for c in gcols], name
            )
            cond = reduce(
                Column.__and__,
                [agg[c].eqNullSafe(sk[f"_skg_{c}"]) for c in gcols],
            )
            agg = agg.join(sk, cond, "left").select(
                *[agg[c] for c in agg.columns if c != name],
                F.coalesce(sk[name], F.array().cast("array<string>")).alias(name),
            )
        return agg

    def _check_schema_drift(self, src_snap) -> None:
        """Fail loudly when a source DDL has widened a column the view
        aggregates (or groups) on: the view's physical schema is frozen at
        create(), so a refresh would silently cast the wider values back
        down (int->long drift = overflow/truncation with no error).  The
        fix is to recreate the view (or evolve it explicitly) — never to
        truncate quietly."""
        src_fields = {f.name: f.dataType for f in src_snap.schema.fields}
        vtypes = self._types()
        drift = []
        for c in self.group_cols:
            if src_fields.get(c) != vtypes[c]:
                drift.append((c, vtypes[c], src_fields.get(c)))
        for out, fn, col in self.aggs:
            if col is None:
                continue
            st = src_fields.get(col)
            if fn == "approx_distinct":
                # sketch hashes the string cast of the value: int->long
                # widening keeps the same rendering, so no drift — unless
                # an exact-extrema auxiliary stores the value in its
                # create-time physical type (then widening would silently
                # narrow the multiset, exactly the trap this check exists
                # for); a dropped column always breaks the view
                if st is None:
                    drift.append((col, T.ArrayType(T.StringType()), None))
                elif col in self.aux and not any(
                    fn2 in ("min", "max") and c2 == col for _, fn2, c2 in self.aggs
                ):
                    aux_t = next(
                        f.dataType
                        for f in self.aux[col].current_snapshot().schema.fields
                        if f.name == col
                    )
                    if st != aux_t:
                        drift.append((col, aux_t, st))
                continue
            if fn == "histogram":
                # array<long> state is type-stable; drift only if the
                # column vanished, or exact-integer binning would now
                # truncate a widened non-integral source
                exact = len(self.hist_specs[out]) > 3 and self.hist_specs[out][3]
                if st is None or (exact and not isinstance(st, _INTEGRAL)):
                    drift.append((col, T.ArrayType(T.LongType()), st))
                continue
            if fn in ("sum", "avg", "var_pop", "stddev_pop"):
                want = (
                    T.DoubleType()
                    if fn == "avg" or not isinstance(st, _INTEGRAL)
                    else T.LongType()
                )
            else:
                want = st
            if want != vtypes[out]:
                drift.append((col, vtypes[out], st))
        if drift:
            detail = ", ".join(
                f"{c!r}: view stores {v.simpleString()}, source now {s.simpleString() if s else 'MISSING'}"
                for c, v, s in drift
            )
            raise ValueError(
                "source schema drifted under the view since create() — "
                f"refresh would silently narrow values ({detail}); recreate "
                "the view against the new source schema"
            )

    def _last_source_snapshot(self) -> int:
        for s in reversed(self.table.history()):
            if "mv_source_snapshot" in s.summary:
                return int(s.summary["mv_source_snapshot"])
        raise ValueError("view has no full build yet")

    def _next_epoch(self) -> int:
        for s in reversed(self.table.history()):
            if "epoch_id" in s.summary:
                return int(s.summary["epoch_id"]) + 1
        return 0

    def _recompute_read(self, src_snap, retr: DataFrame, n_retracted: int) -> DataFrame:
        """Source rows feeding the min/max retraction recompute, restricted
        as far as the physics allow.  Always a SUPERSET of the retracted
        groups' rows (the caller's null-safe semi-join makes it exact):

        * group col == source *layout key* (the per-domain rollup over a
          domain-laid-out table): bucket + zone-map file pruning via the
          point-lookup read path — O(retracted groups) files opened;
        * group col == source *primary key* on a relocating table:
          per-file PK bloom pruning;
        * anything else: the exact retracted set becomes an ``isin``
          parquet pushdown filter (cuts rows before the shuffle) but every
          base file may still be opened — column-pruned O(table) IO,
          O(retracted groups) shuffle;
        * more than RETRACTED_GROUPS_MAX retracted groups, or multi-column
          groups with nulls: the plain scan-plus-semi-join fallback.

        The bounded collect is over ``retr`` (already persisted via the
        delta plan), so it costs no extra source IO."""
        from tis_spark.lake.table import LakeTable as _LT

        gcols = self.group_cols
        full = self.source.read(snapshot_id=src_snap.snapshot_id)
        if n_retracted > RETRACTED_GROUPS_MAX:
            return full
        # retr rows are already one-per-group (delta is grouped on gcols)
        sample = retr.limit(RETRACTED_GROUPS_MAX + 1).collect()
        if len(sample) > RETRACTED_GROUPS_MAX:
            return full
        if len(gcols) == 1:
            g = gcols[0]
            vals = [r[0] for r in sample]
            nn_vals = [v for v in vals if v is not None]
            has_null = len(nn_vals) < len(vals)
            if not has_null and nn_vals:
                if g == _LT.layout_key(src_snap):
                    return self.source.read_layout_point_lookup(src_snap, g, nn_vals)
                if g == src_snap.key_cols[0] and src_snap.layout_col:
                    return self.source.read(
                        snapshot_id=src_snap.snapshot_id, pk_set=nn_vals
                    )
            cond = F.col(g).isin(nn_vals) if nn_vals else F.lit(False)
            if has_null:
                cond = cond | F.col(g).isNull()
            return full.filter(cond)
        # multi-column groups: per-column isin pushdown (superset; nulls
        # force that column's term open)
        conds = []
        for i, g in enumerate(gcols):
            vals = {r[i] for r in sample}
            nn_vals = [v for v in vals if v is not None]
            c = F.col(g).isin(nn_vals) if nn_vals else F.lit(False)
            if None in vals:
                c = c | F.col(g).isNull()
            conds.append(c)
        return full.filter(reduce(Column.__and__, conds))

    # ----------------------------------------- exact-extrema multiset aux

    def _aux_watermark(self, aux: LakeTable) -> int | None:
        for s in reversed(aux.history()):
            if "mv_source_snapshot" in s.summary:
                return int(s.summary["mv_source_snapshot"])
        return None

    @staticmethod
    def _aux_next_epoch(aux: LakeTable) -> int:
        for s in reversed(aux.history()):
            if "epoch_id" in s.summary:
                return int(s.summary["epoch_id"]) + 1
        return 0

    def _aux_full_build(self, aux: LakeTable, col: str, src_snap) -> None:
        """Bootstrap (or crash-heal) one multiset at ``src_snap`` — the
        only O(table) source pass this auxiliary ever costs."""
        tsnap = aux.current_snapshot()
        rows = (
            self.source.read(snapshot_id=src_snap.snapshot_id)
            .filter(F.col(col).isNotNull())
            .groupBy(*self.group_cols, col)
            .agg(F.count(F.lit(1)).cast("long").alias(AUX_N_COL))
        )
        snap = aux.current_snapshot()
        stamped = (
            rows.withColumn("_bucket", aux.bucket_expr())
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            # group-sorted bounded base files -> tight per-file zone maps,
            # so group-restricted reads (merge + recompute) prune files
            .repartition(snap.num_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", self.group_cols[0])
        )
        aux.commit(
            aux.write_data_files(
                stamped, kind="base", max_records_per_file=AUX_FILE_ROWS
            ),
            summary={"epoch_id": 0, "mv_source_snapshot": src_snap.snapshot_id},
            expected_snapshot_id=tsnap.snapshot_id,
        )

    def _refresh_aux(self, aux: LakeTable, col: str, src_snap, pinned=None) -> None:
        """Catch one multiset up to ``src_snap``: signed (group, value)
        multiplicity deltas from the preimage changelog, merged
        bucket-restricted — exactly the view's own count algebra (nulls
        are not tracked: min/max/KMV all ignore them).  Fenced and
        watermarked on the AUX's own snapshot chain, so a crash between
        the aux and view commits self-heals: each table catches up from
        its own watermark to the shared target, and aux state at snapshot
        S is a pure function of source state at S."""
        tsnap = aux.current_snapshot()
        last = self._aux_watermark(aux)
        if last is None:
            self._aux_full_build(aux, col, src_snap)
            return
        if src_snap.snapshot_id <= last:
            return
        gcols = self.group_cols
        ch = (
            pinned[1]
            if pinned is not None and pinned[2] == last
            else self.source.changes(last, src_snap.snapshot_id, with_preimage=True)
        )
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            ch.filter(F.col(col).isNotNull())
            .groupBy(*gcols, col)
            .agg(F.sum(sign).cast("long").alias("_d"))
            .filter(F.col("_d") != 0)  # value-preserving updates cancel out
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            epoch = self._aux_next_epoch(aux)
            # ONE bounded collect of the changed groups' leading values:
            # within the cap the merge's old read is a zone-map point
            # lookup into the group-sorted multiset (O(changed groups)
            # files — the superset is exact-ed by the left join below);
            # above it / with null groups, bucket-restricted fallback.
            g0 = gcols[0]
            sample = (
                delta.select(g0).distinct().limit(RETRACTED_GROUPS_MAX + 1).collect()
            )
            if not sample:
                aux.commit(
                    {},
                    summary={"epoch_id": epoch, "mv_source_snapshot": src_snap.snapshot_id},
                    expected_snapshot_id=tsnap.snapshot_id,
                )
                return
            vals = [r[0] for r in sample]
            if len(vals) <= RETRACTED_GROUPS_MAX and None not in vals:
                # the isin ALSO pushes to the parquet scan, so row-group
                # stats prune inside the zone-surviving files (the base is
                # group-sorted, so row groups have tight ranges too)
                old = aux.read_layout_point_lookup(
                    aux.current_snapshot(), g0, vals
                ).filter(F.col(g0).isin(vals))
            else:
                touched = sorted(
                    int(r["_b"])
                    for r in delta.select(aux.bucket_expr().alias("_b")).distinct().collect()
                )
                old = aux.read(buckets=touched)
            merged = delta.join(old, _null_safe_on(delta, old, gcols + [col]), "left")
            rows = merged.select(
                *[delta[c].alias(c) for c in gcols],
                delta[col].alias(col),
                (F.coalesce(old[AUX_N_COL], F.lit(0)) + delta["_d"]).alias(AUX_N_COL),
            )
            stamped = (
                rows.withColumn("_bucket", aux.bucket_expr())
                .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
                .withColumn(DEAD_COL, F.col(AUX_N_COL) <= 0)
            )
            aux.commit(
                aux.write_data_files(stamped, kind="delta"),
                summary={"epoch_id": epoch, "mv_source_snapshot": src_snap.snapshot_id},
                expected_snapshot_id=tsnap.snapshot_id,
            )
        finally:
            delta.unpersist()

    def _aux_rows_for_groups(self, aux: LakeTable, retr: DataFrame, sample) -> DataFrame:
        """Live multiset rows for the retracted groups.  The aux is
        clustered by the leading group column, so within the bounded
        sample the read is a bucket + zone-map point lookup —
        O(retracted groups) files by construction; above the cap (or
        with null groups) it degrades to an aux-table scan, still never
        the source.  Superset projection; callers semi-join exact."""
        gcols = self.group_cols
        if sample is not None:
            vals = list({r[0] for r in sample})
            nn = [v for v in vals if v is not None]
            if nn and None not in vals:
                return aux.read_layout_point_lookup(
                    aux.current_snapshot(), gcols[0], nn
                ).filter(F.col(gcols[0]).isin(nn))
            cond = F.col(gcols[0]).isin(nn) if nn else F.lit(False)
            if None in vals:
                cond = cond | F.col(gcols[0]).isNull()
            return aux.read().filter(cond)
        return aux.read()

    def _join_aux_recomputes(
        self, merged: DataFrame, delta: DataFrame, retr: DataFrame, n_retracted: int
    ) -> DataFrame:
        """Exact-extrema retraction path: left-join one ``_rec_<out>``
        column set per aux column onto ``merged``, each recomputed from
        the multiset instead of the source.  A group retracted to death
        has no live aux rows and lands null (tombstoned downstream)."""
        gcols = self.group_cols
        sample = None
        if n_retracted <= RETRACTED_GROUPS_MAX:
            s = retr.limit(RETRACTED_GROUPS_MAX + 1).collect()
            if len(s) <= RETRACTED_GROUPS_MAX:
                sample = s
        by_col: dict[str, list[tuple[str, str]]] = {}
        for out, fn, c in self.aggs:
            if fn in ("min", "max", "approx_distinct"):
                by_col.setdefault(c, []).append((out, fn))
        for c, outs in by_col.items():
            rows = self._aux_rows_for_groups(self.aux[c], retr, sample)
            rows = rows.join(retr, _null_safe_on(rows, retr, gcols), "left_semi")
            rex = [
                (F.min(c) if fn == "min" else F.max(c)).alias(f"_rec_{out}")
                for out, fn in outs
                if fn != "approx_distinct"
            ]
            piece = rows.groupBy(*gcols).agg(*rex) if rex else None
            for out, fn in outs:
                if fn != "approx_distinct":
                    continue
                name = f"_rec_{out}"
                sk = self._kmv_sketch(rows, c, name).select(
                    *[F.col(g).alias(f"_skg_{g}") for g in gcols], name
                )
                if piece is None:
                    piece = sk.select(
                        *[F.col(f"_skg_{g}").alias(g) for g in gcols], name
                    )
                else:
                    cond = reduce(
                        Column.__and__,
                        [piece[g].eqNullSafe(sk[f"_skg_{g}"]) for g in gcols],
                    )
                    piece = piece.join(sk, cond, "left").select(
                        *[piece[x] for x in piece.columns], F.col(name)
                    )
            pr = piece.select(
                *[F.col(g).alias(f"_pg_{g}") for g in gcols],
                *[x for x in piece.columns if x not in gcols],
            )
            cond = reduce(
                Column.__and__,
                [delta[g].eqNullSafe(pr[f"_pg_{g}"]) for g in gcols],
            )
            merged = merged.join(pr, cond, "left").drop(
                *[f"_pg_{g}" for g in gcols]
            )
        return merged

    # ------------------------------------------------------------ full build

    def full_build(self) -> None:
        """One aggregate pass over the source's current snapshot; base
        rows stamp ``_commit = -1`` per lake convention."""
        tsnap = self.table.current_snapshot()
        src_snap = self.source.current_snapshot()
        self._check_schema_drift(src_snap)
        src_rows = self.source.read(snapshot_id=src_snap.snapshot_id)
        agg = src_rows.groupBy(*self.group_cols).agg(*self._agg_exprs())
        agg = self._join_sketches(agg, src_rows)
        stamped = (
            agg.withColumn("_bucket", self.table.bucket_expr())
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
        )
        files = self.table.write_data_files(stamped, kind="base")
        self.table.commit(
            files,
            summary={"epoch_id": 0, "mv_source_snapshot": src_snap.snapshot_id},
            expected_snapshot_id=tsnap.snapshot_id,
        )
        for c, aux in self.aux.items():
            if self._aux_watermark(aux) is None:
                self._aux_full_build(aux, c, src_snap)

    # --------------------------------------------------------------- refresh

    def compact(self, max_records_per_file: int = 0) -> None:
        """Fold the view's accumulated refresh deltas into a fresh sorted
        base generation (generic lake compaction — a long-running stream
        appends one delta file set per refresh, and read cost degrades
        with delta count).  A compaction commit carries no source
        watermark, so the refresh chain is unaffected."""
        self.table.compact_all(max_records_per_file)
        for aux in self.aux.values():
            # keep aux base files bounded even when the view compacts
            # unbounded: tight zone maps are what the multiset is FOR
            aux.compact_all(max_records_per_file or AUX_FILE_ROWS)

    def expire_snapshots(self, keep_last: int = 10, dry_run: bool = False) -> dict:
        """Lake GC over the view AND its exact-extrema auxiliaries (a
        long-running stream otherwise grows one snapshot per refresh in
        each).  Watermark-safe: every refresh commit carries ``epoch_id``
        together with ``mv_source_snapshot``, and the newest ``epoch_id``
        carrier is always retained by ``LakeTable.expire_snapshots``."""
        report = {"view": self.table.expire_snapshots(keep_last, dry_run=dry_run)}
        for c, aux in self.aux.items():
            report[f"aux_{c}"] = aux.expire_snapshots(keep_last, dry_run=dry_run)
        return report

    def refresh(self, compact_every: int | None = None, _pinned=None) -> dict:
        """Catch the view up to the source's current snapshot from the
        preimage changelog.  Returns maintenance stats.  Exactly-once: the
        commit carries the source snapshot watermark and is fenced on the
        view snapshot this refresh read (a concurrent refresh loses with
        ``CommitConflict``); re-running after success is a no-op.
        ``compact_every=N`` folds the view's deltas into a fresh base
        every N refresh epochs (file-count hygiene for unbounded
        streams).  ``_pinned`` is ``refresh_views``'s internal handle: a
        ``(src_snap, changelog_df, window_start)`` triple that pins the
        window end and substitutes an already-persisted changelog for this
        view's own ``changes()`` read; ``window_start`` must equal this
        view's watermark or the handle is ignored and the view reads
        privately — a view ahead of or behind the shared window must not
        consume it."""
        tsnap = self.table.current_snapshot()
        last_src = self._last_source_snapshot()
        if _pinned is not None and _pinned[2] != last_src:
            # shared window starts elsewhere than this view's watermark:
            # fall back to a private read rather than mis-apply deltas
            _pinned = None
        src_snap = _pinned[0] if _pinned is not None else self.source.current_snapshot()
        if src_snap.snapshot_id <= last_src:
            return {"groups": 0, "epoch": None, "up_to_date": True}
        self._check_schema_drift(src_snap)
        epoch = self._next_epoch()
        gcols = self.group_cols
        types = self._types()
        ch = (
            _pinned[1]
            if _pinned is not None
            else self.source.changes(last_src, src_snap.snapshot_id, with_preimage=True)
        )
        # exact-extrema auxiliaries catch up FIRST (the retraction branch
        # reads them at src_snap); one persisted changelog feeds them and
        # the view delta alike.  Only persist what we created — a _pinned
        # handle is already persisted by refresh_views.
        own_persist = bool(self.aux) and _pinned is None
        if own_persist:
            ch = ch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            for c, aux in self.aux.items():
                self._refresh_aux(aux, c, src_snap, pinned=(src_snap, ch, last_src))
        except BaseException:
            if own_persist:
                ch.unpersist()
            raise
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        dexprs = [F.sum(sign).cast("long").alias("_d_n")]
        has_extrema = False
        for out, fn, col in self.aggs:
            if fn in ("sum", "avg"):
                st = types[out]
                v = F.col(col).cast(st)
                dexprs.append(
                    F.coalesce(
                        F.sum(F.when(v.isNotNull(), sign.cast(st) * v)), F.lit(0).cast(st)
                    ).alias(f"_d_{out}")
                )
                dexprs.append(
                    F.coalesce(F.sum(F.when(F.col(col).isNotNull(), sign)), F.lit(0))
                    .cast("long")
                    .alias(f"_dn_{out}")
                )
            elif fn in ("var_pop", "stddev_pop"):
                st = types[out]
                v = F.col(col).cast(st)
                dexprs.append(
                    F.coalesce(
                        F.sum(F.when(v.isNotNull(), sign.cast(st) * v * v)),
                        F.lit(0).cast(st),
                    ).alias(f"_d_{out}")
                )
                dexprs.append(
                    F.coalesce(
                        F.sum(F.when(v.isNotNull(), sign.cast(st) * v)), F.lit(0).cast(st)
                    ).alias(f"_d1_{out}")
                )
                dexprs.append(
                    F.coalesce(F.sum(F.when(F.col(col).isNotNull(), sign)), F.lit(0))
                    .cast("long")
                    .alias(f"_dn_{out}")
                )
            elif fn == "histogram":
                dexprs.append(self._hist_array(col, out, sign, alias=f"_d_{out}"))
            elif fn == "min":
                has_extrema = True
                dexprs.append(F.min(F.when(sign > 0, F.col(col))).alias(f"_ins_{out}"))
            elif fn == "max":
                has_extrema = True
                dexprs.append(F.max(F.when(sign > 0, F.col(col))).alias(f"_ins_{out}"))
            elif fn == "approx_distinct":
                # the batch's min-k over gained rows joins in below (the
                # sketch is helper-built, not an agg expr); a retraction
                # may remove a sketched value -> recompute like min/max
                has_extrema = True
        dexprs.append(F.max(F.when(sign < 0, F.lit(1)).otherwise(F.lit(0))).alias("_retr"))
        delta = ch.groupBy(*gcols).agg(*dexprs)
        if any(fn == "approx_distinct" for _, fn, _ in self.aggs):
            gain = F.col("_change_type").isin("insert", "update_postimage")
            # a retracted group's sketch is recomputed below regardless, so
            # its gain-merge sketch would be discarded — anti-join the
            # gained rows against groups with any retraction first, so the
            # Arrow partial-min-k + rank only run where the result is used
            # (an update-heavy window would otherwise sketch everything
            # twice)
            retr_g = (
                ch.filter(~gain)
                .select(*[F.col(c).alias(f"_rg_{c}") for c in gcols])
                .distinct()
            )
            gained = ch.filter(gain)
            cond = reduce(
                Column.__and__,
                [gained[c].eqNullSafe(retr_g[f"_rg_{c}"]) for c in gcols],
            )
            gained_rows = gained.join(retr_g, cond, "left_anti")
            delta = self._join_sketches(delta, gained_rows, rename=lambda o: f"_ins_{o}")
        delta = delta.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # touched buckets + group count + retraction presence: ONE
            # action over <= num_buckets rows
            binfo = (
                delta.groupBy(self.table.bucket_expr().alias("_b"))
                .agg(
                    F.count(F.lit(1)).alias("count"),
                    F.sum("_retr").cast("long").alias("_retr_n"),
                )
                .collect()
            )
            if not binfo:
                # metadata-only watermark advance (e.g. only a compaction
                # or DDL moved the source snapshot)
                self.table.commit(
                    {},
                    summary={"epoch_id": epoch, "mv_source_snapshot": src_snap.snapshot_id},
                    expected_snapshot_id=tsnap.snapshot_id,
                )
                return {"groups": 0, "epoch": epoch, "up_to_date": False}
            touched = sorted(int(r["_b"]) for r in binfo)
            n_groups = sum(r["count"] for r in binfo)
            n_retracted = sum(r["_retr_n"] or 0 for r in binfo)

            old = self.table.read(buckets=touched)
            merged = delta.join(old, _null_safe_on(delta, old, gcols), "left")
            retracting = has_extrema and n_retracted > 0
            if retracting:
                # retracted groups: the stored extremum may have left —
                # recompute them, restricted to exactly those groups.
                # With exact_extrema auxiliaries the recompute reads the
                # group-clustered multiset (file-pruned by construction,
                # zero source IO); otherwise it reads the source snapshot,
                # file-pruned when the group is the source's layout key /
                # PK (see _recompute_read).  Insert-only refreshes never
                # reach here at all.
                retr = delta.filter(F.col("_retr") == 1).select(*gcols)
                if self.aux:
                    merged = self._join_aux_recomputes(merged, delta, retr, n_retracted)
                else:
                    src_rows = self._recompute_read(src_snap, retr, n_retracted)
                    src_sem = src_rows.join(
                        retr, _null_safe_on(src_rows, retr, gcols), "left_semi"
                    )
                    rex = [
                        (F.min(col) if fn == "min" else F.max(col)).alias(f"_rec_{out}")
                        for out, fn, col in self.aggs
                        if fn in ("min", "max")
                    ]
                    rec = (
                        src_sem.groupBy(*gcols).agg(*rex)
                        if rex
                        else src_sem.select(*gcols).distinct()
                    )
                    rec = self._join_sketches(rec, src_sem, rename=lambda o: f"_rec_{o}")
                    merged = merged.join(rec, _null_safe_on(delta, rec, gcols), "left")

            new_n = (F.coalesce(old[N_COL], F.lit(0)) + delta["_d_n"]).alias(N_COL)
            out_cols: list[Column] = [delta[c].alias(c) for c in gcols] + [new_n]
            for out, fn, col in self.aggs:
                if fn == "count":
                    out_cols.append(
                        (F.coalesce(old[N_COL], F.lit(0)) + delta["_d_n"]).alias(out)
                    )
                elif fn in ("sum", "avg"):
                    st = types[out]
                    out_cols.append(
                        (F.coalesce(old[out], F.lit(0).cast(st)) + delta[f"_d_{out}"]).alias(out)
                    )
                    out_cols.append(
                        (F.coalesce(old[_nn(out)], F.lit(0)) + delta[f"_dn_{out}"]).alias(_nn(out))
                    )
                elif fn in ("var_pop", "stddev_pop"):
                    st = types[out]
                    out_cols.append(
                        (F.coalesce(old[out], F.lit(0).cast(st)) + delta[f"_d_{out}"]).alias(out)
                    )
                    out_cols.append(
                        (
                            F.coalesce(old[_s1(out)], F.lit(0).cast(st)) + delta[f"_d1_{out}"]
                        ).alias(_s1(out))
                    )
                    out_cols.append(
                        (F.coalesce(old[_nn(out)], F.lit(0)) + delta[f"_dn_{out}"]).alias(_nn(out))
                    )
                elif fn == "histogram":
                    nb = int(self.hist_specs[out][2])
                    zeros = F.array_repeat(F.lit(0).cast("long"), nb)
                    out_cols.append(
                        F.zip_with(
                            F.coalesce(old[out], zeros),
                            delta[f"_d_{out}"],
                            lambda a, b: a + b,
                        ).alias(out)
                    )
                elif fn == "approx_distinct":
                    empty = F.array().cast("array<string>")
                    gained = F.slice(
                        F.array_sort(
                            F.array_union(
                                F.coalesce(old[out], empty),
                                F.coalesce(delta[f"_ins_{out}"], empty),
                            )
                        ),
                        1,
                        self.kmv_k,
                    )
                    if not retracting:
                        out_cols.append(gained.alias(out))
                    else:
                        out_cols.append(
                            F.when(
                                delta["_retr"] == 1,
                                F.coalesce(F.col(f"_rec_{out}"), empty),
                            )
                            .otherwise(gained)
                            .alias(out)
                        )
                else:
                    gained = (
                        F.least(old[out], delta[f"_ins_{out}"])
                        if fn == "min"
                        else F.greatest(old[out], delta[f"_ins_{out}"])
                    )
                    if not retracting:
                        # no retraction this refresh: pure gain path
                        out_cols.append(gained.alias(out))
                    else:
                        out_cols.append(
                            F.when(delta["_retr"] == 1, F.col(f"_rec_{out}"))
                            .otherwise(gained)
                            .alias(out)
                        )
            rows = merged.select(*out_cols)
            stamped = (
                rows.withColumn("_bucket", self.table.bucket_expr())
                .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
                .withColumn(DEAD_COL, F.col(N_COL) <= 0)
            )
            files = self.table.write_data_files(stamped, kind="delta")
            self.table.commit(
                files,
                summary={"epoch_id": epoch, "mv_source_snapshot": src_snap.snapshot_id},
                expected_snapshot_id=tsnap.snapshot_id,
            )
            if compact_every and epoch % compact_every == 0:
                self.compact()
            return {"groups": int(n_groups), "epoch": epoch, "up_to_date": False}
        finally:
            delta.unpersist()
            if own_persist:
                ch.unpersist()

    # ----------------------------------------------------------------- read

    def read_topk_values(self, col: str, k: int, groups: list | None = None) -> DataFrame:
        """Per-group top-``k`` most frequent live values of ``col`` —
        EXACT heavy hitters, derived entirely from the exact-extrema
        multiset auxiliary (requires ``exact_extrema=True`` at
        ``create()`` and a min/max/approx_distinct agg over ``col`` so
        the multiset exists).  Ties break by value ascending, so the
        result is deterministic across engines and cluster sizes.

        Scale shape: the multiset is the maintained state — one row per
        live (group, value), count-delta-maintained from the changelog —
        so this read shuffles O(distinct (group, value)) multiplicity
        rows into a per-group window and never touches the source.
        ``groups`` restricts to specific leading-group values through the
        aux's bucket + zone-map point-lookup path (the multiset is
        CLUSTERED by the leading group column), so the serving question
        "top values for THIS domain" opens O(wanted groups) files, not
        the whole state.  The reference exposes value frequencies only
        via Solr faceting over a fully rebuilt index (tis-index-builder);
        here they ride the same O(changed keys) refresh as the view."""
        if col not in self.aux:
            raise ValueError(
                f"no multiset auxiliary for {col!r} — create the view with "
                f"exact_extrema=True and a min/max/approx_distinct agg over "
                f"it (have: {sorted(self.aux)})"
            )
        aux = self.aux[col]
        if groups is not None:
            g0 = self.group_cols[0]
            nn = [g for g in groups if g is not None]
            if len(nn) < len(groups):
                # null group wanted: the point lookup is a SUPERSET
                # projection that may already contain null-group rows
                # (they share files with looked-up groups), so a union
                # would rank duplicates — degrade to the filtered full
                # scan, exactly like _aux_rows_for_groups
                cond = F.col(g0).isin(nn) if nn else F.lit(False)
                rows = aux.read().filter(cond | F.col(g0).isNull())
            elif nn:
                rows = aux.read_layout_point_lookup(
                    aux.current_snapshot(), g0, nn
                ).filter(F.col(g0).isin(nn))
            else:
                rows = aux.read().limit(0)
            live = rows.filter(F.col(AUX_N_COL) > 0)
        else:
            live = aux.read().filter(F.col(AUX_N_COL) > 0)
        w = Window.partitionBy(*self.group_cols).orderBy(
            F.desc(AUX_N_COL), F.asc(col)
        )
        return (
            live.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .select(
                *self.group_cols,
                col,
                F.col(AUX_N_COL).cast("long").alias("freq"),
                F.col("_rk").cast("long").alias("rank"),
            )
        )

    def read_histogram(self, out: str) -> DataFrame:
        """Exploded view of one maintained histogram: (group cols, bin,
        cnt) for non-empty bins — O(groups x n_bins) rows of maintained
        state, never a source read."""
        assert out in self.hist_specs, f"{out!r} is not a histogram agg"
        return (
            self.table.read()
            .select(*self.group_cols, F.posexplode(out).alias("bin", "cnt"))
            .filter(F.col("cnt") != 0)
            .withColumn("bin", F.col("bin").cast("long"))
        )

    def read_quantile_bins(
        self, out: str, qs: dict[str, tuple[int, int]], groups: list | None = None
    ) -> DataFrame:
        """Per-group quantile BIN INDEXES derived from one maintained
        histogram — ``qs`` maps output name -> (num, den), e.g.
        ``{"p50": (1, 2), "p99": (99, 100)}``.  The q-quantile bin is the
        smallest bin whose cumulative count reaches ceil(q * n) — pure
        int64 arithmetic over the maintained per-bin counts (cum*den >=
        n*num avoids any division), so results tie bit-for-bit across
        engines.  A group with no binned values (all nulls) reports NULL
        quantiles and n_vals = 0.

        Scale shape: O(groups x n_bins) maintained rows through one
        per-group window — the source is never read; percentile tracking
        rides the view's O(changed keys) refresh.  ``groups`` restricts
        to specific leading-group values through the view table's bucket
        + zone-map point lookup (the view is clustered by its leading
        group column), so "p99 for THIS domain" opens O(wanted groups)
        files.  The reference has no incremental analog (Solr percentile
        facets re-scan the rebuilt index)."""
        assert out in self.hist_specs, f"{out!r} is not a histogram agg"
        for name, (num, den) in qs.items():
            assert isinstance(num, int) and isinstance(den, int), (name, num, den)
            assert 0 < num <= den, (name, num, den)
        gcols = self.group_cols
        view = self.table.read()
        if groups is not None:
            g0 = gcols[0]
            nn = [g for g in groups if g is not None]
            if len(nn) < len(groups):
                # null group wanted: filtered scan (point-lookup supersets
                # may carry null rows; same policy as read_topk_values)
                cond = F.col(g0).isin(nn) if nn else F.lit(False)
                view = view.filter(cond | F.col(g0).isNull())
            elif nn:
                view = self.table.read_layout_point_lookup(
                    self.table.current_snapshot(), g0, nn
                ).filter(F.col(g0).isin(nn))
            else:
                view = view.limit(0)
        rows = view.select(*gcols, F.posexplode(out).alias("bin", "cnt"))
        wcum = (
            Window.partitionBy(*gcols)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy(*gcols)
        rows = rows.withColumn("_cum", F.sum("cnt").over(wcum)).withColumn(
            "_n", F.sum("cnt").over(wall)
        )
        aggs = [
            F.min(
                F.when(
                    (F.col("_n") > 0) & (F.col("_cum") * den >= F.col("_n") * num),
                    F.col("bin"),
                )
            )
            .cast("long")
            .alias(name)
            for name, (num, den) in qs.items()
        ]
        return rows.groupBy(*gcols).agg(
            F.max("_n").cast("long").alias("n_vals"), *aggs
        )

    def read(self, with_internal: bool = False) -> DataFrame:
        """Current view state: group cols + aggregate outputs.  Sums whose
        group holds only nulls expose SQL's NULL (the maintained raw sum is
        0-based; the non-null count gates it)."""
        df = self.table.read()
        if with_internal:
            return df
        cols = [F.col(c) for c in self.group_cols]
        for out, fn, col in self.aggs:
            if fn == "sum":
                cols.append(F.when(F.col(_nn(out)) > 0, F.col(out)).alias(out))
            elif fn == "avg":
                cols.append(
                    F.when(F.col(_nn(out)) > 0, F.col(out) / F.col(_nn(out))).alias(out)
                )
            elif fn in ("var_pop", "stddev_pop"):
                # var = (s2 - s1^2/n)/n; exact for integral state, clamped
                # at 0 against float cancellation for double state
                nn = F.col(_nn(out)).cast("double")
                s1 = F.col(_s1(out)).cast("double")
                s2 = F.col(out).cast("double")
                var = F.greatest(F.lit(0.0), (s2 - s1 * s1 / nn) / nn)
                cols.append(
                    F.when(
                        F.col(_nn(out)) > 0,
                        F.sqrt(var) if fn == "stddev_pop" else var,
                    ).alias(out)
                )
            elif fn == "approx_distinct":
                # exact below k (the sketch holds every distinct hash);
                # above, the classic KMV estimator (k-1)/kth-as-fraction
                k = self.kmv_k
                sz = F.size(F.col(out))
                kth = F.element_at(F.col(out), k)
                frac = F.conv(F.substring(kth, 1, 15), 16, 10).cast("double") / F.lit(
                    float(16**15)
                )
                cols.append(
                    F.when(sz < k, sz.cast("long"))
                    .otherwise(F.round((k - 1) / frac).cast("long"))
                    .alias(out)
                )
            else:
                cols.append(F.col(out))
        return df.select(*cols)


def refresh_views(views: list, compact_every: int | None = None) -> list[dict]:
    """Refresh many changelog consumers with ONE read per (source, window).

    Views attached to the same stream share a source and advance their
    watermarks in lockstep, so per-batch maintenance of N views would
    otherwise read the identical ``changes()`` window N times — at scale
    that is N scans of the window's delta files (and, with preimages, N
    key-restricted old-snapshot reads).  Here views are grouped by
    (source path, watermark); each group's changelog is computed once,
    persisted, and handed to every member's :meth:`MaterializedView.refresh`
    via the pinned-window handle.  Exactly-once is untouched: every view
    still fences on its own snapshot and records its own watermark, and a
    view whose watermark disagrees with its group (attached mid-stream,
    or a partial failure last batch) silently takes the private-read path
    inside ``refresh`` rather than consuming a mismatched window.

    SYNC-style consumers (``lake.replica.TableReplica``,
    ``lake.derived.DerivedIndex`` — anything with ``.sync()`` instead of
    ``.refresh()``) ride the same hook: they group separately on the
    cheaper ``classify=False`` feed (no old-snapshot read), shared the
    same way.  A layout-clustered replica consumes its private preimage
    feed inside ``sync`` regardless (see lake/replica.py).

    Returns per-consumer stats in input order.
    """
    stats: dict[int, dict] = {}
    groups: dict[tuple, list[tuple[int, "MaterializedView"]]] = {}
    sync_groups: dict[tuple, list] = {}
    for i, v in enumerate(views):
        key = (v.source.path, v._last_source_snapshot())
        if hasattr(v, "refresh"):
            groups.setdefault(key, []).append((i, v))
        else:
            sync_groups.setdefault(key, []).append((i, v))
    for (path, lo), members in sync_groups.items():
        if len(members) == 1:
            i, v = members[0]
            stats[i] = v.sync()
            continue
        src = members[0][1].source
        snap = src.current_snapshot()
        if snap.snapshot_id <= lo:
            for i, v in members:
                stats[i] = v.sync()
            continue
        ch = src.changes(lo, snap.snapshot_id, classify=False).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            for i, v in members:
                stats[i] = v.sync(_pinned=(snap, ch, lo))
        finally:
            ch.unpersist(blocking=False)
    for (path, lo), members in groups.items():
        if len(members) == 1:
            i, v = members[0]
            stats[i] = v.refresh(compact_every)
            continue
        src = members[0][1].source
        snap = src.current_snapshot()
        if snap.snapshot_id <= lo:
            for i, v in members:
                stats[i] = v.refresh(compact_every)
            continue
        ch = src.changes(lo, snap.snapshot_id, with_preimage=True).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            for i, v in members:
                stats[i] = v.refresh(compact_every, _pinned=(snap, ch, lo))
        finally:
            ch.unpersist(blocking=False)
    return [stats[i] for i in range(len(views))]
