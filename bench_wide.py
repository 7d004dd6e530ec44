"""Wide-row maintenance scaling bench: per-epoch cost vs star size.

Demonstrates that the incremental wide-row engine's per-epoch cost is
governed by the batch (affected keys), not the table: the restricted
primary slice is zone-map-pruned to the batch's key ranges, child
tables are FK-clustered (fk_layout) so the phase-3 FK restriction
bucket/zone-prunes too, and PK point lookups on those children (phase-1
LWW merge, chain climbs) prune via per-file PK blooms.  The
``pruned_pk_layout`` mode isolates what the FK clustering itself buys:
pruning on, but children laid out by their own PK, so FK-restricted
reads fall back to scans.

Method: full-build totalpay stars of increasing primary-row counts,
replay identical fixed-size change epochs, measure per-epoch wall with
zone pruning on (lookup_keys_max=100k) vs off (0).

Usage: python bench_wide.py  [sizes via SPARK_GRAFT_WIDE_SIZES, default
"10000,40000,160000"; epoch events via SPARK_GRAFT_WIDE_EPOCH=100]
Appends a markdown table to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from tis_spark.fixtures.star import (  # noqa: E402
    gen_star_changes,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.session import get_spark  # noqa: E402
from tis_spark.wide import WideRowPipeline  # noqa: E402
from tis_spark.wide.totalpay import totalpay_wide  # noqa: E402

SIZES = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_WIDE_SIZES", "10000,40000,160000"
).split(",")]
EPOCH_EVENTS = int(os.environ.get("SPARK_GRAFT_WIDE_EPOCH", "100"))
EPOCHS = 3
FILE_ROWS = int(os.environ.get("SPARK_GRAFT_WIDE_FILE_ROWS", "500"))


def run_size(spark, n_primary):
    out = {"primary_rows": n_primary, "epoch_events": EPOCH_EVENTS}
    n_events = EPOCH_EVENTS * EPOCHS
    # pruned        = FK-clustered children + zone/bloom pruning (production)
    # pruned_pk_lay = pruning on, but children clustered by their own PK —
    #                 isolates what the FK layout itself buys
    # full_scan     = no pruning at all
    modes = (
        ("pruned", 100_000, True),
        ("pruned_pk_layout", 100_000, False),
        ("full_scan", 0, True),
    )
    for mode, keys_max, fk_layout in modes:
        workdir = tempfile.mkdtemp(prefix="tis-widebench-")
        pipe = WideRowPipeline(
            spark,
            workdir,
            totalpay_spec(),
            totalpay_wide,
            lookup_keys_max=keys_max,
            base_file_rows=FILE_ROWS,
            fk_layout=fk_layout,
        )
        pipe.full_build(initial_tables_spark(spark, n_primary))
        changes = gen_star_changes(
            spark, n_events, n_primary, seed=42, epoch_size=EPOCH_EVENTS
        ).persist()
        changes.count()
        walls = []
        stats = None
        for ep in range(EPOCHS):
            batch = changes.filter(
                (changes.seq >= ep * EPOCH_EVENTS + 1)
                & (changes.seq <= (ep + 1) * EPOCH_EVENTS)
            )
            t0 = time.time()
            stats = pipe.process_epoch(batch, ep + 1)
            walls.append(time.time() - t0)
        out[f"epoch_wall_{mode}"] = round(min(walls), 3)
        if mode == "pruned":
            out["n_affected"] = stats["n_affected"]
            ps = pipe.prune_stats.get(pipe.sources[pipe.spec.primary].path, {})
            out["files_hit"] = ps.get("files_hit")
            out["files_total"] = ps.get("files_total")
            cs = pipe.prune_stats.get(pipe.sources["payinfo"].path, {})
            out["child_files_hit"] = cs.get("files_hit")
            out["child_files_total"] = cs.get("files_total")
        changes.unpersist()
        shutil.rmtree(workdir, ignore_errors=True)
    return out


def main():
    spark = get_spark("tis-wide-bench", master="local[16]", shuffle_partitions=16)
    results = [run_size(spark, n) for n in SIZES]
    spark.stop()
    print(json.dumps({
        "metric": "per-epoch wide-row maintenance cost vs star size",
        "epoch_events": EPOCH_EVENTS, "file_rows": FILE_ROWS, "results": results,
    }))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n### Wide-row epoch cost vs star size (zone-map pruning)\n\n")
        f.write(
            f"{EPOCH_EVENTS} events/epoch, base files of {FILE_ROWS} rows, "
            f"best of {EPOCHS} epochs.\n\n"
        )
        f.write(
            "| primary rows | affected keys | primary files hit/total "
            "| payinfo files hit/total | epoch wall pruned (s) "
            "| epoch wall PK-layout pruned (s) | epoch wall full-scan (s) |\n"
        )
        f.write("|---|---|---|---|---|---|---|\n")
        for r in results:
            f.write(
                f"| {r['primary_rows']:,} | {r.get('n_affected','-')} "
                f"| {r.get('files_hit','-')}/{r.get('files_total','-')} "
                f"| {r.get('child_files_hit','-')}/{r.get('child_files_total','-')} "
                f"| {r['epoch_wall_pruned']} | {r.get('epoch_wall_pruned_pk_layout','-')} "
                f"| {r['epoch_wall_full_scan']} |\n"
            )


if __name__ == "__main__":
    main()
