"""Wide-row maintenance scaling bench: per-epoch cost vs star size.

Demonstrates that the incremental wide-row engine's per-epoch cost is
governed by the batch (affected keys), not the table: PK-keyed stored
reads (phase-1 LWW lookups, the restricted primary slice, multi-hop
routing climbs) are zone-map-pruned to the batch's key ranges, so their
scan cost stays ~flat as the star grows.  Child tables restricted BY FK
still scan (see WideRowPipeline._pruned_read) — their column-pruned
scan is the expected residual growth term.

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
    for mode, keys_max in (("pruned", 100_000), ("full_scan", 0)):
        workdir = tempfile.mkdtemp(prefix="tis-widebench-")
        pipe = WideRowPipeline(
            spark,
            workdir,
            totalpay_spec(),
            totalpay_wide,
            lookup_keys_max=keys_max,
            base_file_rows=FILE_ROWS,
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
            "| epoch wall pruned (s) | epoch wall full-scan (s) |\n"
        )
        f.write("|---|---|---|---|---|\n")
        for r in results:
            f.write(
                f"| {r['primary_rows']:,} | {r.get('n_affected','-')} "
                f"| {r.get('files_hit','-')}/{r.get('files_total','-')} "
                f"| {r['epoch_wall_pruned']} | {r['epoch_wall_full_scan']} |\n"
            )


if __name__ == "__main__":
    main()
