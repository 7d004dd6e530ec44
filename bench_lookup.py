"""Stored-lookup scaling bench: per-epoch cost vs table size.

Demonstrates that zone-map file pruning makes the merge path's stored-row
lookup sublinear in table size for trigger-sized batches (VERDICT r1
"What's wrong #2": the lookup used to re-scan every touched bucket's base
in full each epoch — O(table)).

Method: full-build light pages tables of increasing row counts (tiny html
so the build is cheap; the lookup reads scalar columns either way), then
apply identical K-key update epochs and measure (a) base files scanned
after zone pruning vs total, and (b) epoch wall, with pruning on vs off.
Expected: scanned files ~= K (one sorted file per key) regardless of
table rows; the off-switch scan grows linearly with the table.

Usage: python bench_lookup.py  [table sizes via SPARK_GRAFT_LOOKUP_SIZES,
default "1000000,4000000,16000000"; K via SPARK_GRAFT_LOOKUP_KEYS=500]
Appends a markdown table to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tis_spark.cdc import CdcConfig, CdcIngest  # noqa: E402
from tis_spark.fixtures.gen import CHANGE_SCHEMA, PAGE_SCHEMA, mix64  # noqa: E402
from tis_spark.lake.table import prune_entries_by_keys  # noqa: E402
from tis_spark.session import get_spark  # noqa: E402

SIZES = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_LOOKUP_SIZES", "1000000,4000000,16000000"
).split(",")]
K = int(os.environ.get("SPARK_GRAFT_LOOKUP_KEYS", "500"))
FILE_ROWS = int(os.environ.get("SPARK_GRAFT_LOOKUP_FILE_ROWS", "4000"))
EPOCHS = 3


def light_pages(spark, n):
    """Minimal pages rows (tiny html): the lookup reads scalars only, so
    payload size is irrelevant to what is being measured."""
    def gen(it):
        for pdf in it:
            j = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "url": [f"https://d{int(x) % 997}.example.org/p{int(x)}" for x in j],
                    "warc_ts": pd.to_datetime(1_704_067_200_000 + j * 10, unit="ms", utc=True),
                    "html": [b"<html><head><title>x</title></head><body><p>y</p></body></html>"] * len(j),
                    "text": ["x\ny"] * len(j),
                    "lang": ["en"] * len(j),
                }
            )

    return spark.range(0, n, numPartitions=32).mapInPandas(gen, schema=PAGE_SCHEMA)


def update_epoch(spark, n_table, epoch, k=K):
    """K update events against existing urls, versions above everything."""
    h = mix64(np.arange(k, dtype=np.uint64) + np.uint64(epoch * 1_000_003), 5)
    targets = (h % np.uint64(n_table)).astype(np.int64)
    seqs = epoch * k + np.arange(k) + 1
    ts = pd.to_datetime(1_790_000_000_000 + seqs * 1000, unit="ms", utc=True)
    rows = []
    for i in range(k):
        j = int(targets[i])
        url = f"https://d{j % 997}.example.org/p{j}"
        after = {
            "url": url,
            "warc_ts": ts[i],
            "html": b"<html><head><title>u</title></head><body><p>z</p></body></html>",
            "lang": "en",
            "fetch_status": None,
            "score": None,
        }
        before = dict(after)
        before["warc_ts"] = ts[i] - pd.Timedelta(seconds=5)
        before["lang"] = "de"
        rows.append(
            {
                "seq": int(seqs[i]),
                "delivery_key": int(seqs[i]),
                "op": "U",
                "ts_ms": ts[i],
                "table": "pages",
                "schema_version": 1,
                "ddl": None,
                "before": before,
                "after": after,
                "epoch_hint": epoch,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=CHANGE_SCHEMA)


def files_scanned(ingest, changes):
    """Driver-side what-if: base files surviving zone pruning for this
    batch's keys (the exact logic LakeTable.read(key_set=...) applies)."""
    snap = ingest.table.current_snapshot()
    rows = (
        changes.select(F.col("after.url").alias("url"))
        .distinct()
        .select(ingest.table.bucket_expr("url").alias("_b"), F.col("url").alias("u"))
        .collect()
    )
    by_bucket: dict[str, list] = {}
    for r in rows:
        by_bucket.setdefault(str(r["_b"]), []).append(r["u"])
    total = hit = 0
    for b, entries in snap.files.items():
        base = [e for e in entries if e.get("kind") == "base"]
        total += len(base)
        hit += len(prune_entries_by_keys(base, by_bucket.get(b, [])))
    return hit, total


def run_size(spark, n_rows):
    out = {"table_rows": n_rows, "epoch_keys": K}
    for mode, keys_max in (("pruned", 100_000), ("full_scan", 0)):
        workdir = tempfile.mkdtemp(prefix="tis-lookup-")
        cfg = CdcConfig(
            fold_parallelism=32,
            disorder_window=0,
            lookup_keys_max=keys_max,
            compact_max_records_per_file=FILE_ROWS,
        )
        ing = CdcIngest(spark, os.path.join(workdir, "pages"), cfg)
        ing.full_build(light_pages(spark, n_rows))
        walls = []
        for ep in range(EPOCHS):
            ch = update_epoch(spark, n_rows, ep).cache()
            ch.count()
            if mode == "pruned" and ep == 0:
                hit, total = files_scanned(ing, ch)
                out["files_hit"], out["files_total"] = hit, total
            t0 = time.time()
            ing.process_epoch(ch, ep, final_flush=True)
            walls.append(time.time() - t0)
            ch.unpersist()
        out[f"epoch_wall_{mode}"] = round(min(walls), 3)
        shutil.rmtree(workdir, ignore_errors=True)
    return out


def main():
    spark = get_spark("tis-lookup-bench", master="local[16]", shuffle_partitions=32)
    results = [run_size(spark, n) for n in SIZES]
    spark.stop()
    line = {"metric": "per-epoch stored-lookup cost vs table size", "k": K,
            "file_rows": FILE_ROWS, "results": results}
    print(json.dumps(line))
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n### Stored-lookup scaling (zone-map pruning)\n\n")
        f.write(f"K={K} update keys/epoch, base files of {FILE_ROWS} rows, best of {EPOCHS} epochs.\n\n")
        f.write("| table rows | base files hit/total | epoch wall pruned (s) | epoch wall full-scan (s) |\n")
        f.write("|---|---|---|---|\n")
        for r in results:
            f.write(
                f"| {r['table_rows']:,} | {r.get('files_hit','-')}/{r.get('files_total','-')} "
                f"| {r['epoch_wall_pruned']} | {r['epoch_wall_full_scan']} |\n"
            )


if __name__ == "__main__":
    main()
