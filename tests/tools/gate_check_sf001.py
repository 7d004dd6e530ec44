"""Driver-gate replica at sf0.01 (the driver's CORRECTNESS scale).

Runs the first GATE_CAP registered queries (exactly the driver's 50-row
gate) on Spark and DuckDB over /root/testdata/sf0.01 and compares row
count, column names, and order-insensitive normalized values — the same
comparison tests/test_queries_oracle.py does at sf0.001.

Usage: python tests/tools/gate_check_sf001.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import duckdb

import __spark_entry__ as entry_mod
from tis_spark.operators import GATE_CAP
from tis_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = sys.argv[1:]
    if only:
        # explicit names may reach past the 50-row gate cap (spot-checking
        # pytest-only queries at the driver's scale)
        gate = [n for n in queries if n in only]
        unknown = sorted(set(only) - set(gate))
        if unknown:
            print(f"unknown query names: {unknown}")
            return 2
    else:
        gate = list(queries)[:GATE_CAP]

    spark = get_spark(app_name="gate-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed = []
    for name in gate:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in oracles:
                print(f"  {name}: rows_only {len(srows)} ({time.time()-t0:.1f}s)")
                continue
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
            errs = []
            if sorted(scols) != sorted(dcols):
                errs.append(f"cols {scols} vs {dcols}")
            if len(srows) != len(drows):
                errs.append(f"rows {len(srows)} vs {len(drows)}")
            if not errs:
                s = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
                d = _rows_to_set(dcols, drows)
                bad = [(a, b) for a, b in zip(s, d) if a != b]
                if bad:
                    errs.append(f"{len(bad)} value mismatches, first {bad[:2]}")
            status = "OK" if not errs else "FAIL " + "; ".join(errs)
        except Exception as exc:  # noqa: BLE001 — report and continue
            status = f"ERROR {type(exc).__name__}: {exc}"[:300]
        if status != "OK":
            failed.append((name, status))
        print(f"  {name}: {status} ({time.time()-t0:.1f}s)", flush=True)

    print(f"\n{len(gate) - len(failed)}/{len(gate)} green at {SF_DIR}")
    for name, status in failed:
        print(f"  RED {name}: {status}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
