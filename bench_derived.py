"""Derived-index maintenance bench: sync cost vs source size.

Demonstrates the point of lake/derived.py at scale: catching a
transform-expanded index (token postings) up after K changed documents
costs O(K) — one changelog read, a bucket/zone file-pruned tombstone
lookup, and a K-document re-expansion — while the alternative (what the
reference does every build: tis-index-builder re-pipelines every row
through LuceneDocMaker) costs O(corpus).  The sync wall and bytes read
should stay flat as the corpus grows; the rebuild wall grows linearly.

Method: create document lake tables of increasing row counts (doc_id,
text of ~9 tokens from a bounded vocabulary + one unique token), create
+ bootstrap the token-postings index once, apply ONE delta commit of K
changed docs (3/4 text updates, 1/4 deletes), then measure (a)
idx.sync() wall + Spark-reported input bytes and (b) a full
create+bootstrap rebuild wall on the same source.  Sync correctness is
re-asserted against a fresh transform each round.

Usage: python bench_derived.py  [sizes via SPARK_GRAFT_DI_SIZES, default
"250000,1000000,4000000"; K via SPARK_GRAFT_DI_KEYS=5000]
Prints one JSON line.  ``--probe`` runs the near-dup probe-vs-full-join
comparison instead (see probe_main); ``--ann-probe`` its vector twin
over a maintained sign-LSH bucket store (see ann_probe_main).
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

if "--ann-probe" in sys.argv:
    # bench-scale sign-LSH geometry BEFORE the transform module loads: the
    # plane count must grow ~log(N) to hold bucket occupancy constant
    # (operators/indexing.py) — the sf-test default (4 tables x 8 planes,
    # 256 buckets/table) would put thousands of vectors in every bucket at
    # millions of rows and the "full self-join" comparator would measure
    # bucket overflow, not the probe asymmetry.  2 x 24 = 16M buckets.
    os.environ.setdefault("TIS_ANN_TABLES", "2")
    os.environ.setdefault("TIS_ANN_PLANES", "24")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import tis_spark.operators.indexing  # noqa: F401,E402 — registers transforms
from tis_spark.lake.derived import TRANSFORMS, DerivedIndex  # noqa: E402
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable  # noqa: E402
from tis_spark.session import get_spark  # noqa: E402

SIZES = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_DI_SIZES", "250000,1000000,4000000"
).split(",")]
K = int(os.environ.get("SPARK_GRAFT_DI_KEYS", "5000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _text(salt: int):
    """~9 bounded-vocabulary tokens + 1 doc-unique token (so every doc
    has survivor postings AND a changed posting on update)."""
    parts = [
        F.concat(F.lit(f"w{j}_"), F.pmod(F.xxhash64("doc_id", F.lit(j + salt)), F.lit(997)).cast("string"))
        for j in range(9)
    ]
    return F.concat_ws(" ", F.concat(F.lit("u"), F.col("doc_id").cast("string")), *parts)


def build_source(spark, path, n):
    t = LakeTable.create(spark, path, SRC_SCHEMA, key_cols=["doc_id"], version_col="doc_id")
    df = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", _text(0).alias("text"))
        .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
        .withColumn(DEAD_COL, F.lit(False))
    )
    df = df.withColumn("_bucket", t.bucket_expr()).repartition("_bucket").sortWithinPartitions("doc_id")
    t.commit(
        t.write_data_files(df, kind="base", max_records_per_file=max(500_000, n // 64)),
        summary={"epoch_id": 0},
    )
    return t


def apply_delta(spark, t, n, k):
    """k changed docs spread over the id space: 3/4 text updates, 1/4
    deletes — one delta commit, the trigger-sized sync window."""
    ch = spark.range(k).select((F.col("id") * (n // k)).alias("doc_id"))
    up = ch.where(F.col("doc_id") % 4 != 2).select(
        "doc_id", _text(1).alias("text"), F.lit(False).alias(DEAD_COL)
    )
    dead = ch.where(F.col("doc_id") % 4 == 2).select(
        "doc_id", F.lit(None).cast("string").alias("text"), F.lit(True).alias(DEAD_COL)
    )
    df = (
        up.unionByName(dead)
        .withColumn(COMMIT_COL, F.lit(1).cast("long"))
        .withColumn("_bucket", t.bucket_expr())
        .repartition("_bucket")
    )
    t.commit(t.write_data_files(df, kind="delta"), summary={"epoch_id": 1})


def _bytes_read(spark) -> int:
    """Total input bytes across completed stages (Spark status REST API)
    — bytes read do not lie about the IO asymmetry that dominates on
    remote storage at 100 TB (same probe as bench_matview.py)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(base + "/api/v1/applications"))
    app = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=COMPLETE")
    )
    return sum(st.get("inputBytes", 0) for st in stages)


def probe_main(spark) -> None:
    """--probe: the incremental near-dup shape (operators/cdcfold.py::
    neardup_probe_incremental) at bench scale.  Corpus of N docs in ~5-doc
    duplicate clusters with a maintained minhash_bands index; a K-doc new
    batch lands as one delta + one sync; then compare (a) probing the
    maintained index for the batch's near-dup pairs (broadcast batch
    bands, zero shuffle of the index side) against (b) what a
    non-incremental pipeline re-runs per batch: the full corpus-x-corpus
    band self-join.  The full join shuffles all 4N band rows every batch;
    the probe's shuffle is O(K) — the asymmetry that decides feasibility
    when N is 100 TB and K is one crawl increment."""
    rows = []
    for n in SIZES:
        work = tempfile.mkdtemp(prefix=f"tis-diprobe-{n}-")
        t = LakeTable.create(
            spark, os.path.join(work, "src"), SRC_SCHEMA, key_cols=["doc_id"], version_col="doc_id"
        )
        # ~5-doc duplicate clusters: identical text within a cluster
        cluster = lambda c: F.concat_ws(  # noqa: E731
            " ",
            *[
                F.concat(
                    F.lit(f"w{j}_"),
                    F.pmod(F.xxhash64(c, F.lit(j)), F.lit(997)).cast("string"),
                )
                for j in range(10)
            ],
        )
        base = (
            spark.range(n)
            .select(F.col("id").alias("doc_id"))
            .select("doc_id", cluster(F.pmod(F.col("doc_id"), F.lit(n // 5))).alias("text"))
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
        )
        base = base.withColumn("_bucket", t.bucket_expr()).repartition("_bucket")
        t.commit(
            t.write_data_files(base, kind="base", max_records_per_file=max(500_000, n // 64)),
            summary={"epoch_id": 0},
        )
        idx = DerivedIndex.create(
            spark, os.path.join(work, "idx"), t, "minhash_bands", ["doc_id", "band_idx"]
        )
        t0 = time.monotonic()
        idx.bootstrap()
        build_s = time.monotonic() - t0

        # the new crawl batch joins existing clusters (near-dups of corpus)
        batch = (
            spark.range(n, n + K)
            .select(F.col("id").alias("doc_id"))
            .select("doc_id", cluster(F.pmod(F.col("doc_id"), F.lit(n // 5))).alias("text"))
            .withColumn(COMMIT_COL, F.lit(1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", t.bucket_expr())
            .repartition("_bucket")
        )
        t.commit(t.write_data_files(batch, kind="delta"), summary={"epoch_id": 1})
        t0 = time.monotonic()
        idx.sync()
        sync_s = time.monotonic() - t0

        from tis_spark.operators.indexing import probe_minhash_bands

        bands = idx.read().select("doc_id", "band_idx", "band_val")
        t0 = time.monotonic()
        probe_pairs = probe_minhash_bands(bands, F.col("doc_id") >= n).count()
        probe_s = time.monotonic() - t0

        t0 = time.monotonic()
        a, b = bands.alias("a"), bands.alias("b")
        full_pairs = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
        full_s = time.monotonic() - t0

        rows.append(
            {
                "n_docs": n,
                "k_new": K,
                "bootstrap_s": round(build_s, 2),
                "sync_s": round(sync_s, 2),
                "probe_s": round(probe_s, 2),
                "probe_pairs": probe_pairs,
                "full_join_s": round(full_s, 2),
                "full_pairs": full_pairs,
                "speedup": round(full_s / probe_s, 1),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "near-dup probe vs full LSH join", "rows": rows}))


def ann_probe_main(spark) -> None:
    """--ann-probe: the incremental ANN shape (operators/cdcfold.py::
    ann_probe_incremental) at bench scale — the vector twin of --probe.
    Corpus of N 64-dim vectors in ~5-vector cosine clusters with a
    maintained ``emb_sign_buckets`` store; a K-vector batch lands as one
    delta + one sync; then compare (a) probing the maintained store for
    the batch's candidate neighbor pairs (broadcast batch buckets, the
    store side never shuffled) against (b) what a non-incremental
    pipeline re-runs per batch: the full store self-join producing every
    corpus pair.  Candidate generation only on both sides — the
    exact-cosine verify step is identical in either pipeline (and the
    gate query hash-checks it); the asymmetry that decides feasibility
    is who shuffles what per batch."""
    from tis_spark.operators.indexing import probe_sign_buckets

    EMB_DIM = 64

    def embedding(cluster_col):
        # cluster base direction (uniform +-1 per dim) + small per-vector
        # jitter (+-0.05): in-cluster sign buckets agree on most planes,
        # cross-cluster signs are independent
        return F.array(
            *[
                (
                    (F.pmod(F.xxhash64(cluster_col, F.lit(d)), F.lit(2001)) - F.lit(1000)).cast("double")
                    / F.lit(1000.0)
                    + (F.pmod(F.xxhash64("vec_id", F.lit(1000 + d)), F.lit(201)) - F.lit(100)).cast("double")
                    / F.lit(2000.0)
                ).cast("float")
                for d in range(EMB_DIM)
            ]
        )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = []
    for n in SIZES:
        work = tempfile.mkdtemp(prefix=f"tis-annbench-{n}-")
        t = LakeTable.create(
            spark, os.path.join(work, "src"), schema, key_cols=["vec_id"], version_col="vec_id"
        )
        base = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"))
            .select("vec_id", embedding(F.pmod(F.col("vec_id"), F.lit(n // 5))).alias("embedding"))
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
        )
        base = base.withColumn("_bucket", t.bucket_expr()).repartition("_bucket")
        t.commit(
            t.write_data_files(base, kind="base", max_records_per_file=max(500_000, n // 64)),
            summary={"epoch_id": 0},
        )
        idx = DerivedIndex.create(
            spark, os.path.join(work, "idx"), t, "emb_sign_buckets", ["vec_id", "table_idx"]
        )
        t0 = time.monotonic()
        idx.bootstrap()
        build_s = time.monotonic() - t0

        # the new batch joins existing clusters (near neighbors of corpus)
        batch = (
            spark.range(n, n + K)
            .select(F.col("id").alias("vec_id"))
            .select("vec_id", embedding(F.pmod(F.col("vec_id"), F.lit(n // 5))).alias("embedding"))
            .withColumn(COMMIT_COL, F.lit(1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", t.bucket_expr())
            .repartition("_bucket")
        )
        t.commit(t.write_data_files(batch, kind="delta"), summary={"epoch_id": 1})
        t0 = time.monotonic()
        idx.sync()
        sync_s = time.monotonic() - t0

        store = idx.read().select("vec_id", "table_idx", "bucket")
        t0 = time.monotonic()
        probe_pairs = probe_sign_buckets(store, F.col("vec_id") >= n).count()
        probe_s = time.monotonic() - t0

        t0 = time.monotonic()
        a, b = store.alias("a"), store.alias("b")
        full_pairs = (
            a.join(
                b,
                (F.col("a.table_idx") == F.col("b.table_idx"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select("a.vec_id", "b.vec_id")
            .distinct()
            .count()
        )
        full_s = time.monotonic() - t0

        rows.append(
            {
                "n_vecs": n,
                "k_new": K,
                "bootstrap_s": round(build_s, 2),
                "sync_s": round(sync_s, 2),
                "probe_s": round(probe_s, 2),
                "probe_pairs": probe_pairs,
                "full_join_s": round(full_s, 2),
                "full_pairs": full_pairs,
                "speedup": round(full_s / probe_s, 1),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "ANN probe vs full sign-LSH self-join", "rows": rows}))


def main() -> None:
    spark = get_spark(
        "bench_derived",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "30000"},
    )
    if "--probe" in sys.argv:
        probe_main(spark)
        return
    if "--ann-probe" in sys.argv:
        ann_probe_main(spark)
        return
    rows = []
    for n in SIZES:
        work = tempfile.mkdtemp(prefix=f"tis-dibench-{n}-")
        src = build_source(spark, os.path.join(work, "src"), n)
        idx = DerivedIndex.create(
            spark, os.path.join(work, "idx"), src, "token_postings", ["doc_id", "tok"]
        )
        t0 = time.monotonic()
        idx.bootstrap()
        build_s = time.monotonic() - t0

        apply_delta(spark, src, n, K)
        b0 = _bytes_read(spark)
        t0 = time.monotonic()
        out = idx.sync()
        sync_s = time.monotonic() - t0
        sync_mb = (_bytes_read(spark) - b0) / 1e6

        # correctness: maintained store == fresh transform of source state
        fresh = TRANSFORMS["token_postings"](src.read())
        diff = idx.read().exceptAll(fresh).count() + fresh.exceptAll(idx.read()).count()
        assert diff == 0, f"maintained index diverged at n={n}: {diff} rows"

        t0 = time.monotonic()
        idx2 = DerivedIndex.create(
            spark, os.path.join(work, "idx2"), src, "token_postings", ["doc_id", "tok"]
        )
        idx2.bootstrap()
        rebuild_s = time.monotonic() - t0

        rows.append(
            {
                "n_docs": n,
                "k_changed": K,
                "bootstrap_s": round(build_s, 2),
                "sync_s": round(sync_s, 2),
                "sync_read_mb": round(sync_mb, 1),
                "sync_files": out["files"],
                "rebuild_s": round(rebuild_s, 2),
                "speedup": round(rebuild_s / sync_s, 1),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "derived-index sync vs rebuild", "rows": rows}))


if __name__ == "__main__":
    main()
