"""Plan-audit regression tests: pin the physical-plan properties the
operator docstrings claim (shuffle counts, predicate pushdown).  A code
change that silently adds an Exchange to a shuffle-free operator or drops
a pushed filter is a scale regression that row-level oracles cannot see.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
QUERIES = entry_mod.queries()


def plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(p: str) -> int:
    # count physical Exchange operators (node list entries like "Exchange (4)")
    return sum(
        1
        for line in p.splitlines()
        if line.strip().startswith(("Exchange", "+- Exchange"))
        or "Exchange (" in line.split(":")[0]
    )


def test_quality_ops_are_shuffle_free(spark):
    for name in ("text_repetition_ratio", "gopher_quality_filter"):
        p = plan(spark, name)
        assert "Exchange" not in p, f"{name} gained a shuffle:\n{p}"


def test_asof_join_is_single_shuffle(spark):
    p = plan(spark, "asof_join_prior_view")
    assert n_exchanges(p) == 1, p


def test_rollup_is_single_shuffle(spark):
    p = plan(spark, "rollup_returnflag_status")
    assert "Expand" in p, p  # rollup expands grouping sets in one pass
    assert n_exchanges(p) == 1, p


def test_q3_pushes_filters_to_scan(spark):
    p = plan(spark, "q3_shipping_priority")
    assert "PushedFilters" in p, p
    assert "l_shipdate" in p.split("PushedFilters", 2)[-1][:2000] or (
        "l_shipdate" in p
    ), p


def test_sampling_fuses_into_scan(spark):
    # stratified sampling is a map-side filter + one aggregate shuffle
    p = plan(spark, "sample_stratified")
    assert n_exchanges(p) <= 1, p


def test_lake_scalar_read_prunes_payload_columns(spark, tmp_table_dir):
    """The fold's payload-free claim depends on Catalyst pushing column
    pruning through the MOR reconcile (union + window + anti-join): a
    scalar projection over LakeTable.read() must not read html/text from
    parquet."""
    import io
    from contextlib import redirect_stdout

    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.fixtures.gen import gen_page_changes

    ing = CdcIngest(spark, tmp_table_dir, CdcConfig(fold_parallelism=4))
    ing.replay(gen_page_changes(spark, 400, seed=3, epoch_size=400), epoch_size=400)
    df = ing.table.read().select("url", "warc_ts", "fetch_status")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    schemas = [l for l in p.splitlines() if "ReadSchema" in l]
    assert schemas, p
    assert all("html" not in l and "text" not in l for l in schemas), p


def test_decile_rank_has_no_global_window(spark):
    """length_decile_stats (r3 rewrite): no window partitioned by lang
    alone over the raw rows — the heaviest window partitions by
    (lang, n_chars); the lang-only windows run over the distinct-length
    aggregate, so no full language funnels through one task."""
    df = QUERIES["length_decile_stats"](spark, SF_DIR)
    jplan = df._jdf.queryExecution().executedPlan().toString()
    # the per-row rank is row_number over (lang, n_chars) — fine partitions
    assert "row_number()" in jplan
    row_windows = [
        seg for seg in jplan.split("Window")[1:] if "row_number()" in seg.split("\n")[0]
    ]
    assert row_windows and all(
        "lang" in seg.split("\n")[0] and "n_chars" in seg.split("\n")[0]
        for seg in row_windows
    ), jplan
    # lang-only windows exist but only above the distinct-length aggregate
    assert "HashAggregate" in jplan


def test_kmv_shuffles_only_survivors(spark):
    """kmv_distinct_sketch (r3 rewrite): the raw-row stage is a narrow
    Arrow map (no Exchange below it); the only exchanges sit above the
    k-per-batch survivor set."""
    df = QUERIES["kmv_distinct_sketch"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p, p
    # the scan feeds MapInPandas directly — no Exchange between them
    below = p.split("MapInPandas")[-1]
    assert "Exchange" not in below, below


def test_pii_scrub_is_shuffle_free(spark):
    p = plan(spark, "text_pii_scrub")
    assert "Exchange" not in p, f"text_pii_scrub gained a shuffle:\n{p}"


def test_star_epoch_reads_batch_once(spark, tmp_path):
    """process_epoch persists the micro-batch: the events source
    materializes exactly once per epoch — not once for the lineage
    aggregate plus once per monitored table ((T+1)x IO on remote storage,
    and a non-replayable MQ source doesn't guarantee a re-read at all).
    Mirror of the CDC micro-batch persist (cdc/pipeline.py)."""
    from tis_spark.fixtures.ledger import initial_ledger, ledger_spec, ledger_wide
    from tis_spark.fixtures.star import STAR_CHANGE_SCHEMA
    from tis_spark.wide import WideRowPipeline

    spec = ledger_spec()
    pipe = WideRowPipeline(
        spark, str(tmp_path / "star"), spec, ledger_wide, num_buckets=4
    )
    initial = initial_ledger()
    pipe.full_build(
        {n: spark.createDataFrame(pdf, schema=spec.tables[n].schema)
         for n, pdf in initial.items()}
    )
    base = {"ddl": None, "before": None, "after": None, "epoch_hint": 0}
    rows = [
        {**base, "seq": 1, "op": "U", "table": "account", "pk": "a001",
         "after": {"id": "a001", "entity_id": "ent1", "owner": "ownX",
                   "modify_time": "5001"}},
        {**base, "seq": 2, "op": "U", "table": "transfer", "pk": "t001",
         "after": {"id": "t001", "src_id": "a001", "dst_id": "a002",
                   "amount": "99", "modify_time": "5002"}},
    ]
    raw = spark.createDataFrame(rows, schema=STAR_CHANGE_SCHEMA)
    acc = spark.sparkContext.accumulator(0)

    def _count(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    counted = raw.mapInPandas(_count, schema=STAR_CHANGE_SCHEMA)
    stats = pipe.process_epoch(counted, epoch_id=1)
    assert stats.get("n_affected", 0) > 0
    assert acc.value == len(rows), f"batch read {acc.value / len(rows):.1f}x"


def test_url_canonicalize_is_shuffle_free(spark):
    p = plan(spark, "url_canonicalize")
    assert "Exchange" not in p, f"url_canonicalize gained a shuffle:\n{p}"


def test_domain_cap_has_no_whole_domain_window(spark):
    """domain_cap_topk: the per-row rank window partitions by
    (domain, n_chars) — fine partitions — never by domain alone over raw
    rows; domain-only windows may only run above the distinct-length
    aggregate (the length_decile_stats construction), so a hot domain
    never funnels through one task."""
    df = QUERIES["domain_cap_topk"](spark, SF_DIR)
    jplan = df._jdf.queryExecution().executedPlan().toString()
    row_windows = [
        seg for seg in jplan.split("Window")[1:] if "row_number()" in seg.split("\n")[0]
    ]
    assert row_windows and all(
        "domain" in seg.split("\n")[0] and "n_chars" in seg.split("\n")[0]
        for seg in row_windows
    ), jplan
    assert "HashAggregate" in jplan


def test_dup_span_stats_never_shuffles_text(spark):
    """dup_span_stats: grams are md5-hashed inside the Generate, so every
    Exchange carries 32-byte hashes + ids — the text column must never
    appear in a shuffle."""
    df = QUERIES["dup_span_stats"](spark, SF_DIR)
    jplan = df._jdf.queryExecution().executedPlan().toString()
    assert "md5(" in jplan, jplan
    for line in jplan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_neardup_probe_broadcasts_the_batch_side(spark):
    """neardup_probe_incremental: the new-batch band rows must reach the
    candidate join as a broadcast (the probe is O(batch) while the index
    side is the whole maintained signature store — a shuffle of the full
    index per probe is the scale regression), and no Exchange in the
    plan may carry document text (the index stores only 32-byte band
    hashes; text stays in the source lake table)."""
    p = plan(spark, "neardup_probe_incremental")
    assert "BroadcastHashJoin" in p, p
    for seg in p.split("Exchange")[1:]:
        head = seg.split("\n")[0]
        assert "text" not in head, f"document text entered a shuffle:\n{head}"


def test_ann_probe_broadcasts_the_batch_and_keeps_vectors_off_shuffles(spark):
    """ann_probe_incremental: the new-batch bucket rows must reach the
    candidate join as a broadcast (the probe is O(batch) while the index
    side is the whole maintained bucket store), and no Exchange in the
    plan may carry the embedding vectors — the index stores only hash
    rows, and candidate verification fetches vectors via joins whose
    pair side AQE broadcasts (column-pruned vector scan, never a vector
    shuffle)."""
    p = plan(spark, "ann_probe_incremental")
    assert "BroadcastHashJoin" in p, p
    for seg in p.split("Exchange")[1:]:
        head = seg.split("\n")[0]
        assert "embedding" not in head, f"vectors entered a shuffle:\n{head}"


def test_delete_where_victim_scan_is_column_pruned(spark, tmp_path):
    """The purge's victim read must reach parquet with only the key,
    layout and predicate columns in its ReadSchema — purging a wide
    webtext table by domain must not read html/text blobs."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("domain", T.StringType()),
            T.StructField("html", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("score", T.LongType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key_cols=["url"], version_col="score")
    rows = spark.createDataFrame(
        [(f"u{i}", f"d{i % 3}.com", "<html>" * 50, "body " * 50, i) for i in range(30)],
        schema,
    )
    t.commit(
        t.write_data_files(
            rows.withColumn(COMMIT_COL, F.lit(0).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", t.bucket_expr()),
            kind="delta",
        ),
        summary={"epoch_id": 0},
    )
    snap = t.current_snapshot()
    keep = set(snap.key_cols) | {LakeTable.layout_key(snap)}
    victims = (
        t.read(snapshot_id=snap.snapshot_id)
        .filter(F.col("domain") == "d1.com")
        .select(
            *[
                F.col(f.name) if f.name in keep
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in snap.schema.fields
            ]
        )
    )
    import io as _io
    from contextlib import redirect_stdout as _rs

    buf = _io.StringIO()
    with _rs(buf):
        victims.explain("formatted")
    p = buf.getvalue()
    read_schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schemas, p
    for ln in read_schemas:
        assert "html" not in ln and "text" not in ln, ln
    # and the real call deletes exactly the matching rows
    assert t.delete_where(F.col("domain") == "d1.com")["deleted_rows"] == 10
    assert t.read().filter(F.col("domain") == "d1.com").count() == 0
