"""Round-3 additions not covered by the oracle gate: the P7 naming
round-trip (UnderlineUtils.addUnderline/removeUnderline parity,
BasicPojoConsumer.java:512-523)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_underline_roundtrip(spark):
    from tis_spark.operators.relational import remove_underline

    df = spark.createDataFrame(
        [("orderBuildingName",), ("fooBar",), ("plain",), ("aBC",)], ["camel"]
    )
    under = F.lower(F.regexp_replace(F.col("camel"), "([A-Z])", "_$1"))
    rows = df.select(
        "camel", under.alias("under"), remove_underline(under).alias("back")
    ).collect()
    for r in rows:
        assert r["back"] == r["camel"], (r["camel"], r["under"], r["back"])


def test_gate_priority_covers_flagships():
    """The driver's correctness gate caps at 50 queries in dict order —
    the flagship/stateful/curation operators must stay inside the cut,
    every gate row must carry a DuckDB oracle (50/50 hash-checkable), and
    the no-oracle stateful flagships must register past the cap (their
    hash-checked engine-fold twins hold the gate rows)."""
    import __spark_entry__ as em
    from tis_spark.operators import GATE_CAP, _PRIORITY

    allq = list(em.queries())
    oracles = em.oracle_sql()
    first50 = allq[:GATE_CAP]
    assert first50 == _PRIORITY
    missing_oracle = [n for n in first50 if n not in oracles]
    assert not missing_oracle, missing_oracle
    # the no-oracle full-replay flagships stay registered (pytest runs
    # them every suite execution) but past the driver's cap
    for name in (
        "cdc_replay_final_state",
        "wide_row_incremental",
        # rotated past the cap by the r5 gate recomposition (cube+rollup
        # keep grouping covered in the gate; these stay pytest-pinned)
        "grouping_sets_flag_and_status",
        "multimodal_binary_meta",
        "text_token_count",
    ):
        assert name in allq and name not in first50, name
    for name in (
        "cdc_engine_fold_events",
        "wide_row_engine_fold",
        "wide_row_totalpay_shape",
        "wide_sql_node",
        "fk_chain_routing",
        "asof_join_prior_view",
        "sessionize_events",
        "sample_stratified",
        "pack_sequences",
        "decontaminate_ngram_overlap",
        "rollup_returnflag_status",
        "cube_returnflag_status",
        "datax_sync_roundtrip",
        "index_search_topk",
        "dedup_minhash_lsh",
        "q1_pricing_summary",
        "topn_per_group",
        "text_pii_scrub",
        "intersect_except_segments",
        "fn_string_suite",
        "fn_numeric_temporal_suite",
        # r5 promotions: the r4 flagship surface carries driver rows
        "matview_group_rollup",
        "url_canonicalize",
        "domain_cap_topk",
        "dup_span_stats",
    ):
        assert name in first50, name


def test_streaming_wide_applies_mid_stream_ddl(spark, tmp_path):
    """A DDL event arriving THROUGH the Structured Streaming front-end
    (foreachBatch -> process_epoch) evolves the source table mid-stream
    and subsequent chunks decode the new column."""
    import os

    from tis_spark.fixtures.ledger import initial_ledger, ledger_spec, ledger_wide
    from tis_spark.fixtures.star import STAR_CHANGE_SCHEMA
    from tis_spark.streaming import StreamingWideRow, write_stream_chunks
    from tis_spark.wide import WideRowPipeline

    spec = ledger_spec()
    root = str(tmp_path / "star")
    pipe = WideRowPipeline(spark, root, spec, ledger_wide, num_buckets=4)
    initial = initial_ledger()
    pipe.full_build(
        {n: spark.createDataFrame(pdf, schema=spec.tables[n].schema)
         for n, pdf in initial.items()}
    )
    base = {"ddl": None, "before": None, "after": None, "epoch_hint": 0}
    rows = [
        {**base, "seq": 1, "op": "DDL", "table": "account", "pk": "",
         "ddl": "ADD COLUMN region string"},
        {**base, "seq": 2, "op": "U", "table": "account", "pk": "a001",
         "after": {"id": "a001", "entity_id": "ent1", "owner": "own1b",
                   "region": "emea", "modify_time": "5001"}},
    ]
    changes = spark.createDataFrame(rows, schema=STAR_CHANGE_SCHEMA)
    src = str(tmp_path / "src")
    write_stream_chunks(changes, src, chunk_size=1, order_col="seq")
    sw = StreamingWideRow(spark, src, pipe, checkpoint_dir=str(tmp_path / "ckpt"))
    assert sw.run_available(timeout_s=120)
    assert spec.tables["account"].columns["region"] == "string"
    acc = {r["id"]: r.asDict() for r in pipe.sources["account"].read().collect()}
    assert acc["a001"]["region"] == "emea"
    assert acc["a000"].get("region") is None  # pre-DDL row null-fills
