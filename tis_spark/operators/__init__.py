"""Operator registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 registers a Spark
implementation and (where ANSI-SQL-expressible) a DuckDB oracle query via
``@query``.  Import side effects populate REGISTRY/ORACLES.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


from tis_spark.operators import analytics, cdcfold, datax_sync, indexing, mlops, multimodal, quality, relational, sqlnode, starfold, temporal, traindata, widerow  # noqa: E402,F401  (registration side effects)

# The driver's correctness gate caps at 50 queries and cuts in REGISTRY
# insertion order, so the flagship/stateful/never-yet-gated operators are
# pinned first; queries already green in earlier rounds (the fn_* scalar
# micro-suite, simple window/filter shapes) register after the cut.
_PRIORITY = [
    # flagship engine paths (stateful replay + hash-checked engine folds)
    "cdc_engine_fold_events",
    "wide_row_engine_fold",
    "wide_row_incremental",
    "wide_row_totalpay_shape",
    "fk_chain_routing",
    # temporal joins (never gated before r3)
    "asof_join_prior_view",
    "range_join_pair_counts",
    "sessionize_events",
    # training-data curation set (never gated before r3)
    "sample_stratified",
    "pack_sequences",
    "decontaminate_ngram_overlap",
    "tfidf_top_terms",
    "vocab_topk",
    # r2 red cells, now BIGINT-cast oracles
    "rollup_returnflag_status",
    "datax_sync_roundtrip",
    "index_search_topk",
    "kmv_distinct_sketch",
    "index_build_postings",
    "index_backflow_roundtrip",
    # LLM-pipeline operators (dedup / ANN / text / multimodal / quality)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_on_lsh",
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_ivf_blocked",
    "ann_lsh_buckets",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_repetition_ratio",
    "gopher_quality_filter",
    "length_decile_stats",
    "multimodal_binary_meta",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    # relational core (TPC-H shapes, joins, aggregations)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "left_join_extra_on",
    "semi_anti_join",
    "union_all_agg",
    "two_level_reaggregation",
    "count_distinct_by_segment",
    "latest_per_key",
    "topn_per_group",
]


def _reorder() -> None:
    rest = dict(REGISTRY)
    REGISTRY.clear()
    for n in _PRIORITY:
        if n in rest:
            REGISTRY[n] = rest.pop(n)
    REGISTRY.update(rest)


_reorder()
