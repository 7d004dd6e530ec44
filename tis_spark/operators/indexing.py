"""Search-index operators (SURVEY §2 S10/S11, Spark-first analog).

The reference ships a Lucene index-build sink and an index "backflow"
path (read the index back out as rows): tis-index-builder's
`IndexBuilderTask` (tis-index-builder/src/main/java/com/qlangtech/tis/
indexbuilder/IndexBuilderTask.java:93-188,338-411) pipelines N doc-maker
threads (row → Lucene doc, doc/LuceneDocMaker.java) into M index-maker
threads writing per-shard segment dirs, and backflow copies the built
shards to serving nodes (tis-assemble/.../IndexBackFlowInterceptor.java)
— SURVEY §2.1 S10/S11; the round-1 scope call left both out.  The Spark-first analog is not an
embedded Lucene JVM — it is the index *data structure* as a DataFrame:
a sharded inverted index (token -> sorted posting list) built with one
aggregation, searched with joins, and backflowed with one explode.
A user gets the same three capabilities (build, search, rebuild rows)
as ordinary lake tables that every other operator can join against.

Scale design (100 TB): posting lists are sharded by ``pmod(doc_id,
INDEX_SHARDS)`` — the same layout Lucene reaches via per-shard segment
builds (IndexBuilder splits by shard before indexing).  No single
aggregation cell ever holds more than df/INDEX_SHARDS entries, so a
stop-word-grade token (df = 10^9) cannot produce a multi-GB row or a
hot reducer: the groupBy key is (token, shard), which spreads exactly
the hot tokens across the cluster.  Build is one shuffle with map-side
partial aggregation; search shuffles only the query terms' postings;
backflow is explode + count, embarrassingly parallel.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# Posting-list shards per token.  Sized so a shard's postings stay well
# under parquet cell / executor-memory comfort (~10^6 entries) at the
# target document count; 4 is plenty for the test SFs while exercising
# the sharded plan shape.
INDEX_SHARDS = 4

_TOKENS_SQL = """
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents
"""


def _tokens(df: DataFrame) -> DataFrame:
    return df.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).distinct()


@query(
    "index_build_postings",
    f"""
    WITH dt AS ({_TOKENS_SQL})
    SELECT tok, CAST(doc_id % {INDEX_SHARDS} AS INT) AS shard,
           count(*) AS df_shard,
           array_to_string(list_sort(list(doc_id)), ';') AS postings
    FROM dt
    GROUP BY tok, shard
    """,
)
def index_build_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 analog: build the sharded inverted index.  One aggregation,
    keyed (token, shard) so hot tokens split across INDEX_SHARDS
    reducers and no posting cell exceeds df/shards entries (see module
    docstring).  The result is the index "segment" table a search sink
    would publish."""
    dt = _tokens(load(spark, sf_dir, "documents"))
    return (
        dt.withColumn("shard", F.pmod("doc_id", F.lit(INDEX_SHARDS)).cast("int"))
        .groupBy("tok", "shard")
        .agg(
            F.count("*").alias("df_shard"),
            F.concat_ws(
                ";", F.transform(F.array_sort(F.collect_list("doc_id")), lambda d: d.cast("string"))
            ).alias("postings"),
        )
    )


# Conjunctive query terms for the checked search — present at every SF of
# the synthetic corpus (vocabulary is shared across scale factors).
SEARCH_TERMS = ("join", "filter", "merge")


@query(
    "index_search_topk",
    f"""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), term_tf AS (
      SELECT doc_id, tok, count(*) AS tf
      FROM tf
      WHERE tok IN ('{SEARCH_TERMS[0]}', '{SEARCH_TERMS[1]}', '{SEARCH_TERMS[2]}')
      GROUP BY doc_id, tok
    )
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS score
    FROM term_tf
    GROUP BY doc_id
    HAVING count(DISTINCT tok) = {len(SEARCH_TERMS)}
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def index_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-query analog: conjunctive (AND) multi-term search ranked by
    summed term frequency.  The term filter lands before the first
    aggregation, so only the query terms' occurrences shuffle — the
    moral equivalent of reading three posting lists, not the corpus.
    Top-k via orderBy+limit compiles to TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isin(*SEARCH_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("score"), F.countDistinct("tok").alias("_nt"))
        .filter(F.col("_nt") == len(SEARCH_TERMS))
        .drop("_nt")
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@query(
    "index_backflow_roundtrip",
    f"""
    WITH dt AS ({_TOKENS_SQL}),
    idx AS (
      SELECT tok, CAST(doc_id % {INDEX_SHARDS} AS INT) AS shard,
             array_to_string(list_sort(list(doc_id)), ';') AS postings
      FROM dt GROUP BY tok, shard
    ),
    back AS (
      SELECT CAST(unnest(string_split(postings, ';')) AS BIGINT) AS doc_id, tok
      FROM idx
    )
    SELECT doc_id, count(*) AS n_terms
    FROM back
    GROUP BY doc_id
    """,
)
def index_backflow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 analog: backflow — explode the serialized posting lists back
    into (doc_id, token) rows and re-derive per-document term counts.
    Proves the index round-trips losslessly (the driver's oracle computes
    the same counts straight from the corpus).  At scale: explode is
    per-row, the count is one map-side-combined aggregation."""
    idx = index_build_postings(spark, sf_dir)
    back = idx.select(
        F.explode(F.split("postings", ";")).alias("_d"), "tok"
    ).select(F.col("_d").cast("bigint").alias("doc_id"), "tok")
    return back.groupBy("doc_id").agg(F.count("*").alias("n_terms"))


# --------------------------------------------------------------------------
# Incrementally-maintained index transforms (lake/derived.py).
#
# The reference rebuilds its index artifact in FULL per build
# (IndexBuilderTask pipelines every row through LuceneDocMaker every
# time); DerivedIndex maintains the same artifacts from the source
# table's changelog in O(changed keys) per sync.  These two registered
# transforms cover the reference's artifact shapes: token postings (the
# inverted-index rows S10 builds) and MinHash-LSH band signatures (the
# near-dup index the curation pipeline buckets on).  Both assume the
# documents-table convention (``doc_id`` key + ``text``) and are pure
# per-source-row expansions, the DerivedIndex transform contract.

from tis_spark.lake.derived import derived_transform  # noqa: E402
from tis_spark.operators.mlops import minhash_band_rows  # noqa: E402


@derived_transform("token_postings")
def _t_token_postings(src: DataFrame) -> DataFrame:
    """doc -> one row per (doc_id, tok) with term frequency.  groupBy is
    per-document (doc_id leads the key), so applying the transform to a
    changed-keys subset yields exactly those documents' postings."""
    return (
        src.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )


@derived_transform("minhash_bands")
def _t_minhash_bands(src: DataFrame) -> DataFrame:
    """doc -> one row per (doc_id, band_idx) with the MinHash band
    signature — same math as the batch dedup queries (mlops.py), so the
    maintained store joins bit-identically against a batch rebuild."""
    dt = src.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).distinct()
    return minhash_band_rows(dt)


def probe_minhash_bands(bands: DataFrame, is_new) -> DataFrame:
    """Near-dup candidate pairs touching a new batch, by probing a
    maintained MinHash band store (the ``minhash_bands`` DerivedIndex).

    ``bands`` is the full (doc_id, band_idx, band_val) signature store;
    ``is_new`` is a Column predicate selecting the batch.  The batch
    side is broadcast — the probe's shuffle is O(batch) regardless of
    corpus size; the index side is scanned (column-pruned) but never
    shuffled, and document text is never touched.  Returns canonical
    (doc_a < doc_b) pairs with the matching-band count:
    (doc_a, doc_b, n_bands).  A new-new pair is probed from both sides,
    so (pair, band) rows are de-duplicated before counting.
    """
    probe = F.broadcast(bands.filter(is_new)).alias("a")
    cand = probe.join(
        bands.alias("b"),
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    )
    return (
        cand.select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            F.col("a.band_idx").alias("band_idx"),
        )
        .distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


# ---------------------------------------------------- vector (ANN) index

#: sign-LSH hash tables over the 64-dim embedding: table t reads
#: ANN_INDEX_PLANES axis-aligned planes from the disjoint dim slice
#: [t*16+1, t*16+8] — independent tables, so a near neighbor missed by
#: one table's bucket is caught by another (standard multi-table LSH).
#: At production corpus sizes the plane count must grow with log(N) to
#: hold the expected bucket occupancy (and hence probe fan-out)
#: constant — the same rule dedup_embedding_cosine documents for its
#: bucket cap; 8 planes/table sizes the buckets for the test SFs.
#: env-tunable so bench runs can exercise the log(N) sizing (the driver
#: gate and the DuckDB oracle both read these constants, so they stay
#: consistent at any setting); planes are bounded by the 64-dim slice:
#: table t reads dims [t*16+1, t*16+planes], so 16*(tables-1)+planes<=64
ANN_INDEX_TABLES = int(os.environ.get("TIS_ANN_TABLES", "4"))
ANN_INDEX_PLANES = int(os.environ.get("TIS_ANN_PLANES", "8"))
assert 16 * (ANN_INDEX_TABLES - 1) + ANN_INDEX_PLANES <= 64, (
    ANN_INDEX_TABLES,
    ANN_INDEX_PLANES,
)


@derived_transform("emb_sign_buckets")
def _t_emb_sign_buckets(src: DataFrame) -> DataFrame:
    """embedding row -> one row per hash table: (vec_id, table_idx,
    bucket).  Same axis-aligned sign buckets as the batch ANN queries
    (mlops.py ann_lsh_buckets), widened to multiple tables; a pure 1:L
    per-row expansion, so the maintained store is bit-identical to a
    batch rebuild.  One narrow scan — the tables come out of a single
    posexplode, never L passes over the source."""
    buckets = F.array(
        *[
            F.concat(
                *[
                    F.when(F.element_at("embedding", t * 16 + i) >= 0, "1").otherwise("0")
                    for i in range(1, ANN_INDEX_PLANES + 1)
                ]
            )
            for t in range(ANN_INDEX_TABLES)
        ]
    )
    return src.select(
        "vec_id", F.posexplode(buckets).alias("table_idx", "bucket")
    )


def probe_sign_buckets(index_rows: DataFrame, is_new) -> DataFrame:
    """ANN candidate pairs touching a new vector batch, by probing a
    maintained sign-LSH bucket store (the ``emb_sign_buckets``
    DerivedIndex).

    ``index_rows`` is the full (vec_id, table_idx, bucket) store;
    ``is_new`` is a Column predicate selecting the batch.  The batch
    side is broadcast — the probe's shuffle is O(batch) regardless of
    corpus size; the index side is scanned (column-pruned, no vectors)
    but never shuffled.  Returns canonical (vec_a < vec_b) pairs with
    the number of tables in which they co-bucketed: (vec_a, vec_b,
    n_tables).  A new-new pair probes from both sides, so (pair, table)
    rows are de-duplicated before counting.
    """
    probe = F.broadcast(index_rows.filter(is_new)).alias("a")
    cand = probe.join(
        index_rows.alias("b"),
        (F.col("a.table_idx") == F.col("b.table_idx"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    )
    return (
        cand.select(
            F.least("a.vec_id", "b.vec_id").alias("vec_a"),
            F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
            F.col("a.table_idx").alias("table_idx"),
        )
        .distinct()
        .groupBy("vec_a", "vec_b")
        .agg(F.count(F.lit(1)).alias("n_tables"))
    )
