"""Training-data curation operators: deterministic sampling, sequence
packing, benchmark decontamination, vocabulary build.

These are the pipeline steps that sit between dedup (mlops.py) and model
training in a web-scale corpus build.  Cross-engine determinism follows
the mlops.py strategy: every random choice is an md5-hex comparison
(identical bits in Spark and DuckDB), every order is an explicit
deterministic sort key, and floating point never decides an output row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# ------------------------------------------------------------- sampling

# Per-stratum sampling rates as md5-hex-prefix thresholds (uniform over
# [0,1) because md5 is uniform over hex strings): 'en' keeps ~25%
# (prefix < '4000'), every other lang ~50% (prefix < '8000').
_EN_THRESHOLD = "4000"
_OTHER_THRESHOLD = "8000"


@query(
    "sample_stratified",
    f"""
    SELECT lang, source,
           count(*) AS n_total,
           count(*) FILTER (
             substr(md5('sample:' || doc_id), 1, 4)
               < CASE WHEN lang = 'en' THEN '{_EN_THRESHOLD}'
                      ELSE '{_OTHER_THRESHOLD}' END
           ) AS n_sampled,
           coalesce(min(doc_id) FILTER (
             substr(md5('sample:' || doc_id), 1, 4)
               < CASE WHEN lang = 'en' THEN '{_EN_THRESHOLD}'
                      ELSE '{_OTHER_THRESHOLD}' END
           ), -1) AS min_sampled_doc
    FROM documents GROUP BY lang, source
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a doc iff the md5 of a
    salted key falls under the stratum's hex threshold — per-row
    decision, no shuffle, no RNG state, reproducible across engines,
    runs, and cluster sizes (the property `df.sample()` does not have:
    its output depends on partitioning).  At 100 TB this is a pure
    map-side filter fused into the scan."""
    doc = load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 4)
    thr = F.when(F.col("lang") == "en", F.lit(_EN_THRESHOLD)).otherwise(
        F.lit(_OTHER_THRESHOLD)
    )
    kept = h < thr
    return doc.groupBy("lang", "source").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_sampled"),
        F.coalesce(F.min(F.when(kept, F.col("doc_id"))), F.lit(-1)).alias(
            "min_sampled_doc"
        ),
    )


# -------------------------------------------------------------- packing

PACK_TOKEN_BUDGET = 2048  # tokens per packed training sequence
PACK_SHARDS = 32  # parallel pack groups per lang (window partitions)


@query(
    "pack_sequences",
    f"""
    WITH sized AS (
      SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT lang, shard, n_tok,
             CAST(floor(
               (sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tok)
               / {PACK_TOKEN_BUDGET}) AS BIGINT) AS bin
      FROM sized
    )
    SELECT lang, shard, bin, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens
    FROM packed GROUP BY lang, shard, bin
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign docs to fixed token-budget
    bins by running token count in deterministic doc_id order.  The
    window partitions on (lang, shard = doc_id % PACK_SHARDS) — packing is
    embarrassingly parallel across shards, so no single-reducer window
    over a whole language (the naive PARTITION BY lang serializes 100 TB
    of one language through one task).  bin = floor(start_offset/budget)
    is the contiguous-packing rule: order-stable, idempotent, and
    independent of physical partitioning."""
    doc = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    sized = doc.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / PACK_TOKEN_BUDGET),
    )
    return packed.groupBy("lang", "shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("sum_tokens")
    )


# ----------------------------------------------------- decontamination

# 4-word shingles: long enough to be discriminative on the synthetic
# corpus (8-grams yield zero overlap at sf0.01 — a vacuous check); real
# deployments tune this to the benchmark's n-gram convention (8-13).
NGRAM_N = 4
BENCH_MOD = 97  # docs with doc_id % 97 == 0 act as the held-out benchmark


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    starts AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - {NGRAM_N - 1})) AS i
      FROM toks WHERE len(t) >= {NGRAM_N}
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(t[i:i + {NGRAM_N - 1}], ' ')) AS g
      FROM starts
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0)
    SELECT doc_id, count(*) AS n_shared_ngrams
    FROM grams JOIN bench USING (g)
    WHERE doc_id % {BENCH_MOD} <> 0
    GROUP BY doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: flag training docs sharing any word
    4-gram (NGRAM_N) with the held-out benchmark slice (here: doc_id %
    BENCH_MOD == 0 stands in for the benchmark corpus).  Docs carry only
    md5 gram hashes past the tokenizer, so the join shuffles 16-byte
    keys, never text.  The benchmark gram set is tiny relative to the
    corpus (1/BENCH_MOD of docs) and broadcast — the common case at
    scale, where benchmarks are MBs against TBs of training data; the
    per-doc distinct-gram count is the contamination score used to drop
    or audit."""
    doc = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams = (
        doc.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= NGRAM_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (NGRAM_N - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("t", i, NGRAM_N))),
                )
            ).alias("g"),
        )
        .distinct()
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


# ------------------------------------------------------- term salience

SALIENT_TOPK = 3


@query(
    "tfidf_top_terms",
    f"""
    WITH occ AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM occ GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM occ GROUP BY tok
    ),
    ranked AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.tok) AS rk
      FROM tf JOIN df USING (tok)
    )
    SELECT doc_id, rk, tok, tf, df FROM ranked WHERE rk <= {SALIENT_TOPK}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms: top-SALIENT_TOPK tokens ranked by
    (term frequency desc, document frequency asc, token) — the tf-idf
    ordering without the idf logarithm, so the ranking is pure integer
    comparison and hashes identically across engines (log-of-ratio floats
    would not).  The keyword-extraction pass behind corpus tagging.

    Plan: one (doc, tok) aggregate, one small df aggregate joined back
    (at web scale the df table is vocabulary-sized — broadcast or
    shuffle-join, Catalyst/AQE decides), one per-doc window.  Partial
    aggregation keeps the heavy (doc, tok) stage map-side combined."""
    occ = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = occ.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = occ.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("tok")
    )
    ranked = tf.join(df, "tok").withColumn("rk", F.row_number().over(w))
    return ranked.filter(F.col("rk") <= SALIENT_TOPK).select(
        "doc_id", "rk", "tok", "tf", "df"
    )


# ----------------------------------------------------------- vocabulary

VOCAB_TOPK = 50


@query(
    "vocab_topk",
    f"""
    WITH occ AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT tok, count(*) AS n_occ, count(DISTINCT doc_id) AS df
    FROM occ GROUP BY tok
    ORDER BY df DESC, n_occ DESC, tok
    LIMIT {VOCAB_TOPK}
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build: top-VOCAB_TOPK tokens by document frequency with
    occurrence counts — the corpus statistics pass behind tokenizer
    training and stopword lists.  Partial aggregation happens map-side
    (Catalyst), the final top-k is a TakeOrderedAndProject over the
    (small) distinct-token aggregate; ties break deterministically on
    (df, n_occ, tok)."""
    occ = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    agg = occ.groupBy("tok").agg(
        F.count("*").alias("n_occ"), F.countDistinct("doc_id").alias("df")
    )
    return agg.orderBy(
        F.desc("df"), F.desc("n_occ"), F.asc("tok")
    ).limit(VOCAB_TOPK).select("tok", "n_occ", "df")
