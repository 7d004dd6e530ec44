"""Corpus-quality operators: repetition detection, composite quality
filtering, per-language distribution stats.

These are the Gopher/C4-style heuristic filters a web-scale training-data
pipeline runs after language ID and before dedup.  Determinism strategy
matches traindata.py/mlops.py: integer or scaled-integer outputs only
(floor(1e4 * ratio) instead of float division), explicit deterministic
tie-breaks, every random-free — so the Spark plan and the DuckDB oracle
hash-match bit-for-bit.

Scale notes are per-operator; the common property: repetition and the
quality filter are pure per-row array arithmetic (no shuffle at all — they
fuse into the parquet scan), and the decile stats shuffle once on the
window key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# ------------------------------------------------------------ repetition

REP_N = 3  # word n-gram order for the duplicate-n-gram fraction


@query(
    "text_repetition_ratio",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id,
             [array_to_string(t[i:i + {REP_N - 1}], ' ')
              FOR i IN generate_series(1, len(t) - {REP_N - 1})] AS grams
      FROM t WHERE len(t) >= {REP_N}
    )
    SELECT doc_id,
           len(grams) AS n_grams,
           len(grams) - len(list_distinct(grams)) AS n_dup,
           CAST(floor(10000.0 * (len(grams) - len(list_distinct(grams)))
                      / len(grams)) AS BIGINT) AS dup_frac_e4
    FROM g
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate word-3-gram fraction per document (the Gopher
    repetition signal: boilerplate and spam pages repeat themselves).

    Pure per-row array arithmetic — build the n-gram list with
    transform(sequence(...)), count it and its array_distinct — so the
    operator is a narrow map fused into the scan: zero shuffle, zero
    Python, and at 100 TB it scales embarrassingly with input splits.
    The ratio is emitted as floor(1e4 * frac) to keep the cross-engine
    hash exact (no float-tie exposure)."""
    doc = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (REP_N - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, REP_N)),
    )
    g = doc.filter(F.size(t) >= REP_N).select("doc_id", grams.alias("grams"))
    n = F.size("grams")
    nd = F.size(F.array_distinct("grams"))
    return g.select(
        "doc_id",
        n.alias("n_grams"),
        (n - nd).alias("n_dup"),
        F.floor(10000.0 * (n - nd) / n).cast("long").alias("dup_frac_e4"),
    )


# -------------------------------------------------------- quality filter

STOPWORDS = ("the", "a", "and", "of", "to", "in")
MIN_WORDS, MAX_WORDS = 10, 1_000_000
MIN_MWL_E4, MAX_MWL_E4 = 25_000, 80_000  # mean word length in [2.5, 8.0]
MIN_TTR_E4 = 2_000  # type-token ratio >= 0.2
MIN_STOP = 1  # at least one stopword occurrence


@query(
    "gopher_quality_filter",
    f"""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(t) AS n_words,
             CAST(floor(10000.0 * list_sum([len(x) FOR x IN t]) / len(t))
                  AS BIGINT) AS mean_wl_e4,
             CAST(floor(10000.0 * len(list_distinct(t)) / len(t))
                  AS BIGINT) AS ttr_e4,
             len(list_filter(t, x -> x IN {STOPWORDS!r})) AS n_stop
      FROM s WHERE len(t) > 0
    )
    SELECT doc_id, n_words, mean_wl_e4, ttr_e4, n_stop,
           (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
            AND mean_wl_e4 BETWEEN {MIN_MWL_E4} AND {MAX_MWL_E4}
            AND ttr_e4 >= {MIN_TTR_E4}
            AND n_stop >= {MIN_STOP}) AS keep
    FROM m
    """,
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-style quality rules per document: word count
    bounds, mean word length band, type-token ratio floor, stopword
    presence.  Emits the per-rule signals plus the final ``keep`` verdict
    so downstream curation can audit which rule fired.

    Like the repetition ratio this is a narrow per-row map (array
    aggregates via higher-order functions, all JVM-side): it pipelines
    with the scan and needs no shuffle at any scale.  Ratios are
    floor-scaled integers for exact cross-engine hashing."""
    doc = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    base = doc.filter(F.size(t) > 0).select("doc_id", t.alias("t"))
    n = F.size("t")
    sum_len = F.aggregate(
        F.transform("t", lambda x: F.length(x)), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mwl = F.floor(10000.0 * sum_len / n).cast("long")
    ttr = F.floor(10000.0 * F.size(F.array_distinct("t")) / n).cast("long")
    n_stop = F.size(F.filter("t", lambda x: x.isin(*STOPWORDS)))
    m = base.select(
        "doc_id",
        n.alias("n_words"),
        mwl.alias("mean_wl_e4"),
        ttr.alias("ttr_e4"),
        n_stop.cast("long").alias("n_stop"),
    )
    keep = (
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_wl_e4").between(MIN_MWL_E4, MAX_MWL_E4)
        & (F.col("ttr_e4") >= MIN_TTR_E4)
        & (F.col("n_stop") >= MIN_STOP)
    )
    return m.withColumn("keep", keep)


# ------------------------------------------------------- length deciles

N_TILES = 10


@query(
    "length_decile_stats",
    f"""
    WITH r AS (
      SELECT lang, n_chars,
             ntile({N_TILES}) OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT lang, decile, count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM r GROUP BY lang, decile
    """,
)
def length_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length deciles (the distribution audit behind
    length-filter thresholds), EXACTLY equal to
    ``ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)`` but
    without the one-window-task-per-language plan the r2 version shipped
    (its acknowledged 100-TB weakness):

    1. count per (lang, n_chars) — map-side-combined aggregate;
    2. prefix sums over the DISTINCT length values (a window over
       thousands of rows, not billions);
    3. per-row tie index via a window partitioned by (lang, n_chars) —
       fine partitions, fully parallel;
    4. global rank = prefix + tie index; the tile is ntile's closed form
       (first n%k tiles get one extra row).

    No stage puts a whole language through one task; the heaviest
    shuffle is the per-(lang, length) tie window."""
    doc = load(spark, sf_dir, "documents").select("lang", "n_chars", "doc_id")
    cnt = doc.groupBy("lang", "n_chars").agg(F.count("*").alias("_c"))
    wv = Window.partitionBy("lang").orderBy("n_chars")
    pref = cnt.select(
        "lang",
        "n_chars",
        (F.sum("_c").over(wv) - F.col("_c")).alias("_prefix"),
        F.sum("_c").over(Window.partitionBy("lang")).alias("_n"),
    )
    wtie = Window.partitionBy("lang", "n_chars").orderBy("doc_id")
    ranked = (
        doc.withColumn("_i", F.row_number().over(wtie))
        .join(pref, ["lang", "n_chars"])
        .withColumn("_rank", F.col("_prefix") + F.col("_i"))
    )
    base = F.floor(F.col("_n") / N_TILES)
    rem = F.col("_n") % N_TILES
    head = (base + F.lit(1)) * rem  # rows covered by the size-(base+1) tiles
    decile = F.when(
        F.col("_rank") <= head,
        F.floor((F.col("_rank") - 1) / (base + 1)) + 1,
    ).otherwise(rem + F.floor((F.col("_rank") - head - 1) / base) + 1)
    r = ranked.select("lang", "n_chars", decile.cast("int").alias("decile"))
    return r.groupBy("lang", "decile").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_pii_scrub",
    """
    WITH aug AS (
      SELECT doc_id,
             substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.org or call 5550' || CAST(n_chars AS VARCHAR) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
             '[0-9]{4,}', '<NUM>', 'g') AS scrubbed
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking pass (a standard pre-training curation stage): email
    addresses and long digit runs replaced with typed placeholders.  Pure
    Catalyst regexp_replace — narrow map, zero shuffle, whole-stage
    codegen; the synthetic corpus carries no PII, so the fixture plants a
    deterministic email+phone per row and the oracle scrubs the same
    construction."""
    doc = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or call 5550"),
        F.col("n_chars").cast("string"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(raw, r"[a-z0-9._]+@[a-z0-9.]+", "<EMAIL>"),
        r"[0-9]{4,}",
        "<NUM>",
    )
    return doc.select("doc_id", scrub.alias("scrubbed"))
