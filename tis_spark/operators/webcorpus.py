"""Web-corpus curation operators: URL canonicalization, per-domain caps,
cross-document duplicated-span stats.

These are the web-pipeline stages that sit in front of the quality/dedup
family (quality.py, mlops.py): canonicalize the crawl's URLs, cap how many
documents any single domain may contribute, and measure how much of each
document is verbatim-shared with the rest of the corpus (the fixed-length
exact-substring signal of Lee et al. 2021's "Deduplicating Training Data",
approximated at gram granularity).

The synthetic `documents` table carries no URL column, so — exactly like
text_pii_scrub's planted emails (quality.py) — the URL operators derive a
deterministically messy URL per row from (source, lang, doc_id) and both
engines canonicalize the same construction; the canonicalizer itself is
written generically (scheme/host lowering, default-port and www stripping,
utm_* parameter removal, fragment and trailing-separator cleanup).

Determinism strategy matches quality.py: integer or floor-scaled-integer
outputs, explicit tie-breaks, no floats in hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# ------------------------------------------------------ URL canonicalize

_MESSY_SQL = """
      SELECT doc_id,
             'HTTPS://WWW.' || source || '.Example.COM:443/' || lang
               || '/p' || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&id='
               || CAST(doc_id AS VARCHAR) || '&utm_campaign=c&x=' || lang
               || '#frag' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
"""


@query(
    "url_canonicalize",
    f"""
    WITH m AS ({_MESSY_SQL}),
    parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(
               regexp_replace(lower(regexp_extract(url, '://([^/?#]+)', 1)),
                              ':(443|80)$', ''),
               '^www\\.', '') AS host,
             regexp_extract(url, '://[^/?#]+([^#]*)', 1) AS pathq
      FROM m
    ),
    clean AS (
      SELECT doc_id, url, scheme, host,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(pathq, '/\\?', '?'),
                     'utm_[a-z]+=[^&#]*&', '', 'g'),
                   '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
                 '\\?$', ''),
               '/$', '') AS pathq
      FROM parts
    )
    SELECT doc_id, url,
           scheme || '://' || host || pathq AS canon_url,
           host AS domain
    FROM clean
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonicalization: lowercase scheme+host, strip default
    ports (:80/:443) and a leading ``www.``, drop the fragment, remove
    ``utm_*`` tracking parameters, and clean dangling ``/``/``?``
    separators.  Emits the canonical URL plus the bare domain (the key the
    per-domain cap and hot-domain salting partition on).

    Pure Catalyst regexp chain — a narrow map fused into the scan: zero
    shuffle, zero Python, whole-stage codegen; at 100 TB it scales with
    input splits exactly like the PII scrub."""
    doc = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/p"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=c&x="),
        F.col("lang"),
        F.lit("#frag"),
        F.col("doc_id").cast("string"),
    )
    m = doc.select("doc_id", url.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"://([^/?#]+)", 1)), r":(443|80)$", ""
        ),
        r"^www\.",
        "",
    )
    pathq = F.regexp_extract("url", r"://[^/?#]+([^#]*)", 1)
    for pat, rep in (
        (r"/\?", "?"),
        (r"utm_[a-z]+=[^&#]*&", ""),
        (r"[?&]utm_[a-z]+=[^&#]*", ""),
        (r"\?$", ""),
        (r"/$", ""),
    ):
        pathq = F.regexp_replace(pathq, pat, rep)
    return m.select(
        "doc_id",
        "url",
        F.concat(scheme, F.lit("://"), host, pathq).alias("canon_url"),
        host.alias("domain"),
    )


# ------------------------------------------------------- per-domain cap

DOMAIN_CAP = 10  # max documents any one domain contributes


@query(
    "domain_cap_topk",
    f"""
    WITH r AS (
      SELECT doc_id, source || '.example.com' AS domain, n_chars,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id)
                  AS BIGINT) AS rnk
      FROM documents
    )
    SELECT doc_id, domain, n_chars, rnk FROM r WHERE rnk <= {DOMAIN_CAP}
    """,
)
def domain_cap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: keep each domain's top-``DOMAIN_CAP``
    documents by (n_chars DESC, doc_id ASC) — the standard guard against a
    handful of giant hosts dominating a web corpus.

    Semantics are exactly ``row_number() OVER (PARTITION BY domain ORDER BY
    n_chars DESC, doc_id) <= K``, but NOT computed with that window: a hot
    domain (a wiki with 10^8 pages) would put its whole partition through
    one task.  Instead the closed-form rank trick from length_decile_stats
    (quality.py): (1) count per (domain, n_chars) — map-side-combined;
    (2) descending prefix sums over the per-domain DISTINCT lengths (a
    window over thousands of rows, not billions); (3) per-row tie index via
    a window partitioned by (domain, n_chars) — fine partitions, fully
    parallel; (4) global rank = prefix + tie index, filter <= K.  No domain
    ever passes through a single task; the heaviest shuffle key is
    (domain, length)."""
    doc = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.com")).alias("domain"),
        "n_chars",
    )
    cnt = doc.groupBy("domain", "n_chars").agg(F.count("*").alias("_c"))
    wv = Window.partitionBy("domain").orderBy(F.col("n_chars").desc())
    pref = cnt.select(
        "domain",
        "n_chars",
        (F.sum("_c").over(wv) - F.col("_c")).alias("_prefix"),
    )
    wtie = Window.partitionBy("domain", "n_chars").orderBy("doc_id")
    ranked = (
        doc.withColumn("_i", F.row_number().over(wtie))
        .join(pref, ["domain", "n_chars"])
        .withColumn("rnk", (F.col("_prefix") + F.col("_i")).cast("long"))
    )
    return ranked.filter(F.col("rnk") <= DOMAIN_CAP).select(
        "doc_id", "domain", "n_chars", "rnk"
    )


# -------------------------------------- cross-document duplicated spans

SPAN_N = 8  # word n-gram length of an "exact substring" span
DUP_FRAC_MAX_E4 = 2_000  # keep iff < 20% of spans are corpus-duplicated


@query(
    "dup_span_stats",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest([md5(array_to_string(t[i:i + {SPAN_N - 1}], ' '))
                     FOR i IN generate_series(1, len(t) - {SPAN_N - 1})]) AS gram
      FROM t WHERE len(t) >= {SPAN_N}
    ),
    shared AS (
      SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1
    ),
    per_doc AS (
      SELECT g.doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(count(*) FILTER (WHERE shared.gram IS NOT NULL) AS BIGINT)
               AS n_dup_spans
      FROM g LEFT JOIN shared ON g.gram = shared.gram
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_spans, n_dup_spans,
           CAST(floor(10000.0 * n_dup_spans / n_spans) AS BIGINT)
             AS dup_frac_e4,
           (floor(10000.0 * n_dup_spans / n_spans) < {DUP_FRAC_MAX_E4}) AS keep
    FROM per_doc
    """,
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span fraction per document: the share of a
    document's word-{SPAN_N}-grams that also occur in at least one OTHER
    document (text_repetition_ratio's within-doc signal is the complement).
    This is the fixed-gram approximation of exact-substring dedup (Lee et
    al. 2021) — boilerplate, mirrored pages and licence blocks light up
    long before full-document dedup fires.

    Scale shape: grams are md5-hashed BEFORE the explode so only 32-byte
    hashes ever shuffle, never text (same rule as decontaminate /
    minhash in traindata.py/mlops.py).  One groupBy builds the shared-gram
    set (count-distinct with map-side partial aggregation), a left-semi-
    shaped join marks duplicated positions, and one per-doc aggregate
    emits the stats — three shuffles total, all on hash keys, no
    all-pairs stage anywhere.  Fraction emitted floor-scaled for exact
    cross-engine hashing."""
    doc = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (SPAN_N - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, SPAN_N))),
    )
    g = (
        doc.filter(F.size(t) >= SPAN_N)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    shared = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("_df"))
        .filter(F.col("_df") > 1)
        .select("gram")
    )
    marked = g.join(shared.withColumn("_dup", F.lit(1)), "gram", "left")
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.count("_dup").alias("n_dup_spans"),
    )
    frac = F.floor(10000.0 * F.col("n_dup_spans") / F.col("n_spans"))
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        frac.cast("long").alias("dup_frac_e4"),
        (frac < DUP_FRAC_MAX_E4).alias("keep"),
    )
