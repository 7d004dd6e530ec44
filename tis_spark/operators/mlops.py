"""Training-data-pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing (first-class components per the build
contract; exercised over the driver's documents/embeddings tables).

Cross-engine determinism strategy: every hash used in an oracle-checked
query is md5 (identical in Spark and DuckDB); minhash minima are *string*
minima over md5 hex, so both engines agree bit-for-bit.  Floating-point
outputs are computed in float64 with identical association order and
rounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.operators import load, query

# ---------------------------------------------------------------- dedup

N_MINHASH = 16  # 4 bands x 4 rows
ROWS_PER_BAND = 4


def _tokens(df: DataFrame) -> DataFrame:
    return df.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).distinct()


@query(
    "dedup_exact",
    """
    SELECT lang, source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique_texts
    FROM documents GROUP BY lang, source
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        )
    )


_MINHASH_SQL = """
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
mh AS (
  SELECT doc_id, {minhash_cols}
  FROM dt GROUP BY doc_id
),
bands AS (
  {band_union}
),
pairs AS (
  -- band_idx is part of the join key, so (pair, band) rows are unique:
  -- plain count == count(DISTINCT band_idx), without the dedup pass
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT n_bands, count(*) AS n_candidate_pairs FROM pairs GROUP BY n_bands
""".format(
    minhash_cols=", ".join(f"min(md5('{i}:' || tok)) AS h{i}" for i in range(N_MINHASH)),
    band_union="\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, {val} AS band_val FROM mh".format(
            b=b,
            val=" || ".join(f"h{ROWS_PER_BAND * b + r}" for r in range(ROWS_PER_BAND)),
        )
        for b in range(N_MINHASH // ROWS_PER_BAND)
    ),
)


def minhash_band_rows(dt: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_val) LSH band rows from a (doc_id, tok)
    token frame — one pass over the minhash signatures: posexplode the
    band array instead of a per-band union (a union of N selects
    re-executes the minhash aggregation N times — 8x the shuffle at any
    scale).  Shared by the batch dedup queries and the incrementally
    maintained LSH index (lake/derived.py's ``minhash_bands`` transform),
    so a maintained signature store is bit-identical to a batch rebuild."""
    mh = dt.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}:"), "tok"))).alias(f"h{i}") for i in range(N_MINHASH)]
    )
    return mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(*[F.col(f"h{ROWS_PER_BAND * b + r}") for r in range(ROWS_PER_BAND)])
                    for b in range(N_MINHASH // ROWS_PER_BAND)
                ]
            )
        ).alias("band_idx", "band_val"),
    )


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_band_rows(_tokens(load(spark, sf_dir, "documents")))


def _lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_bands) candidate pairs from the MinHash band join
    — shared by the histogram query and the exact-verify stage."""
    bands = _minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    bb = bands.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )
    return pairs


@query("dedup_minhash_lsh", _MINHASH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup candidates: shingle(token)->minhash->band->
    bucket-join.  md5-string minima make the signature engine-portable.
    At scale the band join is a shuffle on band_val (small signatures),
    never on document text."""
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    return pairs.groupBy("n_bands").agg(F.count("*").alias("n_candidate_pairs"))


_JACCARD_ON_LSH_SQL = (
    _MINHASH_SQL[: _MINHASH_SQL.rindex("SELECT n_bands")]
    + """, sz AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM pairs p
  JOIN dt ta ON ta.doc_id = p.doc_a
  JOIN dt tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2
)
SELECT round(i * 1.0 / (sa.n + sb.n - i), 1) AS jac_bucket, count(*) AS n_pairs
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
GROUP BY 1
"""
)


@query("dedup_jaccard_on_lsh", _JACCARD_ON_LSH_SQL)
def dedup_jaccard_on_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage near-dup pipeline: exact token-set Jaccard computed ONLY
    on MinHash-LSH candidate pairs — the web-scale shape (LSH as the
    recall filter, exact verify on the ~linear candidate set) that
    replaces both the all-pairs join and the df-capped approximation.
    Cost is O(candidates x tokens/doc): no full inverted-index self-join
    ever runs, so no hot token can explode the pair set."""
    pairs = _lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    dt = _tokens(load(spark, sf_dir, "documents"))
    sz = dt.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = dt.alias("ta")
    tb = dt.alias("tb")
    inter = (
        pairs.join(ta, F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            tb,
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("tb.tok") == F.col("ta.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            F.round(F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i")), 1).alias(
                "jac_bucket"
            )
        )
    )
    return jac.groupBy("jac_bucket").agg(F.count("*").alias("n_pairs"))


_COMPONENTS_SQL = (
    _MINHASH_SQL[: _MINHASH_SQL.rindex("pairs AS")].replace(
        "WITH dt AS", "WITH RECURSIVE dt AS", 1
    )
    + """bmin AS (
  SELECT band_idx, band_val, min(doc_id) AS root, count(*) AS m
  FROM bands GROUP BY 1, 2
),
star AS (
  SELECT DISTINCT b.root AS src, s.doc_id AS dst
  FROM bmin b JOIN bands s
    ON s.band_idx = b.band_idx AND s.band_val = b.band_val
  WHERE b.m >= 2 AND s.doc_id <> b.root
),
edges AS (SELECT src, dst FROM star UNION ALL SELECT dst, src FROM star),
reach(doc_id, peer) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.peer
)
SELECT doc_id, min(peer) AS component FROM reach GROUP BY doc_id
"""
)


@query("dedup_cluster_components", _COMPONENTS_SQL)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the LSH bucket
    graph (docs sharing a band bucket), so each duplicate *group*
    collapses to one canonical doc_id — the step after pair generation in
    a crawl-dedup pipeline (keep min doc_id per component, drop the rest).

    Two scale decisions:

    1. **Star edges, not candidate pairs.**  A bucket of m near-identical
       docs yields m(m-1)/2 candidate pairs — quadratic in cluster size
       (measured: 7.4M pair edges over 4,801 clustered docs at sf0.1).
       Connectivity only needs a spanning star per bucket: bucket-min ->
       each member, linear in bucket size (~20k edges for the same
       input, a 370x cut) with provably identical components.
    2. **Min-label propagation with pointer jumping.**  Each round (a)
       propagates labels across the edge list with one equi-join +
       min-aggregate, then (b) compresses paths by relabeling through
       the label map itself (component <- label(component)), so chains
       of star roots converge in O(log diameter) rounds.  Per-round
       cost is two shuffles of edge/label lists, never of document
       text; lineage is truncated every round (localCheckpoint; on a
       cluster, checkpoint to the DFS) so round N does not re-execute
       rounds 1..N-1.

    Oracle: DuckDB recursive CTE computing min reachable id per node
    over the same star edges."""
    bands = _minhash_bands(spark, sf_dir)
    bmin = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.min("doc_id").alias("root"), F.count("*").alias("m"))
        .filter(F.col("m") >= 2)
    )
    star = (
        bands.join(bmin, ["band_idx", "band_val"])
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )
    edges = star.union(star.select("dst", "src")).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    while True:
        prop = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .select(F.col("dst").alias("doc_id"), "component")
            .union(labels)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
        )
        # Pointer jump: every label is itself a node id, so relabel
        # through the map once per round — halves remaining path length.
        lmap = prop.select(
            F.col("doc_id").alias("_k"), F.col("component").alias("_v")
        )
        prop = (
            prop.join(lmap, prop["component"] == lmap["_k"])
            .select("doc_id", F.col("_v").alias("component"))
            .localCheckpoint(eager=True)
        )
        n_changed = (
            prop.join(labels.withColumnRenamed("component", "prev"), "doc_id")
            .filter(F.col("component") < F.col("prev"))
            .count()
        )
        labels = prop
        if n_changed == 0:
            return labels


# Document-frequency cap for the inverted-index self-join: a token seen in
# more than this many documents contributes df^2 candidate pairs (stopwords,
# boilerplate), which is effectively all-pairs at web scale.  Capped tokens
# are excluded from the token universe on BOTH engines, so the Jaccard is
# over the discriminative-token set — the standard df-capped approximation.
NGRAM_DF_CAP = 100


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH dt0 AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    rare AS (SELECT tok FROM dt0 GROUP BY tok HAVING count(*) <= {NGRAM_DF_CAP}),
    dt AS (SELECT dt0.doc_id, dt0.tok FROM dt0 JOIN rare USING (tok)),
    sz AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT round(i * 1.0 / (sa.n + sb.n - i), 1) AS jac_bucket, count(*) AS n_pairs
    FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
    GROUP BY 1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard similarity histogram over candidate pairs (pairs
    sharing >=1 discriminative token).  The inverted-index join (dt
    self-join on tok) shuffles on token, not O(n^2) docs — and the df cap
    bounds the per-token pair fan-out at df^2 <= NGRAM_DF_CAP^2, so no hot
    token (stopword / boilerplate) can explode the candidate set at scale."""
    dt0 = _tokens(load(spark, sf_dir, "documents"))
    rare = dt0.groupBy("tok").agg(F.count("*").alias("df")).filter(
        F.col("df") <= NGRAM_DF_CAP
    )
    dt = dt0.join(rare.select("tok"), "tok", "left_semi")
    sz = dt.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = dt.alias("a")
    b = dt.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("i"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    jac = (
        inter.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .select(
            F.round(F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i")), 1).alias("jac_bucket")
        )
    )
    return jac.groupBy("jac_bucket").agg(F.count("*").alias("n_pairs"))


_SIMHASH_SQL = """
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
nib AS (
  SELECT doc_id, tok, p.p, instr('0123456789abcdef', substr(md5(tok), p.p + 1, 1)) - 1 AS v
  FROM dt, (SELECT unnest(range(0, 16)) AS p) p
),
bits AS (
  SELECT doc_id, p, j.j,
         sum(CASE WHEN CAST(floor(v / power(2, j.j)) AS INTEGER) % 2 = 1 THEN 1 ELSE -1 END) AS w
  FROM nib, (SELECT unnest(range(0, 4)) AS j) j
  GROUP BY doc_id, p, j.j
)
SELECT doc_id,
       string_agg(CASE WHEN w > 0 THEN '1' ELSE '0' END, '' ORDER BY p, j) AS simhash64
FROM bits GROUP BY doc_id
"""


@query("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document from md5 nibbles (portable bit
    arithmetic identical to the DuckDB spec above).

    Single-aggregate formulation: each (doc, token) row projects its 64
    +/-1 bit contributions as columns, then ONE groupBy(doc_id) sums them
    (partial aggregation map-side).  Equivalent to the two-crossJoin /
    64-row-blow-up shape but shuffles the token table once at ~64 longs of
    partial-agg state per doc, not 64x the exploded rows."""
    dt = _tokens(load(spark, sf_dir, "documents"))
    h = dt.select("doc_id", F.md5("tok").alias("h"))
    # v_p = value of hex nibble p; bit j of v_p contributes +1/-1 to w[p,j].
    contrib = h.select(
        "doc_id",
        *[
            F.when(
                F.shiftright(
                    F.instr(F.lit("0123456789abcdef"), F.substring("h", p + 1, 1)) - 1, j
                ).bitwiseAND(1)
                == 1,
                1,
            )
            .otherwise(-1)
            .alias(f"s_{p}_{j}")
            for p in range(16)
            for j in range(4)
        ],
    )
    sums = contrib.groupBy("doc_id").agg(
        *[F.sum(f"s_{p}_{j}").alias(f"w_{p}_{j}") for p in range(16) for j in range(4)]
    )
    bitstr = F.concat(
        *[
            F.when(F.col(f"w_{p}_{j}") > 0, "1").otherwise("0")
            for p in range(16)
            for j in range(4)
        ]
    )
    return sums.select("doc_id", bitstr.alias("simhash64"))


# ---------------------------------------------------------------- similarity

_COS_EXPR = """
round(
  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
  / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)
"""


def _cos_col(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.round(dot / (na * nb), 4)


@query(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT b.vec_id,
           round(list_dot_product(b.embedding::DOUBLE[], q.qe::DOUBLE[])
                 / (sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))), 4) AS cos_sim
    FROM embeddings b, q
    WHERE b.vec_id <> 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector — the ANN
    baseline.  At scale: broadcast the query set, scan once, `TopK` via
    orderBy+limit (Catalyst turns it into TakeOrderedAndProject)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", _cos_col("embedding", "qe").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


# Hot-list cap: an inverted list of size m costs m^2/2 pairs; a skewed
# clustering (one giant list) degenerates to all-pairs.  Lists above the cap
# are excluded on BOTH engines.  The production path for a capped list is
# re-clustering (split the list and recurse), not comparison.
IVF_LIST_CAP = 10_000


@query(
    "ann_ivf_blocked",
    f"""
    SELECT a.label, count(*) AS n_pairs, max({_COS_EXPR}) AS max_cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.label IN (
      SELECT label FROM embeddings GROUP BY label HAVING count(*) <= {IVF_LIST_CAP}
    )
    GROUP BY a.label
    """,
)
def ann_ivf_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style blocked similarity: pairs are only compared within a
    coarse partition (label = the inverted-list id), the scale path that
    avoids the O(n^2) cross join.  Lists larger than IVF_LIST_CAP are
    excluded (they need re-clustering, not within-list comparison) so one
    hot list cannot reintroduce the quadratic blow-up."""
    emb = load(spark, sf_dir, "embeddings")
    ok = emb.groupBy("label").agg(F.count("*").alias("m")).filter(
        F.col("m") <= IVF_LIST_CAP
    )
    emb = emb.join(ok.select("label"), "label", "left_semi")
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.label").alias("label"), _cos_col("a.embedding", "b.embedding").alias("cos"))
        .groupBy("label")
        .agg(F.count("*").alias("n_pairs"), F.max("cos").alias("max_cos"))
    )


@query(
    "ann_lsh_buckets",
    """
    SELECT concat(
             CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
             CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket,
           count(*) AS n
    FROM embeddings GROUP BY 1
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing (hyperplane LSH with axis-aligned planes):
    the bucket histogram that drives the bucketed ANN join at scale."""
    emb = load(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i) >= 0, "1").otherwise("0")
            for i in range(1, 9)
        ]
    ).alias("bucket")
    return emb.select(bucket).groupBy("bucket").agg(F.count("*").alias("n"))


# Embedding near-dup: candidate pairs come only from shared sign-LSH buckets
# (never an all-pairs join); buckets above the cap are excluded — at scale the
# plane count grows with log(n) so the expected bucket size stays constant,
# and a degenerate hot bucket (all-zero embeddings, boilerplate pages) cannot
# reintroduce the quadratic blow-up.  Only (id, id, rounded-cos) cross the
# final shuffle; embeddings shuffle once, keyed by bucket.
EMB_BUCKET_CAP = 10_000
EMB_DEDUP_THRESHOLD = 0.30
EMB_DEDUP_TOPN = 50

_EMB_BUCKET_SQL = "concat(" + ", ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
) + ")"


@query(
    "dedup_embedding_cosine",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_EMB_BUCKET_SQL} AS bucket FROM embeddings
    ),
    ok AS (
      SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= {EMB_BUCKET_CAP}
    ),
    p AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             round(list_dot_product(a.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               4) AS cos_sim
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      JOIN ok ON a.bucket = ok.bucket
    )
    SELECT id_a, id_b, cos_sim FROM p
    WHERE cos_sim >= {EMB_DEDUP_THRESHOLD}
    ORDER BY cos_sim DESC, id_a, id_b
    LIMIT {EMB_DEDUP_TOPN}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: the strongest near-dup candidate pairs,
    restricted to sign-LSH co-bucketed vectors (hyperplane LSH blocking).
    Completes the dedup family (exact / MinHash+LSH / SimHash / n-gram
    Jaccard / embedding cosine).  Scale path: bucket join + size cap per
    the note above; orderBy+limit compiles to TakeOrderedAndProject, so
    only top-k pairs reach the driver."""
    emb = load(spark, sf_dir, "embeddings")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", i) >= 0, "1").otherwise("0")
            for i in range(1, 9)
        ]
    )
    b = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    ok = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") <= EMB_BUCKET_CAP)
    )
    b = b.join(ok.select("bucket"), "bucket", "left_semi")
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            _cos_col("a.embedding", "c.embedding").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= EMB_DEDUP_THRESHOLD)
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
        .limit(EMB_DEDUP_TOPN)
    )


# ---------------------------------------------------------------- text analysis


@query(
    "text_token_count",
    """
    SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens, n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        "n_chars",
    )


@query(
    "text_quality_score",
    """
    SELECT doc_id,
      round((
        least(length(text) / 500.0, 1.0)
        + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 10.0 / length(text), 1.0))
        + (CASE WHEN length(text) * 1.0 / len(string_split_regex(trim(text), '\\s+')) BETWEEN 3 AND 12
                THEN 1.0 ELSE 0.5 END)
      ) / 3.0, 4) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = F.length("text").cast("double")
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).cast("double")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    mean_word = n / words
    len_score = F.least(n / 500.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct * 10.0 / n, F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.5)
    return docs.select("doc_id", F.round((len_score + punct_score + word_score) / 3.0, 4).alias("quality"))


_LANG_SQL = """
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
h AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'in'))) AS he,
         len(list_filter(toks, x -> x IN ('der', 'die', 'und', 'nicht', 'das'))) AS hd,
         len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et', 'des'))) AS hf
  FROM t
)
SELECT doc_id,
       CASE WHEN he = 0 AND hd = 0 AND hf = 0 THEN 'und'
            WHEN he >= hd AND he >= hf THEN 'en'
            WHEN hd >= hf THEN 'de'
            ELSE 'fr' END AS lang_guess
FROM h
"""


@query("text_lang_id", _LANG_SQL)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID heuristic (deterministic tiebreak
    en > de > fr)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    markers = {
        "he": ["the", "and", "of", "to", "in"],
        "hd": ["der", "die", "und", "nicht", "das"],
        "hf": ["le", "la", "les", "et", "des"],
    }
    def hit_count(ms):
        # single-param lambda: a second param would be read by Spark as the
        # element-index argument of the higher-order filter()
        return F.size(F.filter(toks, lambda t: t.isin(ms)))

    cols = {k: hit_count(ms).alias(k) for k, ms in markers.items()}
    h = docs.select("doc_id", *cols.values())
    guess = (
        F.when((F.col("he") == 0) & (F.col("hd") == 0) & (F.col("hf") == 0), "und")
        .when((F.col("he") >= F.col("hd")) & (F.col("he") >= F.col("hf")), "en")
        .when(F.col("hd") >= F.col("hf"), "de")
        .otherwise("fr")
    )
    return h.select("doc_id", guess.alias("lang_guess"))


@query(
    "text_fingerprint",
    """
    SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content document fingerprint (md5 for portability;
    the engine-internal variant uses xxhash64, functions/text.py)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("fingerprint")
    )


# ---------------------------------------------------------------- multimodal


@query(
    "multimodal_binary_meta",
    """
    SELECT doc_id, octet_length(encode(text)) AS byte_len, substr(text, 1, 4) AS head4
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: treat content as bytes + typed
    metadata (byte length, magic prefix)."""
    docs = load(spark, sf_dir, "documents").withColumn("blob", F.col("text").cast("binary"))
    return docs.select(
        "doc_id",
        F.octet_length("blob").alias("byte_len"),
        F.substring("text", 1, 4).alias("head4"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def _decode_batch(iterator):
    """Deterministic fake decode: real image/audio libs are absent in this
    container, so the decode itself is stubbed (documented contract) while
    the Spark plumbing — binary column in, Arrow batches, typed metadata
    out — is real and tested."""
    for pdf in iterator:
        blobs = pdf["blob"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": ["png" if (b[0] % 2 == 0) else "jpeg" for b in blobs],
                "width": [64 + (b[0] % 8) * 16 for b in blobs],
                "height": [64 + (b[-1] % 8) * 16 for b in blobs],
                "n_frames": [1 for _ in blobs],
            }
        )


@query(
    "multimodal_decode_stub",
    # The stub's fake decode is pure byte arithmetic over the blob (first /
    # last byte), so it IS SQL-expressible: decode the bytes from the blob's
    # hex representation.  This verifies the mapInPandas plumbing (binary in,
    # Arrow batches, typed struct out) end-to-end against an oracle.
    """
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ),
    v AS (
      SELECT doc_id,
             (instr('0123456789ABCDEF', substr(hx, 1, 1)) - 1) * 16
               + instr('0123456789ABCDEF', substr(hx, 2, 1)) - 1 AS b0,
             (instr('0123456789ABCDEF', substr(hx, n * 2 - 1, 1)) - 1) * 16
               + instr('0123456789ABCDEF', substr(hx, n * 2, 1)) - 1 AS bl
      FROM b
    )
    SELECT doc_id,
           CASE WHEN b0 % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
           CAST(64 + (b0 % 8) * 16 AS BIGINT) AS width,
           CAST(64 + (bl % 8) * 16 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_frames
    FROM v
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return docs.mapInPandas(_decode_batch, schema=_DECODE_SCHEMA)
