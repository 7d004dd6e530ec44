"""Text transforms over web-page content — all Arrow-batched pandas UDFs
(BASELINE.json input_hint: no per-row Python UDFs).

* ``extract_text_udf`` — deterministic HTML -> text (byte-identical per url,
  the reference-parity invariant; definition pinned in
  tis_spark.fixtures.gen.extract_text).
* language-ID, quality scoring, token counting, fingerprinting for the
  training-data-pipeline operator set (expressed as Catalyst expressions
  where possible; pandas UDFs only where regex/unicode work requires it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from tis_spark.fixtures.gen import extract_text


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text, na_action="ignore")


# ---------------------------------------------------------------- analysis
# These operate on a `text` column and are pure Catalyst expressions
# (JVM-side, whole-stage codegen) — no Python in the hot path.

# Tiny per-language stopword sets for an n-gram-free language-ID heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "les", "et", "des"],
    "es": ["el", "los", "las", "que", "una"],
}


def lang_id_expr(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword hit-counts, 'und' if none."""
    toks = F.split(F.lower(text), r"[^\p{L}]+")

    def hits_for(markers):
        # single-param lambda only: a second param would be bound to the
        # element-index argument of the higher-order filter()
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    scores = []
    for lang, markers in _LANG_MARKERS.items():
        hits = hits_for(markers)
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_expr(text: Column) -> Column:
    """Whitespace-ish token count (BPE-ish: words and standalone punct)."""
    toks = F.split(F.trim(text), r"\s+")
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(toks))


def quality_score_expr(text: Column) -> Column:
    """Quality heuristic in [0,1]: length, punctuation ratio, mean word len."""
    n = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", "")).cast("double")
    words = token_count_expr(text).cast("double")
    mean_word = F.when(words > 0, n / words).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + punct_score + word_score) / 3.0, 4)


def fingerprint_expr(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash of normalized text)."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    return F.xxhash64(norm)
