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
