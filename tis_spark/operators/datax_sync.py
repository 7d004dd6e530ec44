"""Driver-checkable DataX sync operator (SURVEY §2.1 S6).

``datax_sync_roundtrip`` executes a real reader→writer job (parquet
documents → ORC via ``run_datax_job``, the §3.3 executor shape) and
returns per-(lang, source) aggregates computed FROM THE SYNCED COPY.
The DuckDB oracle computes the same aggregates from the original table,
so a green hash proves the sync moved every row and value losslessly
through the collapsed DataX type system.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tis_spark.operators import query
from tis_spark.sources.datax import DataxJob, run_datax_job


@query(
    "datax_sync_roundtrip",
    """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    GROUP BY lang, source
    """,
)
def datax_sync_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.mkdtemp(prefix="tis-datax-"), "docs_orc")
    job = DataxJob.from_config(
        {
            "job": {
                "setting": {"speed": {"channel": 2}},
                "content": [
                    {
                        "reader": {
                            "name": "hdfsreader",
                            "parameter": {
                                "path": f"{sf_dir}/documents.parquet",
                                "format": "parquet",
                            },
                        },
                        "writer": {
                            "name": "hdfswriter",
                            "parameter": {
                                "path": out,
                                "format": "orc",
                                "writeMode": "truncate",
                            },
                        },
                    }
                ],
            }
        }
    )
    run_datax_job(spark, job)
    synced = spark.read.format("orc").load(out)
    return synced.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_ids"),
    )
