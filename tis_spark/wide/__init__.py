"""Multi-table incremental wide-row maintenance (the reference's core
product re-expressed set-oriented): ER spec, FK-chain routing, restricted
re-aggregation, versioned merge."""

from tis_spark.wide.er import ERSpec, Relation, TableMeta
from tis_spark.wide.pipeline import WideRowPipeline

__all__ = ["ERSpec", "Relation", "TableMeta", "WideRowPipeline"]
