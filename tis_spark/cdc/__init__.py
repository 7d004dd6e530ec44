from tis_spark.cdc.pipeline import CdcIngest  # noqa: F401
from tis_spark.cdc.semantics import CdcConfig  # noqa: F401
