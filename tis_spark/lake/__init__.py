from tis_spark.lake.derived import DerivedIndex, derived_transform  # noqa: F401
from tis_spark.lake.matview import MaterializedView, refresh_views  # noqa: F401
from tis_spark.lake.replica import TableReplica  # noqa: F401
from tis_spark.lake.table import CommitConflict, LakeTable, Snapshot  # noqa: F401
