from tis_spark.lake.table import CommitConflict, LakeTable, Snapshot  # noqa: F401
