from tis_spark.fixtures.gen import (  # noqa: F401
    CHANGE_SCHEMA,
    PAGE_SCHEMA,
    SCHEMA_SCRIPT,
    extract_text,
    gen_page_changes,
    gen_pages,
)
