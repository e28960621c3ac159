from riko_spark.sources.pages import PAGES_SCHEMA, generate_pages, write_pages  # noqa: F401
from riko_spark.sources.tables import load_tables, read_table  # noqa: F401
