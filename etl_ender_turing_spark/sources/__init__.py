from .readers import load_tables, read_table, TESTDATA_TABLES  # noqa: F401
from .sinks import write_file  # noqa: F401
