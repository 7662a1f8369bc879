from .registry import (  # noqa: F401
    TABLES,
    TableSpec,
    schema_of,
    unique_key_of,
    table_names,
)
