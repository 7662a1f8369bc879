from .conform import conform  # noqa: F401
from .normalize import FlattenSpec, flatten, flatten_two_level  # noqa: F401
from .upsert import upsert_parquet, dedup_latest  # noqa: F401
