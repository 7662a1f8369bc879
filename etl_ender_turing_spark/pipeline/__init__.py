from .transform import transform_base_dicts, transform_sessions, transform_all  # noqa: F401
from .fixtures import raw_fixture_tables  # noqa: F401
