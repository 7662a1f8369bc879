from .catalog import CATALOG, QuerySpec  # noqa: F401
from . import llm_catalog  # noqa: F401  (registers LLM-op queries)
