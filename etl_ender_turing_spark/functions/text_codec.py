"""unicode_to_utf8 parity (reference: ETL/utils.py:208-213).

The reference decodes unicode-escape sequences left in API strings
(``"Caf\\u00e9"`` → ``"Café"``), passing non-strings through. Spark has
no built-in unicode-escape decoder, so this is one of the two sanctioned
Python stages in the engine (the other is the multimodal extractor):
an Arrow-batched pandas UDF — vectorized transfer, never row-at-a-time.

With proper JSON decoding upstream this is rarely needed (JSON parsers
already decode \\u escapes); it exists for parity with raw strings that
arrive double-escaped.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType


def _decode(s: str) -> str:
    try:
        return s.encode("latin-1", errors="backslashreplace") \
                .decode("unicode_escape")
    except Exception:
        return s


@F.pandas_udf(StringType())
def _unicode_to_utf8(batch: pd.Series) -> pd.Series:
    return batch.map(lambda s: _decode(s) if isinstance(s, str) else s)


def unicode_to_utf8(col: Column | str) -> Column:
    """Decode ``\\uXXXX`` / ``\\n``-style escape sequences in a string
    column; NULLs and undecodable values pass through unchanged."""
    return _unicode_to_utf8(F.col(col) if isinstance(col, str) else col)
