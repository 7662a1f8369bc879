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


def _nfc(s: str) -> str:
    import unicodedata
    return unicodedata.normalize("NFC", s)


@F.pandas_udf(StringType())
def _nfc_normalize(batch: pd.Series) -> pd.Series:
    return batch.map(lambda s: _nfc(s) if isinstance(s, str) else s)


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC normalization — canonical composition, so the two
    on-the-wire spellings of "café" (precomposed é vs e + COMBINING
    ACUTE) become byte-identical. Without it, exact/normalized dedup and
    every md5-keyed operator silently treat canonical-equivalent texts
    as distinct documents — a real failure mode in multi-source crawls,
    invisible to ASCII fixtures.

    Spark has no JVM NFC builtin, so this is the third sanctioned
    Python stage (with unicode_to_utf8 and the multimodal extractor):
    an Arrow-batched pandas UDF over Python's unicodedata, whose NFC
    agrees with DuckDB's ``nfc_normalize`` (probed on composed,
    decomposed, ligature and stacked-combining cases — ligatures are
    NOT folded, that would be NFKC). NULLs pass through."""
    return _nfc_normalize(F.col(col) if isinstance(col, str) else col)
