"""File sinks — the reference's 7 output formats, with intended semantics.

Reference ``load2file`` (ET-ETL-DWH-PY312/ETL/Load.py:186-224) dispatches on
format; note its csv/xls/tsv branches are buggy (csv written via to_excel
Load.py:214, xls via to_csv :218, tsv calls nonexistent to_tsv :220). We
implement what was *intended*: each format writes that format.

Naming parity: fact files ``{name}-{start}-{stop}.{ext}``, dimension files
``dict-{name}.{ext}`` (Load.py:196-206).

- json/csv/tsv/parquet: distributed ``df.write`` — scale to any size.
- xlsx: driver-side via pandas (openpyxl availability gated) — dims only;
  guarded by a row cap so nobody collects a 100 TB fact to the driver.
- pickle (the reference CLI accepts it, run-et-etl.py:133-135):
  driver-side pandas ``to_pickle`` behind the same row cap, documented
  non-portable across Python/pandas versions — parquet remains the
  debug-dump format (Transform.py:176-177 equivalent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

XLSX_ROW_CAP = 1_000_000


def sink_path(out_dir: str, name: str, fmt: str, kind: str = "dim",
              start: str | None = None, stop: str | None = None) -> str:
    base = f"dict-{name}" if kind == "dim" else f"{name}-{start}-{stop}"
    return os.path.join(out_dir, f"{base}.{fmt}")


def debug_dump(tables: dict[str, DataFrame], out_dir: str,
               enabled: bool = False) -> None:
    """Debug artifact dump (reference: ETL/Transform.py:176-177 pickles
    every raw entity to ``{name}-debug.pkl``). Parquet instead of pickle
    (portable, splittable), gated off by default — at scale an unguarded
    full-input dump doubles the pipeline's write volume.
    """
    if not enabled:
        return
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}-debug"))


def write_file(df: DataFrame, path: str, fmt: str) -> None:
    fmt = fmt.lower()
    if fmt == "json":
        df.write.mode("overwrite").json(path)
    elif fmt == "csv":
        df.write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "tsv":
        df.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
    elif fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "orc":
        # beyond the reference's 7 formats: the other columnar container
        # Spark writes natively (predicate pushdown + pruning on read)
        df.write.mode("overwrite").orc(path)
    elif fmt in ("xlsx", "xls"):
        n = df.limit(XLSX_ROW_CAP + 1).count()
        if n > XLSX_ROW_CAP:
            raise ValueError(f"refusing driver-side excel write of >{XLSX_ROW_CAP} rows")
        try:
            # engine pinned: pandas infers xlwt from a .xls extension, but
            # xlwt (legacy BIFF) was removed from pandas years ago — the
            # reference's xls branch didn't write BIFF either (it wrote
            # csv, Load.py:218). We write OOXML content under the
            # requested name; Excel sniffs content, not extension.
            df.toPandas().to_excel(path, index=False, engine="openpyxl")
        except ImportError as e:  # openpyxl not present
            raise NotImplementedError("excel sink requires openpyxl") from e
    elif fmt in ("pkl", "pickle"):
        n = df.limit(XLSX_ROW_CAP + 1).count()
        if n > XLSX_ROW_CAP:
            raise ValueError(f"refusing driver-side pickle write of >{XLSX_ROW_CAP} rows")
        df.toPandas().to_pickle(path)
    else:
        raise ValueError(f"unknown sink format: {fmt}")
