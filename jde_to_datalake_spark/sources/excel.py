"""Excel export sink — SURVEY.md S13.

The reference exports full comparison results to XLSX client-side
(ui/src/components/LiveDataComparison.js:237-248). Engine-side the
export is a driver-side materialization of a SMALL result (the
reference exports post-aggregation comparison rows, never raw data):
``df.toPandas().to_excel``. The xlsx writer (openpyxl) is optional —
absent, we fall back to CSV next to the requested path so the export
still lands, and report which format was written.

At scale: exports must stay post-aggregation. ``max_rows`` guards
against accidentally collecting a fact table to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ExportTooLargeError(RuntimeError):
    pass


def export_result(df: DataFrame, path: str, max_rows: int = 1_000_000) -> str:
    """Write a result DataFrame to .xlsx (or .csv fallback).

    Returns the path actually written. Raises ExportTooLargeError when
    the result exceeds ``max_rows`` — exports are for result sets, not
    fact tables.
    """
    n = df.count()
    if n > max_rows:
        raise ExportTooLargeError(
            f"result has {n} rows > max_rows={max_rows}; aggregate before exporting"
        )
    pdf = df.toPandas()
    try:
        import openpyxl  # noqa: F401

        target = path if path.endswith(".xlsx") else path + ".xlsx"
        pdf.to_excel(target, index=False)
        return target
    except ImportError:
        target = (path[: -len(".xlsx")] if path.endswith(".xlsx") else path) + ".csv"
        pdf.to_csv(target, index=False)
        return target
