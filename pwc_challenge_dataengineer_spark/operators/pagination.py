"""Pagination operators for the serving/query layer.

Reference: offset/limit (src/data_access/repositories/sales_repository.py:110),
cursor/keyset pagination (src/api/pagination/cursor_pagination.py, used in
src/api/v1/routes/sales.py:55-112), sort-field mapping (:65-77).

Scale notes: OFFSET pagination must sort-and-skip; it is kept for API parity
but keyset pagination is the scale path (the cursor predicate pushes down to
the scan, cost is O(page) not O(offset+page)). Both require a total order —
callers must include a unique tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ordering(sort_cols: list[tuple[str, str]]) -> list[Column]:
    return [
        F.col(c).desc() if d.lower().startswith("desc") else F.col(c).asc()
        for c, d in sort_cols
    ]


def paginate_offset(
    df: DataFrame, sort_cols: list[tuple[str, str]], page: int, page_size: int
) -> DataFrame:
    """Deterministic offset/limit page via row_number (1-based pages)."""
    w = Window.orderBy(*_ordering(sort_cols))
    lo = (page - 1) * page_size
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > lo) & (F.col("__rn") <= lo + page_size))
        .drop("__rn")
    )


def paginate_keyset(
    df: DataFrame,
    sort_col: str,
    key_col: str,
    cursor: tuple | None,
    page_size: int,
    descending: bool = False,
) -> DataFrame:
    """Keyset page: rows strictly after the (sort_value, key) cursor.

    The cursor predicate is a plain filter → pushes down to the scan.
    """
    if cursor is not None:
        sv, kv = cursor
        if descending:
            pred = (F.col(sort_col) < F.lit(sv)) | (
                (F.col(sort_col) == F.lit(sv)) & (F.col(key_col) < F.lit(kv))
            )
        else:
            pred = (F.col(sort_col) > F.lit(sv)) | (
                (F.col(sort_col) == F.lit(sv)) & (F.col(key_col) > F.lit(kv))
            )
        df = df.filter(pred)
    order = (
        [F.col(sort_col).desc(), F.col(key_col).desc()]
        if descending
        else [F.col(sort_col), F.col(key_col)]
    )
    return df.orderBy(*order).limit(page_size)
