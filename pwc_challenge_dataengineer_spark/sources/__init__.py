from .readers import (  # noqa: F401
    read_csv,
    read_csv_large,
    read_excel,
    read_jdbc,
    read_json,
    read_parquet,
)
from .writers import write_parquet  # noqa: F401
