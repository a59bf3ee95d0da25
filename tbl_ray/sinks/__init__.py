"""Output sinks: parquet / csv / json with atomic tmp+rename writes."""

from tbl_ray.sinks.writers import (
    write_parquet_atomic,
    write_csv,
    write_json,
    merge_files,
    hex_encode_binary_columns,
)

__all__ = [
    "write_parquet_atomic",
    "write_csv",
    "write_json",
    "merge_files",
    "hex_encode_binary_columns",
]
