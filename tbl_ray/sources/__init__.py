"""Input discovery, parquet scanning, and footer-metadata summaries."""

from tbl_ray.sources.inputs import gather_paths
from tbl_ray.sources.parquet import read_table, check_equal_schemas, file_slice_plan
from tbl_ray.sources.text_formats import read_csv, read_jsonl
from tbl_ray.sources.summary import (
    TabularSummary,
    summarize_file,
    summarize_files,
    combine_summaries,
    summarize_by_schema,
)

__all__ = [
    "gather_paths",
    "read_table",
    "read_jsonl",
    "read_csv",
    "check_equal_schemas",
    "file_slice_plan",
    "TabularSummary",
    "summarize_file",
    "summarize_files",
    "combine_summaries",
    "summarize_by_schema",
]
