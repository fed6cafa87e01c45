from .formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet_partitioned,
)
from .tables import TABLES, load_table, load_tables, spread

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "spread",
    "read_csv",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
    "write_parquet_partitioned",
]
