from .readers import load_table, load_tables, read_csv_dim, read_json_stream, read_parquet_stream

__all__ = [
    "load_table",
    "load_tables",
    "read_csv_dim",
    "read_json_stream",
    "read_parquet_stream",
]
