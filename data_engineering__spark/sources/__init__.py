from .io import TABLES, read_table, read_json_array, write_parquet, sample_head

__all__ = ["TABLES", "read_table", "read_json_array", "write_parquet", "sample_head"]
