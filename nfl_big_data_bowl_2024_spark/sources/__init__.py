from .readers import load_testdata, read_csv_table, read_tracking
from .writers import write_result, write_with_error_sink

__all__ = [
    "load_testdata",
    "read_csv_table",
    "read_tracking",
    "write_result",
    "write_with_error_sink",
]
