from .kernels import (
    normalize_value,
    pct_change,
    register_all_udfs,
    volatility,
)
from .sql_script import (
    run_sql_directory,
    run_sql_file,
    run_sql_script,
    split_sql_statements,
)

__all__ = [
    "pct_change",
    "volatility",
    "normalize_value",
    "register_all_udfs",
    "split_sql_statements",
    "run_sql_script",
    "run_sql_file",
    "run_sql_directory",
]
