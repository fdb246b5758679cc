from .changelog import Changelog
from .merge import apply_changes, merge_upsert, upsert_dataframe
from .skew import salted_join, two_phase_agg
from .table_store import TableStore

__all__ = [
    "Changelog",
    "TableStore",
    "apply_changes",
    "merge_upsert",
    "salted_join",
    "two_phase_agg",
    "upsert_dataframe",
]
