from .table_store import TableStore
from .merge import merge_upsert
from .changelog import Changelog

__all__ = ["TableStore", "merge_upsert", "Changelog"]
