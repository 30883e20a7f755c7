from .catalog import TABLES, load_table, load_tables, register_views
from .readers import load_data
from .writers import write_data

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "load_data", "write_data"]
