from .tables import TABLE_NAMES, load_table, load_tables, read_wholetext, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "read_wholetext", "register_views"]
