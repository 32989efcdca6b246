from .formats import read_table, write_table, PAGES_READ_SCHEMA

__all__ = ["read_table", "write_table", "PAGES_READ_SCHEMA"]
