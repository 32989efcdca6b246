from .formats import read_table, write_table, PAGES_READ_SCHEMA
from .warc import read_warc, write_warc, warc_to_pages

__all__ = [
    "read_table",
    "write_table",
    "PAGES_READ_SCHEMA",
    "read_warc",
    "write_warc",
    "warc_to_pages",
]
