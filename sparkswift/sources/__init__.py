from sparkswift.sources.loaders import TABLES, load_table, load_tables, register_views
from sparkswift.sources.writers import (
    compact_bucketed_table,
    read_table,
    write_bucketed,
    write_table,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "compact_bucketed_table",
    "read_table",
    "write_bucketed",
    "write_table",
]
