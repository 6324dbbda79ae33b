from .io import TABLES, load_table, register_views, spread  # noqa: F401
