from .readers import load_table, load_tables, read_csv_latest  # noqa: F401
