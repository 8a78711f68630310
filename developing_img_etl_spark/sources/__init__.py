"""Sources: parquet (catalog.py), binary files, driver-local Excel."""
