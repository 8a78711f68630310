"""Reference-pipeline parity: the image-ETL graph, Spark-first."""
