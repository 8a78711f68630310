"""Sinks: partitioned object layout, catalog, idempotent REST."""
