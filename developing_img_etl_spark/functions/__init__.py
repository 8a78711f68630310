"""Scalar / collection helper functions — all JVM-side built-ins."""
