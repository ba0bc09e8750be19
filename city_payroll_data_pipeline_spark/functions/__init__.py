"""Scalar/column function library (all JVM-side built-ins; no UDFs in
the parity path)."""
