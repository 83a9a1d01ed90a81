"""Scalar/aggregate expression libraries (all JVM-side where possible)."""
