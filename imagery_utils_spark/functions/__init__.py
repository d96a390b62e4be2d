"""Scalar / column-expression function library (JVM-side wherever possible)."""
