"""Assembled end-to-end query plans (the reference's CLI entry points)."""
