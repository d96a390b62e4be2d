"""Structured Streaming operators (a capability extension — the reference has
no streaming; its incremental story is file-memoization, see operators.lineage).
"""
