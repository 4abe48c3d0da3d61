"""DataFrame-level operators.  Each module is one pipeline stage or one
operator family from SURVEY.md §2; all hot paths are built-in column
expressions or Arrow-batched pandas UDFs (never row-at-a-time Python).
"""
