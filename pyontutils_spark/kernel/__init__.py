"""Pure-Python kernel: broadcast-safe primitives shared by driver code,
pandas UDFs, and tests.  No pyspark imports allowed in this package —
everything here must pickle cheaply into a Spark broadcast variable.
"""
