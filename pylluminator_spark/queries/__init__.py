"""Named analytic query shapes with DuckDB oracles.

Each module exports ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` merged into the driver
contract in ``__spark_entry__``.
"""
