"""Query layer: gold analytics, datamart serving queries, star schema build.

``catalog`` is the registry the driver contract (__spark_entry__.py) exposes:
every implemented operator from SURVEY.md §2 registers a (spark, sf_dir) ->
DataFrame callable and, where SQL-expressible, a DuckDB oracle string.
"""

from . import catalog  # noqa: F401
