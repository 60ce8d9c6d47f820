"""PySpark-native analytics engine with the capabilities of
gabrielheck/mysql-clickhouse-sync, rebuilt Spark-first.

The reference (see SURVEY.md) is a MySQL->ClickHouse snapshot/CDC
replicator whose semantic core is:

* a MySQL type-mapping / schema system     -> :mod:`.schema`
* batched scan -> project -> stamp -> sink -> :mod:`.pipeline.snapshot`
* CDC upsert as append + dedup-latest      -> :mod:`.operators.cdc`
* the ``<table>_live`` soft-delete view    -> :func:`.operators.cdc.live_view`

On top of that capability surface this package adds the analytics and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale: everything is a pure
``DataFrame -> DataFrame`` function so Catalyst can optimize the whole
plan (predicate pushdown, column pruning, broadcast joins, AQE).
"""

__version__ = "0.1.0"
