"""JDBC sinks — connector parity with the reference's MySQL store
(``src/database.py``, ``to_sql(..., if_exists='append')``).

LIVE in this environment since r5: ``tests/test_jdbc_live.py`` runs
append, staging write, and the backup→swap replace flow (run_swap
executing real DDL over a JDBC connection) against embedded Apache
Derby from Spark's own jars. ``swap_sql`` stays the MySQL-family
single-statement atomic form (the production target); Derby's
one-rename-per-statement dialect is handled by the caller's
``run_swap``, as designed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    **props: str,
) -> dict[str, str]:
    """Writer options; ``props`` passes any extra JDBC option through
    (e.g. ``driver=`` for databases Spark can't infer from the URL,
    like embedded Derby in the live tests)."""
    opts = {"url": url, "dbtable": table, **props}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def append_jdbc(df: DataFrame, url: str, table: str, **props: str) -> None:
    """OP-SNK-APPEND: ``df.to_sql(if_exists='append')`` equivalent
    (reference ``src/import_xml_history.py:205``)."""
    df.write.mode("append").format("jdbc").options(
        **jdbc_options(url, table, **props)
    ).save()


def replace_jdbc_with_backup(
    df: DataFrame,
    spark: SparkSession,
    url: str,
    table: str,
    timestamp: str,
    run_swap: Callable[[str], None] | None = None,
    **props: str,
) -> str:
    """OP-SNK-REPLACE + OP-SNK-BACKUP via staging-table swap.

    Spark's JDBC writer has no multi-statement transaction, so the
    reference's backup→TRUNCATE→append single transaction
    (``src/batch_train.py:154-176``) becomes:

      1. write ``df`` to ``<table>__staging`` (overwrite)
      2. on the DB, in ONE transaction executed driver-side:
         ``RENAME TABLE <table> TO <table>_backup_<ts>,
                        <table>__staging TO <table>``

    The rename is atomic in MySQL/MariaDB; a crash before it leaves the
    live table untouched. Step 2 requires a DBAPI connection (pymysql
    etc.) which is environment-specific: callers pass ``run_swap``, a
    callable that executes one SQL statement on the target DB (e.g.
    ``lambda sql: cursor.execute(sql)``). Returns the swap DDL that was
    (or must be) executed. Raises only when ``run_swap`` is None, after
    the staging write, so the data is already in place and only the
    rename remains.
    """
    staging = f"{table}__staging"
    df.write.mode("overwrite").format("jdbc").options(
        **jdbc_options(url, staging, **props)
    ).save()
    ddl = swap_sql(table, timestamp)
    if run_swap is None:
        raise NotImplementedError(
            "no run_swap callable provided; execute "
            f"`{ddl}` on the target DB to finish the swap"
        )
    run_swap(ddl)
    return ddl


def swap_sql(table: str, timestamp: str) -> str:
    """The atomic backup+swap DDL for MySQL-family databases."""
    return (
        f"RENAME TABLE {table} TO {table}_backup_{timestamp}, "
        f"{table}__staging TO {table}"
    )
