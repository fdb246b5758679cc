"""Multi-statement SQL script runner (SURVEY.md §3.3).

The reference's deployer executes `.sql` files by splitting on ``;`` and
running each statement on a warehouse cursor
(``scripts/deployment_files/snowflake_deployer.py:173-208``). The Spark
analogue iterates ``spark.sql``. Our splitter is deliberately stronger than
the reference's naive ``text.split(';')``: it respects single/double-quoted
strings (with ``''`` escapes), backtick identifiers, and ``--`` / ``/* */``
comments, so a semicolon inside a literal never splits a statement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def split_sql_statements(text: str) -> list[str]:
    """Split a SQL script into statements on top-level ``;``."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":  # line comment (kept; spark.sql accepts)
            j = text.find("\n", i)
            j = n if j < 0 else j
            buf.append(text[i:j])
            i = j
        elif ch == "/" and nxt == "*":  # block comment
            j = text.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            buf.append(text[i : j + 2])
            i = j + 2
        elif ch in ("'", '"', "`"):  # quoted literal / identifier
            j = i + 1
            while j < n:
                if text[j] == ch:
                    if ch == "'" and j + 1 < n and text[j + 1] == "'":
                        j += 2  # '' escape inside a string literal
                        continue
                    break
                j += 1
            buf.append(text[i : j + 1])
            i = j + 1
        elif ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def run_sql_script(spark: SparkSession, text: str) -> DataFrame | None:
    """Execute every statement in ``text`` in order; returns the last
    statement's DataFrame (the reference runner returns only success, but a
    result handle costs nothing here — statements are lazy until acted on,
    except DDL/commands which Spark executes eagerly)."""
    result: DataFrame | None = None
    for stmt in split_sql_statements(text):
        result = spark.sql(stmt)
    return result


def run_sql_file(spark: SparkSession, path: str) -> DataFrame | None:
    """File form of :func:`run_sql_script` (reference ``execute_sql_file``)."""
    with open(path) as f:
        return run_sql_script(spark, f.read())


def run_sql_directory(spark: SparkSession, directory: str) -> int:
    """Execute every ``*.sql`` file in ``directory`` in sorted order; returns
    the number of files run (the deployer's per-directory deploy loop)."""
    files = sorted(
        f for f in os.listdir(directory) if f.lower().endswith(".sql")
    )
    for fname in files:
        run_sql_file(spark, os.path.join(directory, fname))
    return len(files)
