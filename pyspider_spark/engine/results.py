"""Result sink surface: select/paging + export (SURVEY §2.1 S6/S11).

Mirrors the reference's result access paths:
- ``pyspider/database/base/resultdb.py — select(project, fields,
  offset, limit)``: offset paging over a deterministic order — Spark's
  bare ``offset`` is order-unstable, so paging is a ``row_number`` over
  an explicit sort key (SURVEY §2.5 O3).
- ``pyspider/libs/result_dump.py — dump_as_json()/dump_as_txt()/
  dump_as_csv()``: exports become distributed ``df.write`` sinks (one
  file per partition at scale; coalesce only for small exports).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def select_results(
    results: DataFrame,
    project: str | None = None,
    offset: int = 0,
    limit: int = 20,
) -> DataFrame:
    """Stable-paged result listing, newest first (webui/result.py)."""
    df = results
    if project is not None:
        df = df.filter(F.col("project") == project)
    # Global-order paging without a global sort: orderBy().limit(n)
    # compiles to TakeOrderedAndProject (per-partition top-n, tiny
    # driver merge), so only offset+limit rows ever leave the scan.
    # The row_number window then runs over that bounded head — its
    # single partition holds ≤ offset+limit rows, never the table.
    order = [F.desc("updatetime"), F.asc("taskid")]
    head = df.orderBy(*order).limit(offset + limit)
    w = Window.orderBy(*order)
    return (
        head.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )


def dump_results(
    results: DataFrame, path: str, fmt: str = "json", single_file: bool = False
) -> None:
    """Export results as JSON-lines / CSV / text (url\\tresult).

    ``single_file`` coalesces to one output part — only for small
    exports; large dumps stay one-file-per-partition.
    """
    df = results.coalesce(1) if single_file else results
    if fmt == "json":
        df.write.mode("overwrite").json(path)
    elif fmt == "csv":
        df.write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "txt":
        df.select(
            F.concat_ws("\t", F.col("url"), F.col("result")).alias("line")
        ).write.mode("overwrite").text(path)
    else:
        raise ValueError(f"unknown dump format: {fmt}")


def status_counts(frontier: DataFrame) -> DataFrame:
    """A1 — per-project status counts (taskdb.status_count)."""
    return frontier.groupBy("project", "status").count()


def project_window_counts(
    metrics_project: DataFrame, window_s: float = 300.0
) -> DataFrame:
    """A2 — tumbling-window rollup of the per-(round, project, kind)
    counter table (``libs/counter.py — TimebaseAverageWindowCounter``
    5m/1h/1d windows): window_start = floor(now / w) * w over the
    crawl's logical clock. Partial+final hash agg; at 100 TB this is a
    metrics-table-sized job, never a frontier-sized one."""
    win = (F.floor(F.col("now") / window_s) * window_s).alias("window_start")
    return metrics_project.groupBy("project", "kind", win).agg(
        F.sum("cnt").alias("cnt")
    )
