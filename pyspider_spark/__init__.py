"""pyspider_spark — a from-scratch PySpark-native rebuild of the
pyspider scheduler→fetcher→processor loop as batch-iterative frontier
expansion over snapshot tables.

Blueprint: /root/repo/SURVEY.md. Reference semantics: public
binux/pyspider (scheduler/scheduler.py, scheduler/task_queue.py,
fetcher/tornado_fetcher.py, processor/processor.py) — rebuilt, not
ported: all dataflow is DataFrame + vectorized pandas/Arrow UDFs.
"""

__version__ = "0.1.0"
