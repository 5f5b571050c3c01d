"""Training-data pipeline operators (dedup / similarity / text /
multimodal) — SQL-expressible ones live in pyspider_spark.contract;
this package holds the Python-side (pandas-UDF / mapInPandas) ones."""
