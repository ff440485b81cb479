"""Query corpus: the reference's relational query surface (SURVEY.md §2.4)
plus the scale-extension operators, each expressed twice — as a Spark
DataFrame program and as ANSI SQL for the DuckDB oracle."""
