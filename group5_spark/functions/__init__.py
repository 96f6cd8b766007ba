"""Measure library: Spark-SQL re-expression of the reference's DAX
catalog (SURVEY §2 B29-B42)."""
