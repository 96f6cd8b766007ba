"""Medallion warehouse: bronze → silver → gold over Parquet
(SURVEY §2 B19-B28, A29-A31)."""
