"""Relational operator layer (SURVEY §2 Tier B-1).

Each module re-expresses a family of the reference's required
capability surface (``Stream_Analytics_Platform.md:83-94``) as
idiomatic, Catalyst-optimizable DataFrame operations:

- ``joins``    inner / left / semi / anti equi-joins, broadcast-aware
- ``windows``  ranking, running totals, moving averages, sessionize
- ``setops``   union / intersect / except over sparse schemas
- ``columns``  add / drop / rename / cast, caching policy
- ``flatten``  generic nested-struct flatten + array explode
- ``skew``     salted join / two-phase salted aggregation for hot keys
"""

from group5_spark.operators import columns, flatten, joins, setops, skew, windows

__all__ = ["columns", "flatten", "joins", "setops", "skew", "windows"]
