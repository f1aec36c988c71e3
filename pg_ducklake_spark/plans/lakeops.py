"""Lakehouse-lifecycle queries: DML, time travel, change feed, compaction
— run through the ``Lake`` layer against a throwaway lake populated from
the test tables, with plain-SQL oracles computing the same final state.

Registered once the Lake core lands (see pg_ducklake_spark/lake.py).
"""

from __future__ import annotations
