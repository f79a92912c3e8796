"""Round-11 operators.

Planned this round (round-10 verdict items 2-5):
- two-sided join-view IVM (``cdc_ivm_join_view_bidi``) — maintain
  Δ(L⋈R) when the DIMENSION is also a CDC feed;
- full-outer watermarked stream-stream join;
- persisted-IVF probe path (codebook round-trips storage);
- plus further training-pipeline / CDC-audit keys.

Reference semantics compared against ``/root/reference`` (a read-only
MySQL-binlog storage engine, see SURVEY.md §1): every capability here
EXCEEDS the reference — it has no query engine of its own, no IVM, no
streaming joins, no vector search (its entire query surface is
delegated to MySQL's executor, ``binlogdb.cc``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.catalog import load_table as t

QUERIES: dict = {}
ORACLES: dict = {}
