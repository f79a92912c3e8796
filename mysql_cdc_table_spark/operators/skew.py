"""Skew mitigation: salted join.

AQE's skew-join split handles most skew at runtime (enabled in
session.py); salting is the explicit fallback for pathological keys or
for engines/paths AQE can't reach (e.g. storage-partitioned joins).
Pattern: split each hot left key into S sub-keys; replicate the right
side S ways; join on (key, salt). Result identical to the plain join —
asserted by the oracle — while the hot key's rows spread over S tasks.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salts: int = 8,
    salt_col: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with an S-way salt. ``salt_col`` must be a
    deterministic expression over *left* columns in [0, salts); the
    default hashes the whole row so a hot key's rows spread across all S
    sub-keys (hashing only the key would put the hot key in one salt —
    pointless)."""
    salt = (
        salt_col
        if salt_col is not None
        else (F.abs(F.hash(*[F.col(c) for c in left.columns])) % salts)
    )
    lhs = left.withColumn("__salt", salt.cast("int"))
    rhs = right.join(
        F.broadcast(
            right.sparkSession.range(salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = lhs.join(rhs, [key, "__salt"], how)
    return out.drop("__salt")
