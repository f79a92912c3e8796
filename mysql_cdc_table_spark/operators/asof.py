"""As-of join: for each left row, the newest right row at-or-before it.

Spark has no ASOF JOIN operator (DuckDB does — the oracle uses it), so
this composes one from a union + last-value window, the scalable idiom:

    union(left-tagged, right-tagged)
      -> window partitionBy(key) orderBy(t, side)
      -> last(right payload, ignorenulls) over unbounded-preceding
      -> keep left rows

Scale notes: exactly ONE shuffle (hash by key) and a partition-local
sort — same cost as a sort-merge join, no range-duplication blowup that
a naive theta-join (t_right <= t_left) would cause. Skewed keys can be
salted upstream; at 100 TB both sides would be bucketed by key so the
shuffle drops out. Right rows sort before left rows at equal t, making
the match inclusive (t_right == t_left matches).

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tagged_union(left, right, keys, left_time, right_time, payload):
    """Shared first stage of every as-of variant: tag and union the two
    sides. The whole right payload travels as ONE struct and the window
    fill moves the STRUCT, not each column independently — a per-column
    fill would let a NULL payload field fall through to an OLDER right
    row, mixing columns across rows (DuckDB ASOF JOIN / pandas
    merge_asof return the matched row's NULL; round-1 advisory)."""
    r_struct = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    lhs = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rhs = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
    )
    return lhs.unionByName(rhs)


def _asof_directional(
    left, right, on, left_time, right_time, right_payload, tolerance,
    direction,
):
    """One-shuffle as-of core, direction-parameterized. backward: newest
    right at-or-before (right rows sort BEFORE left at equal t, frame
    looks back, last ignorenulls). forward: earliest right at-or-after
    (ties flipped so the equal-t right row lands INSIDE the
    [current, following] frame, first ignorenulls)."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = right_payload or [
        c for c in right.columns if c not in keys and c != right_time
    ]
    unioned = _tagged_union(left, right, keys, left_time, right_time, payload)

    backward = direction == "backward"
    order = [
        F.col("__t").asc(),
        F.col("__side").asc() if backward else F.col("__side").desc(),
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    w = (
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if backward
        else w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    fill = F.last if backward else F.first
    filled = unioned.select(
        "*",
        fill(F.col("__r"), ignorenulls=True).over(w).alias("__m"),
        fill(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True)
        .over(w)
        .alias("__m_t"),
    )

    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        # outside tolerance -> unmatched (payload nulled), like merge_asof
        dist = (
            F.col("__t") - F.col("__m_t")
            if backward
            else F.col("__m_t") - F.col("__t")
        )
        within = F.col("__m_t").isNotNull() & (dist <= tolerance)
        matched = [
            F.when(within, F.col("__m").getField(c)).alias(c) for c in payload
        ]
    else:
        matched = [F.col("__m").getField(c).alias(c) for c in payload]
    return out.select(F.col("__lrow.*"), *matched)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of-backward join. Right side must be unique per
    (key, right_time) — pre-aggregate it otherwise, or matches at the
    same instant are nondeterministic (in any engine).

    Returns all left columns plus ``right_payload`` columns (NULL when no
    right row is at-or-before the left row's time).
    """
    return _asof_directional(
        left, right, on, left_time, right_time, right_payload, tolerance,
        "backward",
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Nearest-neighbor as-of join: for each left row, the right row
    minimizing |t_left - t_right| (pandas merge_asof
    direction='nearest'), ties broken toward the EARLIER right row
    (the backward match), optionally capped by ``tolerance``.

    Same one-shuffle idiom as ``asof_join`` — union both sides, ONE
    hash partition by key, one partition-local sort — with two window
    passes over the SAME partitioning (Catalyst reuses the exchange and
    sort: no second shuffle): last-right-before for the backward
    candidate, first-right-after for the forward candidate, then a
    row-local pick. A naive |t_l - t_r| <= tol range join would
    duplicate every left row across its whole tolerance window and
    re-aggregate; this stays linear.

    Right side must be unique per (key, right_time), as in asof_join.
    Adds a ``matched_side`` column ('b'/'f', NULL when unmatched) so
    the direction logic itself is testable.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = right_payload or [
        c for c in right.columns if c not in keys and c != right_time
    ]

    unioned = _tagged_union(left, right, keys, left_time, right_time, payload)

    # backward: right rows sort BEFORE left at equal t (side asc), so an
    # exact-t right row is a 0-distance backward match
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: same sort order (same exchange+sort reused), window looks
    # ahead; at equal t the right row sits BEHIND the left row in this
    # order only when side sorts left-first — handled because the
    # backward window already claimed equal-t rows at distance 0, which
    # no forward candidate can beat (ties prefer backward).
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    right_t = F.when(F.col("__side") == 0, F.col("__t"))
    right_r = F.when(F.col("__side") == 0, F.col("__r"))
    filled = unioned.select(
        "*",
        F.last(right_r, ignorenulls=True).over(wb).alias("__br"),
        F.last(right_t, ignorenulls=True).over(wb).alias("__bt"),
        F.first(right_r, ignorenulls=True).over(wf).alias("__fr"),
        F.first(right_t, ignorenulls=True).over(wf).alias("__ft"),
    )

    out = filled.filter(F.col("__side") == 1)
    bdist = F.col("__t").cast("long") - F.col("__bt").cast("long")
    fdist = F.col("__ft").cast("long") - F.col("__t").cast("long")
    if tolerance is not None:
        b_ok = F.col("__bt").isNotNull() & (bdist <= tolerance)
        f_ok = F.col("__ft").isNotNull() & (fdist <= tolerance)
    else:
        b_ok = F.col("__bt").isNotNull()
        f_ok = F.col("__ft").isNotNull()
    take_b = b_ok & (~f_ok | (bdist <= fdist))  # tie -> backward (earlier)
    take_f = f_ok & ~take_b
    side = F.when(take_b, F.lit("b")).when(take_f, F.lit("f"))
    pick = F.when(take_b, F.col("__br")).when(take_f, F.col("__fr"))
    matched = [pick.getField(c).alias(c) for c in payload]
    return out.select(F.col("__lrow.*"), *matched, side.alias("matched_side"))


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of-FORWARD join: for each left row, the EARLIEST right
    row at-or-after its time (pandas merge_asof direction='forward';
    DuckDB ``ASOF JOIN ... ON l.t <= r.t``). Same one-shuffle idiom and
    right-side uniqueness contract as ``asof_join``; the shared core
    flips the tie sort so an equal-instant right row is a 0-distance
    forward match.
    """
    return _asof_directional(
        left, right, on, left_time, right_time, right_payload, tolerance,
        "forward",
    )
