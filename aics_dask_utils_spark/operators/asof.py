"""As-of join (E17): for each left row, the most recent right row with
right.ts <= left.ts, per key.

Spark has no native as-of join. Two standard formulations:

1. **Union + last(ignorenulls) window** (implemented here): tag and
   union both inputs, sort per key by (ts, tag), carry the last non-null
   right payload forward. Cost: ONE shuffle on the key + a per-partition
   sort — O((n+m) log) with no join fan-out, no range explosion. This is
   the scale path: at 100 TB it behaves like a single sort-merge pass.
2. Range join + rank=1: joins every left row to ALL prior right rows
   before ranking — quadratic fan-out on hot keys. Avoided.

Tie rule: a right row at exactly left.ts counts as "prior" (<=), and
among right ties the largest order key wins — both encoded in the sort
order (tag sorts right-before-left, tiebreak ascending + last()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _epoch_us(col: str) -> F.Column:
    """Microsecond epoch of a DATE/TIMESTAMP/TIMESTAMP_NTZ column.

    Gap math must NOT go through ``unix_timestamp`` (whole-second
    truncation): events.ts carries microseconds, and a sub-second right
    side — or an event landing inside the same second as the
    backward/forward midpoint — would make the nearest-direction choice
    or the tolerance cut diverge from the fractional-``epoch()`` oracle
    and pandas. The cast to TIMESTAMP is exact (session tz pinned UTC;
    TIMESTAMP_NTZ/DATE both widen losslessly)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join; right ``payload_cols`` arrive prefixed ``asof_``.

    Left rows keep all their columns; unmatched rows get NULL payloads.

    ``direction='backward'`` (default) matches the latest right row with
    right.ts <= left.ts (ties among right rows: LARGEST tiebreak wins);
    ``direction='forward'`` matches the earliest right row with
    right.ts >= left.ts (ties: SMALLEST tiebreak wins);
    ``direction='nearest'`` picks whichever of the two is closer in
    time (an exact gap tie goes backward, the pandas rule). All run
    the same single-shuffle union+carry — forward flips the sort,
    nearest carries both directions over one keyed partitioning.
    ``tolerance_seconds`` (pandas merge_asof's ``tolerance``) nulls the
    payloads of matches farther than the bound — applied AFTER the
    carry, so it costs one scalar predicate, not a different join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    lcols = left.columns
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias("__rts"),
        F.lit(0).alias("__tag"),
        tb.cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    order_b = [F.asc("__ts"), F.asc("__tag"), F.asc("__tb")]
    # Descending ts: rows at-or-after the current left row precede
    # it, so last(ignorenulls) carries the NEAREST following right
    # row; __tb desc makes the smallest tiebreak win among ts-ties.
    order_f = [F.desc("__ts"), F.asc("__tag"), F.desc("__tb")]

    def _window(order):
        return (
            W.partitionBy("__key")
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    u = l.unionByName(r)
    if direction in ("backward", "forward"):
        w = _window(order_b if direction == "backward" else order_f)
        carried = u.select(
            "*",
            F.last("__rts", ignorenulls=True).over(w).alias("__matched_ts"),
            *[
                F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                for c in payload_cols
            ],
        )
        out = carried.where(F.col("__tag") == 1)
    else:
        # nearest (pandas merge_asof direction='nearest'): carry BOTH
        # directions over the same keyed partitioning — one shuffle,
        # two per-partition sorts — then pick the closer match per
        # row; an exact gap tie goes to the backward match (pandas
        # rule). No range join, no fan-out: still the single-shuffle
        # scale shape.
        wb, wf = _window(order_b), _window(order_f)
        carried = u.select(
            "*",
            F.last("__rts", ignorenulls=True).over(wb).alias("__ts_b"),
            F.last("__rts", ignorenulls=True).over(wf).alias("__ts_f"),
            *[
                F.last(f"__p_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
                for c in payload_cols
            ],
            *[
                F.last(f"__p_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
                for c in payload_cols
            ],
        )
        rows = carried.where(F.col("__tag") == 1)
        gap_b = _epoch_us("__ts") - _epoch_us("__ts_b")
        gap_f = _epoch_us("__ts_f") - _epoch_us("__ts")
        use_b = F.col("__ts_b").isNotNull() & (
            F.col("__ts_f").isNull() | (gap_b <= gap_f)
        )
        out = rows.select(
            *lcols,
            "__key",
            "__ts",
            "__tag",
            F.when(use_b, F.col("__ts_b"))
            .otherwise(F.col("__ts_f"))
            .alias("__matched_ts"),
            *[
                F.when(use_b, F.col(f"__b_{c}"))
                .otherwise(F.col(f"__f_{c}"))
                .alias(f"asof_{c}")
                for c in payload_cols
            ],
        )
    if tolerance_seconds is not None:
        gap = F.abs(_epoch_us("__ts") - _epoch_us("__matched_ts"))
        # round, don't int(): a fractional tolerance (0.5s) must mean
        # 500_000µs, not get floored to zero seconds
        keep = F.col("__matched_ts").isNotNull() & (
            gap <= int(round(float(tolerance_seconds) * 1_000_000))
        )
        out = out.select(
            *lcols,
            "__matched_ts",
            *[
                F.when(keep, F.col(f"asof_{c}"))
                .otherwise(F.lit(None))
                .alias(f"asof_{c}")
                for c in payload_cols
            ],
        )
    return out.select(*lcols, *[f"asof_{c}" for c in payload_cols])
