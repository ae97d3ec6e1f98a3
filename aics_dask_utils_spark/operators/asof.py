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
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join; right ``payload_cols`` arrive prefixed ``asof_``.

    Left rows keep all their columns; unmatched rows get NULL payloads.

    ``direction='backward'`` (default) matches the latest right row with
    right.ts <= left.ts (ties among right rows: LARGEST tiebreak wins);
    ``direction='forward'`` matches the earliest right row with
    right.ts >= left.ts (ties: SMALLEST tiebreak wins). Both run the
    same single-shuffle union+carry — forward just flips the sort.
    ``tolerance_seconds`` (pandas merge_asof's ``tolerance``) nulls the
    payloads of matches farther than the bound — applied AFTER the
    carry, so it costs one scalar predicate, not a different join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
    if direction == "backward":
        order = [F.asc("__ts"), F.asc("__tag"), F.asc("__tb")]
    else:
        # Descending ts: rows at-or-after the current left row precede
        # it, so last(ignorenulls) carries the NEAREST following right
        # row; __tb desc makes the smallest tiebreak win among ts-ties.
        order = [F.desc("__ts"), F.asc("__tag"), F.desc("__tb")]
    w = (
        W.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        F.last("__rts", ignorenulls=True).over(w).alias("__matched_ts"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    out = carried.where(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        # unix_timestamp, not cast: TIMESTAMP_NTZ refuses a bigint cast;
        # the session tz is pinned UTC so the epoch math is deterministic.
        gap = F.abs(
            F.unix_timestamp("__ts") - F.unix_timestamp("__matched_ts")
        )
        keep = F.col("__matched_ts").isNotNull() & (gap <= tolerance_seconds)
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
