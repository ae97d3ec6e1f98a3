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
) -> DataFrame:
    """Left as-of join; right ``payload_cols`` arrive prefixed ``asof_``.

    Left rows keep all their columns; unmatched rows get NULL payloads.
    """
    lcols = left.columns
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tb.cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    w = (
        W.partitionBy("__key")
        .orderBy("__ts", "__tag", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.where(F.col("__tag") == 1).select(
        *lcols, *[f"asof_{c}" for c in payload_cols]
    )
