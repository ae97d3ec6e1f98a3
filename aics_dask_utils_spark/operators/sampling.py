"""Deterministic sampling, splitting, and corpus mixing.

Training-data pipelines sample at every stage: Bernoulli subsets for
ablations, train/valid/test splits, per-stratum quotas, and mixture
reweighting across corpora. At 100 TB the implementation constraints
are strict:

- **Content-hash Bernoulli, not RNG.** ``rand()`` is partition-stateful:
  results change with partitioning, retries, and engine version. A
  48-bit md5-derived hash of the row key is reproducible on any engine,
  at any partition count, and is *resample-stable* — adding new rows
  never flips a prior row's keep/drop decision, so incremental pipeline
  re-runs stay consistent.
- **Narrow, pushdown-friendly.** Every sampler below is a pure filter
  expression over scanned columns: no shuffle, no state, scales
  linearly with input splits.
- **Integer threshold compare.** Keep iff ``h * denom < numer * 2^48``
  in bigint arithmetic — no float boundary, so Spark and any SQL oracle
  agree bit-for-bit on every row.
- **Mixture/balance** needs per-stratum counts: one tiny groupBy
  (map-side partial agg over #strata keys) broadcast back to the scan —
  the only shuffle moves #strata rows, never data rows.

The reference has no sampling surface; this is an EXT capability of the
LLM-data-pipeline north star (SURVEY §2b), built in the spirit of the
reference's deterministic differential testing
(``aics_dask_utils/tests/test_distributed_handler.py:20-39`` compares
against an independent baseline — here the baseline is DuckDB running
the identical md5 arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48
HASH_SCALE = 1 << HASH_BITS  # 281474976710656


def hash48(col: Column, seed: str) -> Column:
    """Deterministic 48-bit uniform hash of a key column.

    md5 over ``seed|key`` (utf-8), first 12 hex chars parsed as bigint —
    the same idiom the dedup operators use, reproducible in any engine
    with md5 + hex parsing. Changing ``seed`` yields an independent
    sample.
    """
    s = F.concat_ws("|", F.lit(seed), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint")


def threshold(fraction: float) -> int:
    """Integer keep-threshold for a fraction: keep iff hash48 < this."""
    return int(fraction * HASH_SCALE)


def bernoulli_sample(
    df: DataFrame, key: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of ``key``."""
    return df.where(hash48(F.col(key), seed) < F.lit(threshold(fraction)))


def split_column(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    seed: str = "split",
    out: str = "split",
) -> DataFrame:
    """Assign each row to one named split by cumulative hash thresholds.

    ``fractions`` maps split name -> fraction; they must sum to ~1. The
    last split absorbs rounding remainder. Same key + seed always lands
    in the same split (stable across re-runs and engines).
    """
    items = list(fractions.items())
    h = hash48(F.col(key), seed)
    expr = None
    cum = 0.0
    for name, frac in items[:-1]:
        cum += frac
        cond = h < F.lit(threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(items[-1][0]) if expr is None else expr.otherwise(items[-1][0])
    return df.withColumn(out, label)


def stratified_sample(
    df: DataFrame,
    strata: str,
    key: str,
    fractions: dict[str, float],
    seed: str = "strat",
) -> DataFrame:
    """Per-stratum Bernoulli sample (deterministic ``sampleBy``).

    Strata absent from ``fractions`` are dropped (threshold 0). Still a
    pure narrow filter: the per-stratum threshold is a CASE expression,
    no shuffle, no driver-side count.
    """
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata) == value
        t = F.lit(threshold(frac))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = F.lit(0) if thresh is None else thresh.otherwise(F.lit(0))
    return df.where(hash48(F.col(key), seed) < thresh)


def balance_strata(
    df: DataFrame, strata: str, key: str, seed: str = "balance"
) -> DataFrame:
    """Downsample every stratum toward the smallest stratum's size.

    Per-stratum keep probability ``min_count / count`` applied via exact
    integer math: keep iff ``h * count < min_count * 2^48`` (h is 48-bit,
    count fits well under 2^15 per partition-group at any realistic
    strata cardinality, so the product stays in bigint range for counts
    up to ~2^15 * data — at 100 TB with billions of rows per stratum use
    ``h * (count >> s) < (min >> s) * 2^48`` scaling; exactness to the
    row is not required there).

    Cost model: one groupBy over #strata keys (map-side combined), a
    global min over that tiny relation, then a **broadcast** join back —
    data rows never shuffle. Expected (not exact) per-stratum output
    size is min_count; the sample is Bernoulli so it composes with
    resample-stability.
    """
    from pyspark.storagelevel import StorageLevel

    # persisted: the min aggregate and the ratio join both consume the
    # tiny per-stratum counts; without this each re-scans the source
    counts = (
        df.groupBy(strata)
        .agg(F.count("*").alias("_cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mn = counts.agg(F.min("_cnt").alias("_mn"))
    ratios = counts.crossJoin(F.broadcast(mn))
    joined = df.join(F.broadcast(ratios), strata)
    h = hash48(F.col(key), seed)
    return joined.where(h * F.col("_cnt") < F.col("_mn") * F.lit(HASH_SCALE)).drop(
        "_cnt", "_mn"
    )


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: Column,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of ``k`` rows
    (Efraimidis–Spirakis A-ES): each row draws an exponential key
    ``-ln(u)/w`` from its content-hash uniform ``u`` and its weight
    ``w``; the k smallest keys are exactly a weight-proportional sample
    without replacement.

    Same scale shape as the other samplers: the draw is a narrow
    per-row expression; selection is a global top-k, which Spark runs
    as per-partition top-k + a k-row merge (TakeOrderedAndProject) —
    no full sort, no shuffle of the data. Deterministic: the same rows
    win on any engine, at any partition count, and appending new rows
    only ever displaces rows at the selection boundary.
    """
    # u in (0,1): (h + 0.5) / 2^48 — never 0 or 1, so ln is finite.
    u = (hash48(F.col(key), seed).cast("double") + 0.5) / F.lit(float(HASH_SCALE))
    w = weight.cast("double")
    draw = -F.log(u) / w
    # Zero/NULL weight makes the draw NULL (non-ANSI x/0 -> NULL) and a
    # plain asc sort puts NULLs FIRST — guaranteeing selection of rows
    # that by weight-proportional semantics must never be selected. Such
    # rows have sampling probability 0: filter them out, and keep
    # nulls_last as belt-and-braces for NaN-weight rows.
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("draw_key", draw)
        .orderBy(F.asc_nulls_last("draw_key"), F.col(key).asc())
        .limit(k)
    )


#: Inverse-CDF thresholds for Poisson(1): u < _POIS_CDF[k] -> weight k.
POISSON1_CDF = (
    0.36787944117144233,  # P(X <= 0)
    0.7357588823428847,   # P(X <= 1)
    0.9196986029286058,   # P(X <= 2)
    0.9810118431238462,   # P(X <= 3)
    0.9963401531726563,   # P(X <= 4)
)


def poisson_bootstrap_weight(key: Column, replicate: Column, seed: str = "boot") -> Column:
    """Deterministic Poisson(1) bootstrap weight for (row, replicate).

    The Poisson bootstrap (Chamandy et al., Google 2012) is THE way to
    bootstrap on sharded data: instead of resampling n rows with
    replacement (which needs global coordination), each row gets an
    independent Poisson(1) multiplicity per replicate — computable
    row-locally from a content hash, no shuffle, and the replicate
    totals are ordinary partial-aggregable sums. Weight is the
    inverse-CDF of a 48-bit uniform over ``seed|replicate#key`` —
    bit-reproducible in any engine with md5."""
    u = (
        hash48(F.concat_ws("#", replicate.cast("string"), key.cast("string")), seed)
        .cast("double")
        + 0.5
    ) / float(HASH_SCALE)
    w = F.lit(5)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF[k], F.lit(k)).otherwise(w)
    return w
