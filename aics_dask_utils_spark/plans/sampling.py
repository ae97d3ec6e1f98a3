"""Sampling / splitting / corpus-mixing plans (EXT north star).

Every sampler is a deterministic content-hash filter
(`operators/sampling.py`): md5-derived 48-bit hash + integer threshold,
so DuckDB reproduces the identical keep/drop decision per row and the
oracle hash-match is exact. No RNG anywhere — reproducible at any
partition count, resample-stable under appends.

Oracle idiom (parity with `hash48`):
  Spark  F.conv(substring(md5(concat_ws('|', seed, key)), 1, 12), 16, 10)
  DuckDB CAST(('0x' || substr(md5(concat_ws('|', seed, key)), 1, 12)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum
from ..operators.sampling import (
    HASH_SCALE,
    balance_strata,
    bernoulli_sample,
    split_column,
    stratified_sample,
    threshold,
)
from ..sources import load_table
from . import register

_H = "CAST(('0x' || substr(md5(concat_ws('|', '{seed}', CAST({key} AS VARCHAR))), 1, 12)) AS BIGINT)"


@register(
    "sample_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_H.format(seed="doc20", key="doc_id")} < {threshold(0.2)}
    """,
    doc="deterministic 20% Bernoulli sample of documents by content hash "
    "of doc_id — narrow filter, no shuffle, no RNG; resample-stable "
    "(EXT sampling)",
    tags=("sampling",),
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bernoulli_sample(docs, "doc_id", 0.2, seed="doc20").select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_train_test_split",
    oracle=f"""
    WITH h AS (
        SELECT o_totalprice,
               {_H.format(seed="split13", key="o_orderkey")} AS hv
        FROM orders
    ),
    labeled AS (
        SELECT CASE WHEN hv < {threshold(0.8)} THEN 'train'
                    WHEN hv < {threshold(0.9)} THEN 'valid'
                    ELSE 'test' END AS split,
               o_totalprice
        FROM h
    )
    SELECT split,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
    FROM labeled
    GROUP BY split
    ORDER BY split
    """,
    doc="80/10/10 train/valid/test split of orders by cumulative hash "
    "thresholds on o_orderkey; per-split count + exact-decimal price "
    "sum. Same key always lands in the same split across runs and "
    "engines (EXT sampling)",
    tags=("sampling",),
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    labeled = split_column(
        orders,
        "o_orderkey",
        {"train": 0.8, "valid": 0.1, "test": 0.1},
        seed="split13",
    )
    return (
        labeled.groupBy("split")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total_price"))
        .orderBy("split")
    )


@register(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_H.format(seed="strat7", key="doc_id")}
          < CASE lang WHEN 'en' THEN {threshold(0.25)}
                      WHEN 'zh' THEN {threshold(0.6)}
                      WHEN 'es' THEN {threshold(0.8)}
                      WHEN 'de' THEN {threshold(1.0)}
                      WHEN 'fr' THEN {threshold(1.0)}
                      ELSE 0 END
    """,
    doc="per-language quota sampling (deterministic sampleBy): the "
    "threshold is a CASE over the stratum, still one narrow filter — "
    "no per-stratum pass, no shuffle (EXT sampling)",
    tags=("sampling",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        "lang",
        "doc_id",
        {"en": 0.25, "zh": 0.6, "es": 0.8, "de": 1.0, "fr": 1.0},
        seed="strat7",
    ).select("doc_id", "lang")


@register(
    "sample_balance_langs",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT MIN(cnt) AS mn FROM c)
    SELECT d.lang, COUNT(*) AS kept
    FROM documents d
    JOIN c ON d.lang = c.lang
    CROSS JOIN m
    WHERE {_H.format(seed="balance", key="d.doc_id")} * c.cnt
          < m.mn * {HASH_SCALE}
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    doc="corpus mixture balancing: downsample every language toward the "
    "smallest one. Per-stratum counts are a tiny map-side-combined agg "
    "broadcast back to the scan; keep decision is exact bigint math "
    "(h*cnt < min*2^48) so the oracle agrees row-for-row "
    "(EXT sampling/mixture)",
    tags=("sampling",),
)
def sample_balance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = balance_strata(docs, "lang", "doc_id", seed="balance")
    return kept.groupBy("lang").agg(F.count("*").alias("kept")).orderBy("lang")


@register(
    "sample_weighted_topk",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens
      FROM documents
    ),
    d AS (
      SELECT doc_id, n_tokens,
             -ln(({_H.format(seed="wsample", key="doc_id")} + 0.5)
                 / {HASH_SCALE}.0) / n_tokens AS draw
      FROM t
    )
    SELECT doc_id, n_tokens, ROUND(d.draw, 6) AS draw
    FROM d ORDER BY d.draw, doc_id LIMIT 50
    """,
    doc="deterministic weighted sampling WITHOUT replacement "
    "(Efraimidis-Spirakis A-ES): exponential draw -ln(u)/w from a "
    "content-hash uniform, k smallest win; weight = token count, so "
    "longer documents are proportionally likelier. Draw is a narrow "
    "expression; selection is TakeOrdered top-k, no global sort "
    "(EXT sampling)",
    tags=("sampling",),
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_topk
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.size(tokens("text")).alias("n_tokens"))
    picked = weighted_sample_topk(
        base, "doc_id", F.col("n_tokens"), k=50, seed="wsample"
    )
    return picked.select(
        "doc_id", "n_tokens", F.round("draw_key", 6).alias("draw")
    )


@register(
    "sample_weighted_per_group",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens
      FROM documents
    ),
    d AS (
      SELECT doc_id, lang, n_tokens,
             -ln(({_H.format(seed="wsgrp", key="doc_id")} + 0.5)
                 / {HASH_SCALE}.0) / n_tokens AS draw
      FROM t
    )
    SELECT doc_id, lang, n_tokens, ROUND(draw, 6) AS draw
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY draw, doc_id) AS rn
      FROM d
    ) WHERE rn <= 10
    """,
    doc="per-stratum weighted sampling without replacement (EXT "
    "sampling): Efraimidis-Spirakis draws ranked INSIDE each language "
    "— 10 weight-proportional docs per lang from one window over the "
    "narrow draw expression; the per-source quota sampler corpus "
    "mixing needs",
    tags=("sampling",),
)
def sample_weighted_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.sampling import HASH_SCALE as HS
    from ..operators.sampling import hash48
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tokens")
    )
    u = (hash48(F.col("doc_id"), "wsgrp").cast("double") + 0.5) / float(HS)
    d = base.withColumn("draw", -F.log(u) / F.col("n_tokens"))
    w = W.partitionBy("lang").orderBy("draw", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("doc_id", "lang", "n_tokens", F.round("draw", 6).alias("draw"))
    )


@register(
    "sample_temperature_mix",
    oracle=rf"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ),
    wts AS (
      SELECT lang, cnt, ROUND(SQRT(cnt), 6) AS w FROM counts
    ),
    tot AS (
      SELECT CAST(SUM(CAST(w AS DECIMAL(30,6))) AS DOUBLE) AS tot FROM wts
    ),
    quotas AS (
      SELECT lang, cnt,
             CAST(FLOOR(400 * w / tot) AS BIGINT) AS quota
      FROM wts CROSS JOIN tot
    ),
    ranked AS (
      SELECT d.lang,
             ROW_NUMBER() OVER (PARTITION BY d.lang
               ORDER BY {_H.format(seed="tmix", key="d.doc_id")}, d.doc_id)
               AS rn
      FROM documents d
    )
    SELECT q.lang, q.cnt, q.quota,
           COUNT(*) AS n_sel
    FROM ranked r JOIN quotas q ON r.lang = q.lang
    WHERE r.rn <= q.quota
    GROUP BY q.lang, q.cnt, q.quota
    ORDER BY q.lang
    """,
    doc="temperature-scaled corpus mixing (EXT sampling): per-language "
    "quotas proportional to count^(1/2) — the standard temperature "
    "resampling (tau=2) that upweights low-resource languages relative "
    "to proportional sampling — then a deterministic content-hash "
    "ranked draw fills each quota (quota may exceed a tiny stratum; "
    "the rank filter caps at cnt naturally). sqrt is IEEE-exact and "
    "the weight total uses the exact-decimal sum, so both engines "
    "compute identical quotas. Two tiny aggregates broadcast against "
    "one scan — no data shuffle beyond the per-stratum rank",
    tags=("sampling",),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.sampling import hash48

    from pyspark.storagelevel import StorageLevel

    # persisted 2-column projection: the quota build and the ranked
    # selection both consume it; caching the narrow relation is cheaper
    # than two source scans
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    wts = counts.withColumn("w", F.round(F.sqrt("cnt"), 6))
    tot = wts.agg(dsum("w").alias("tot"))
    quotas = wts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "cnt",
        F.floor(F.lit(400) * F.col("w") / F.col("tot")).cast("bigint").alias("quota"),
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(hash48(F.col("doc_id"), "tmix"), "doc_id")
    )
    ranked = docs.withColumn("rn", rn)
    return (
        ranked.join(F.broadcast(quotas), "lang")
        .where(F.col("rn") <= F.col("quota"))
        .groupBy("lang", "cnt", "quota")
        .agg(F.count(F.lit(1)).alias("n_sel"))
        .orderBy("lang")
    )



def _bootstrap_oracle() -> str:
    from ..operators.sampling import POISSON1_CDF

    u = (
        "(CAST(('0x' || substr(md5(concat_ws('|', 'boot', "
        "CAST(b AS VARCHAR) || '#' || CAST(doc_id AS VARCHAR))), 1, 12)) "
        f"AS BIGINT) + 0.5) / {float(HASH_SCALE)!r}"
    )
    cases = " ".join(
        f"WHEN u < {POISSON1_CDF[k]!r} THEN {k}" for k in range(len(POISSON1_CDF))
    )
    return rf"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens
      FROM documents
    ),
    rep AS (
      SELECT doc_id, n_tokens, unnest(range(0, 8)) AS b FROM t
    ),
    uu AS (SELECT doc_id, n_tokens, b, {u} AS u FROM rep),
    ww AS (
      SELECT b, n_tokens, CASE {cases} ELSE 5 END AS w FROM uu
    )
    SELECT CAST(b AS BIGINT) AS b,
           CAST(SUM(w) AS BIGINT) AS rep_docs,
           CAST(SUM(w * n_tokens) AS BIGINT) AS rep_tokens
    FROM ww GROUP BY b ORDER BY b
    """


@register(
    "sample_bootstrap_ci",
    oracle=_bootstrap_oracle(),
    doc="Poisson-bootstrap replicate totals (Chamandy et al. 2012 — "
    "the sharded-data bootstrap): every (row, replicate) gets an "
    "independent Poisson(1) multiplicity from a content hash, so 8 "
    "bootstrap resamples of the corpus token count compute in ONE "
    "row-local pass with ordinary partial-aggregable sums — no "
    "resampling shuffle, no global coordination; the spread of "
    "rep_tokens IS the uncertainty estimate. Deterministic inverse-CDF "
    "weights, bit-reproduced by the oracle (EXT, sampling/statistics)",
    tags=("sampling", "agg"),
)
def sample_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import poisson_bootstrap_weight
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    rep = docs.select(
        "doc_id",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b"),
    )
    w = poisson_bootstrap_weight(F.col("doc_id"), F.col("b"))
    return (
        rep.select(F.col("b").cast("long").alias("b"), "n_tokens", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("rep_docs"),
            F.sum(F.col("w") * F.col("n_tokens")).cast("long").alias("rep_tokens"),
        )
        .orderBy("b")
    )


@register(
    "sample_epoch_shuffle",
    oracle=f"""
    WITH ranked AS (
      SELECT e.epoch, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.epoch
               ORDER BY {_H.format(seed="ep' || CAST(e.epoch AS VARCHAR) || '", key="d.doc_id")}, d.doc_id
             ) AS pos
      FROM documents d CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e
    )
    SELECT epoch, pos, doc_id FROM ranked WHERE pos <= 10
    ORDER BY epoch, pos
    """,
    doc="deterministic multi-epoch shuffle (EXT, sampling): each "
    "training epoch orders the corpus by a DIFFERENT content-hash "
    "permutation (seed = epoch id) — reproducible shuffling with no "
    "RNG state, the property data loaders need for resumable, "
    "bit-replayable epochs. The hash is a narrow scan-side "
    "expression; at 100 TB the ordering becomes the range-partitioned "
    "sort key of the epoch's shard files (sink_sorted_clustered), "
    "same expression. Checked: first 10 positions of 3 epochs",
    tags=("sampling",),
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = docs.sparkSession.range(3).select(F.col("id").cast("int").alias("epoch"))
    # per-epoch seed: md5('ep<epoch>|doc_id') — hash48 takes a literal
    # seed, so the epoch-dependent seed is built inline (oracle mirrors)
    keyed = docs.crossJoin(F.broadcast(epochs)).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.concat(F.lit("ep"), F.col("epoch").cast("string")),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    w = W.partitionBy("epoch").orderBy("h", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 10)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


@register(
    "pipeline_curriculum_buckets",
    oracle=r"""
    WITH q AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
             LEAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))::DOUBLE
                   / 100.0, 1.0) AS score
      FROM documents
    ),
    staged AS (
      SELECT doc_id, n_tokens, score,
             NTILE(4) OVER (ORDER BY score, doc_id) AS stage
      FROM q
    )
    SELECT stage,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS stage_tokens,
           ROUND(MIN(score), 6) AS min_score,
           ROUND(MAX(score), 6) AS max_score
    FROM staged GROUP BY stage ORDER BY stage
    """,
    doc="curriculum staging (EXT, LLM pipeline): rank the corpus by a "
    "difficulty/quality score (here the length-based score component; "
    "swap in any model score) with a total deterministic order, NTILE "
    "into 4 curriculum stages, report per-stage token mass and score "
    "band — the 'train easy-to-hard' data-ordering primitive. The "
    "ntile derives from a DISTRIBUTED exact global rank (operators/"
    "stats.py:global_row_numbers, two-phase range-partitioned — never "
    "a single-task Window.orderBy) + the exact-integer NTILE formula "
    "(ntile_from_rank) against a broadcast 1-row count; bit-identical "
    "to F.ntile and fully parallel at 100 TB",
    tags=("sampling", "text", "pipeline"),
)
def pipeline_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import global_row_numbers, ntile_from_rank
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_tokens"),
        F.least(
            F.size(tokens("text")).cast("double") / 100.0, F.lit(1.0)
        ).alias("score"),
    )
    ranked = global_row_numbers(q, ["score", "doc_id"], out_col="_i")
    # 1-row total count from the already-persisted ranked lineage (the
    # range-partitioned relation inside global_row_numbers is cached,
    # so this does NOT re-scan the corpus)
    nrow = ranked.agg(F.max("_i").alias("_n"))
    staged = ranked.crossJoin(F.broadcast(nrow)).withColumn(
        "stage", ntile_from_rank(F.col("_i"), F.col("_n"), 4)
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("stage_tokens"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("stage")
    )


#: Mixture-solver constants: sampling temperature and the target token
#: budget the mixture allocates (plan-level policy constants, pluggable
#: the way CAP_PER_SOURCE is).
MIX_TEMPERATURE = 0.7
MIX_TOKEN_BUDGET = 50_000


@register(
    "sample_mixture_weights",
    oracle=rf"""
    WITH tok AS (
      SELECT source,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
      FROM documents
    ),
    per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM tok GROUP BY source
    ),
    powed AS (
      SELECT source, n_docs, n_tokens,
             ROUND(pow(n_tokens::DOUBLE, {MIX_TEMPERATURE}), 6) AS num
      FROM per_src
    ),
    tot AS (
      SELECT CAST(SUM(CAST(num AS DECIMAL(30,6))) AS DOUBLE) AS total
      FROM powed
    )
    SELECT source, n_docs, n_tokens,
           ROUND(num / total, 6) AS weight_r6,
           ROUND({MIX_TOKEN_BUDGET} * (num / total) / n_tokens, 6)
             AS epochs_r6
    FROM powed CROSS JOIN tot
    ORDER BY source
    """,
    doc="temperature-based domain-MIXTURE solver (E53/E66 composition; "
    "the unigram-LM mixing rule of GPT-3/LLaMA-style pipelines): "
    "per-source token masses are raised to temperature "
    f"{MIX_TEMPERATURE} and normalized into sampling weights — tau<1 "
    "upweights small curated domains against the web-scale crawl — "
    "then a target token budget is allocated per source and expressed "
    "as effective EPOCHS (allocated/available; >1 means the source "
    "repeats, the signal data-constrained scaling laws watch). Scale "
    "shape: one narrow corpus scan collapsing map-side to |sources| "
    "rows; the pow/normalize runs on the source-dimension relation — "
    "scale-independent. Hash-safety: pow is the only libm call and "
    "both engines see identical integer token masses; its result is "
    "6-dp-rounded BEFORE the exact-decimal normalizer sum (the "
    "bm25/ln idiom), so the division inputs — and hence the weights — "
    "are bit-identical (EXT, LLM pipeline)",
    tags=("sampling", "pipeline", "text"),
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as _T

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.select(
        "source", _T.token_count("text").alias("n_tok")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    powed = per_src.withColumn(
        "num",
        F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_TEMPERATURE)), 6),
    )
    tot = powed.agg(dsum("num").alias("total"))
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("num") / F.col("total"), 6).alias("weight_r6"),
            F.round(
                F.lit(MIX_TOKEN_BUDGET)
                * (F.col("num") / F.col("total"))
                / F.col("n_tokens"),
                6,
            ).alias("epochs_r6"),
        )
        .orderBy("source")
    )
