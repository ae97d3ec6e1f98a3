"""Similarity search over embedding columns (E19, E40).

Two tiers, same API:

- ``brute_force_topk``: exact cosine top-k. One narrow pass over the
  corpus per query batch (queries are broadcast), then a per-query
  top-k window. Exact baseline; linear scan — fine when the corpus
  fits a full read per query batch.
- ``ivf_topk``: scan only the query's coarse cell (here the ``label``
  column stands in for a trained IVF/k-means assignment). At 100 TB
  with the corpus parquet partitioned by cell, the cell predicate
  becomes partition pruning — the scan touches 1/n_cells of the data.
  Recall < 1.0 by construction (that's the trade).

The cosine math is a JVM higher-order fold (see functions.vectors) —
no Python, no UDF, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.vectors import vec_dot, with_unit_vector


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for each query row (q_id, neighbor id,
    cosine, rank). Excludes self-matches."""
    unit_q = with_unit_vector(queries, vec_col, "__u")
    unit_c = with_unit_vector(corpus, vec_col, "__u")
    q = unit_q.select(F.col(id_col).alias("q_id"), F.col("__u").alias("q_vec"))
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    c = unit_c.repartition(n_part).select(
        F.col(id_col).alias("n_id"), F.col("__u").alias("n_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("n_id") != F.col("q_id"))
        .withColumn("cosine", vec_dot("q_vec", "n_vec"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", F.col("n_id").alias("neighbor_id"), "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 10,
    n_probe_cells: int = 1,
) -> DataFrame:
    """Approximate top-k: compare each query only against corpus rows in
    its own coarse cell(s). ``n_probe_cells=1`` probes the query's own
    cell; the equi-join on cell is the pruning."""
    unit_q = with_unit_vector(queries, vec_col, "__u")
    unit_c = with_unit_vector(corpus, vec_col, "__u")
    q = unit_q.select(
        F.col(id_col).alias("q_id"),
        F.col(cell_col).alias("cell"),
        F.col("__u").alias("q_vec"),
    )
    n_part = corpus.sparkSession.sparkContext.defaultParallelism
    c = unit_c.repartition(n_part).select(
        F.col(id_col).alias("n_id"),
        F.col(cell_col).alias("cell"),
        F.col("__u").alias("n_vec"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("n_id") != F.col("q_id"))
        .withColumn("cosine", vec_dot("q_vec", "n_vec"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", F.col("cell").alias("cell"), F.col("n_id").alias("neighbor_id"), "cosine", "rank")
    )


def brute_force_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Vectorized exact top-k: the THROUGHPUT path.

    The JVM fold formulations above are bit-reproducible (oracle-
    hashable) but evaluate interpreted per element; this variant does
    the same math as one numpy matmul per Arrow batch — each executor
    scores its corpus partition against the (small, collected) query
    matrix and emits only its LOCAL top-k per query, so the final
    global top-k shuffles at most k × n_queries rows per partition.
    BLAS accumulation order differs from a sequential fold in float
    low bits, so this is benchmarked rows-only, not hash-compared.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()  # queries are small by contract
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            S = C @ Q.T  # (batch, n_queries)
            n_ids = pdf[id_col].to_numpy()
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                s = np.where(n_ids == qid, -np.inf, S[:, j])
                top = np.argsort(-s)[:k]
                top = top[np.isfinite(s[top])]
                out_q.extend([qid] * len(top))
                out_n.extend(n_ids[top])
                out_c.extend(s[top])
            yield pd.DataFrame(
                {"q_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "q_id long, neighbor_id long, cosine double"
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine", "rank")
    )


def _pq_train(
    subs: DataFrame,
    codes_k: int,
    iters: int,
    train_limit: int | None = None,
) -> DataFrame:
    """One Lloyd chain keyed by the subspace index ``s`` over
    (vid, s, v) sub-vector rows: train a ``codes_k``-word codebook per
    subspace (seeds = lowest ids, exact-decimal means — the same
    deterministic trainer recipe as ``operators.clustering``).
    Returns the codebooks (s, cid, c). Shared by the plain-PQ and the
    IVFADC residual quantizers; the corpus encode is the callers'
    shuffle-free expression pass (see :func:`_pq_encode_codes`).

    ``train_limit``: when set, the Lloyd rounds train ONLY on rows with
    ``vid < train_limit`` — the production FAISS recipe, which fits
    codebooks on a bounded sample (~1M vectors) instead of the corpus.
    Without it, every ANN plan pays ``iters`` full-corpus shuffles
    before answering a single query; with it the training cost is
    O(sample) regardless of corpus size. The ``vid < N`` cut is
    deterministic and oracle-mirrorable (one WHERE clause); ids here
    are arbitrary synthetic keys, so the cut is an unbiased sample —
    on a corpus whose ids correlate with content, use the content-hash
    idiom from ``operators.sampling.hash48`` instead.

    Round-12 assignment shape (guide §2.3/§2.4): per-subspace
    codebooks collapse to an m-row broadcast of candidate ARRAYS and
    the argmin is a codegen array_min over (dist2, cid) structs —
    bit-identical to the previous row_number().over(orderBy(dist2,
    cid)) pick (struct ordering = same tie-break, NaNs greatest) but
    with no per-candidate row explosion and no Exchange + Sort +
    Window per Lloyd pass.

    Seed-diversity note: seeds are always the sub-vectors of ids
    0..codes_k-1. For the IVFADC residual trainer those seeds may all
    come from one coarse cell, which can yield low-diversity codebooks
    — a recall/quality concern, not a correctness one (the oracle
    mirrors the same recipe and tests/test_ann_recall.py pins the
    measured floor). If recall degrades at larger k_coarse, seed
    per-cell instead."""
    from .clustering import _scored_struct_array

    train = (
        subs.where(F.col("vid") < train_limit) if train_limit is not None else subs
    )
    cent = train.where(F.col("vid") < codes_k).select(
        "s", F.col("vid").alias("cid"), F.col("v").alias("c")
    )
    for _ in range(iters):
        cands = cent.groupBy("s").agg(
            F.collect_list(
                F.struct("cid", "c", vec_dot("c", "c").alias("cc"))
            ).alias("cands")
        )
        scored = train.withColumn("_vv", vec_dot("v", "v")).join(
            F.broadcast(cands), "s"
        )
        best = F.array_min(_scored_struct_array(vv_col="_vv"))
        assign = (
            scored.select("vid", "s", "v", best["cid"].alias("cid"))
            .where(F.col("cid").isNotNull())
        )
        dim_means = (
            assign.select("s", "cid", F.posexplode("v"))
            .groupBy("s", "cid", "pos")
            .agg(
                F.round(
                    F.sum(F.col("col").cast("decimal(30,12)")).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("mn")
            )
        )
        # m·codes_k rows. Without a checkpoint every broadcast of cent
        # re-executes ALL previous rounds (the broadcast exchange is
        # re-planned per consumer), turning the loop quadratic.
        cent = dim_means.groupBy("s", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mn"))),
                lambda st: st["mn"],
            ).alias("c")
        ).localCheckpoint(eager=False)
    return cent


def _pq_train_rows(
    sub_rows: list[tuple[int, int, list[float]]], codes_k: int, iters: int
) -> list[tuple[int, int, list[float]]]:
    """Driver-side PQ training core over already-local (vid, s, v)
    sub-vector rows: the bit-identical local Lloyd chain per subspace
    (``operators.clustering._lloyd_local`` — see its exactness notes).
    Returns the (s, cid, c) codebook rows."""
    from .clustering import _lloyd_local

    by_s: dict[int, list] = {}
    for vid, s, v in sub_rows:
        by_s.setdefault(s, []).append((vid, v))
    out = []
    for s in sorted(by_s):
        grp = sorted(by_s[s], key=lambda t: t[0])
        for cid, c in _lloyd_local(grp, codes_k, iters):
            out.append((s, cid, c))
    return out


def _residual_subs_local(
    trows: list[tuple[int, list[float]]],
    cent_rows: list[tuple[int, list[float]]],
    m: int,
    d: int,
) -> list[tuple[int, int, list[float]]]:
    """The IVFADC residual training sample, derived DRIVER-SIDE from
    the coarse trainer's already-collected (vid, u) sample: assign each
    sample vector to its nearest trained centroid and slice the
    residual into m sub-vectors — the same rows the engine pipeline
    (kmeans_assign → zip_with subtract → posexplode slices → collect)
    would produce, without the second collect job. Exactness: the
    argmin is the identical lexicographic (dist2, cid) pick with the
    identical left-fold dots (see ``clustering._lloyd_local``);
    residual subtraction and slicing are elementwise IEEE doubles on
    both sides."""
    from .clustering import _dot_local

    cands = [(cid, c, _dot_local(c, c)) for cid, c in cent_rows]
    cmap = {cid: c for cid, c, _ in cands}
    out = []
    for vid, v in trows:
        vv = _dot_local(v, v)
        best: tuple[int, float, int] | None = None
        for cid, c, cc in cands:
            d2 = vv - 2.0 * _dot_local(v, c) + cc
            # NaN-greatest key — same comparator note as _lloyd_local
            key = (1, 0.0, cid) if d2 != d2 else (0, d2, cid)
            if best is None or key < best:
                best = key
        if best is None:
            continue
        c = cmap[best[2]]
        r = [a - b for a, b in zip(v, c)]
        for si in range(m):
            out.append((vid, si, r[si * d : (si + 1) * d]))
    return out


def _pq_train_local(subs: DataFrame, codes_k: int, iters: int) -> DataFrame:
    """Driver-side PQ trainer for the BOUNDED ``train_limit`` paths:
    collect the (vid, s, v) training sub-vector sample (train_limit × m
    rows — callers gate this path on ``clustering.LOCAL_TRAIN_MAX``, so
    the collect is a few MB at most, never the FAISS ~1M-vector design
    point, which falls back to the distributed loop), run the
    bit-identical local
    Lloyd chain per subspace (:func:`_pq_train_rows`), and parallelize
    the (s, cid, c) codebooks back. Replaces ~3 s of per-round
    shuffle/checkpoint machinery with one collect job; the unbounded
    path keeps :func:`_pq_train`."""
    rows = [
        (r[0], r[1], list(r[2])) for r in subs.select("vid", "s", "v").collect()
    ]
    out = _pq_train_rows(rows, codes_k, iters)
    cent = subs.sparkSession.createDataFrame(
        out, schema="s int, cid long, c array<double>"
    )
    # Mirrors kmeans_centroids_local: codebook VALUES ride the plan as
    # literals for expression-level consumers (zero jobs per consumer).
    cent._local_rows = out
    return cent


def _pq_local_cands_map(rows: list[tuple[int, int, list[float]]]):
    """{s -> [(cid, c, cc)]} as ONE folded LITERAL map — the
    driver-side-trained twin of :func:`_pq_cands_map`: same struct
    schema, same ``cc`` doubles (local left-fold dot, see
    ``clustering._dot_local``), but ZERO jobs — no groupBy, no
    map_from_entries aggregate, no BroadcastExchange per consumer.
    Foldable from_json delivery (see ``clustering._local_candidate_expr``
    for why naive array literals are ruinously expensive).
    m × codes_k × (d+2) doubles: KBs by construction."""
    import json

    from .clustering import _dot_local

    by_s: dict[int, list] = {}
    for s, cid, c in rows:
        by_s.setdefault(s, []).append((cid, c))
    payload = json.dumps(
        [
            {
                "key": int(s),
                "value": [
                    {
                        "cid": int(cid),
                        "c": [float(x) for x in c],
                        "cc": _dot_local(c, c),
                    }
                    for cid, c in by_s[s]
                ],
            }
            for s in sorted(by_s)
        ]
    )
    return F.map_from_entries(
        F.from_json(
            F.lit(payload),
            "array<struct<key:int,"
            "value:array<struct<cid:bigint,c:array<double>,cc:double>>>>",
        )
    )


def _pq_local_cands_rel(spark, rows: list[tuple[int, int, list[float]]]):
    """ONE-ROW LocalRelation holding the literal codebook map — the
    broadcast build side for driver-side-trained codebooks (same
    column name/shape as :func:`_pq_cands_map`, no upstream query, no
    aggregate job). The broadcast JOIN — rather than inlining the
    literal into the consumer's projection — is deliberate: the join
    is a CollapseProject boundary, so the corpus's derived residual /
    unit-vector columns stay materialized once per row instead of
    re-evaluating inside the m-way encode lambda (measured 16× the
    residual computation per row when inlined)."""
    return spark.sql("VALUES (1)").select(
        _pq_local_cands_map(rows).alias("cmap")
    )


def _pq_dds_expr(qu_col: str, cmap, m: int, d: int, codes_k: int):
    """The per-query ADC LUT map {s·codes_k+cid -> dd} computed as ONE
    expression over the query's unit vector against the literal
    codebook map ``cmap`` — replaces the explode-to-(q_id,s) + codebook
    join + groupBy/collect chain that built the same map relationally.
    dd = ⟨slice(qu, s·d+1, d), codeword⟩ — the identical fold the join
    formulation produced, so every looked-up double is bit-identical."""
    return F.map_from_entries(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.transform(
                    F.element_at(cmap, s.cast("int")),
                    lambda cd: F.struct(
                        (s * codes_k + cd["cid"]).cast("int").alias("k"),
                        vec_dot(
                            F.slice(F.col(qu_col), s * d + 1, d), cd["c"]
                        ).alias("dd"),
                    ),
                ),
            )
        )
    )


def _pq_cands_map(cent: DataFrame) -> DataFrame:
    """ONE row holding {s -> [(cid, c, cc)]} — the broadcast side of
    the expression-level corpus encode. m x codes_k x (d+2) doubles:
    KBs by construction, scale-independent of the corpus."""
    return (
        cent.groupBy("s")
        .agg(
            F.collect_list(
                F.struct("cid", "c", vec_dot("c", "c").alias("cc"))
            ).alias("cands")
        )
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("s", "cands"))
            ).alias("cmap")
        )
    )


def _pq_encode_codes(vec_col: str, m: int, d: int):
    """codes[s] = argmin_cid dist²(sub-vector s of ``vec_col``,
    codeword) for s = 0..m-1, fully expression-level against the
    broadcast ``cmap`` column — the round-12 corpus encode. The old
    encode exploded the corpus to n·m sub-vector rows, joined codes_k
    candidates onto each and ranked a (vid, s) window: an Exchange +
    Sort over n·m·codes_k rows before a single code existed. This
    computes the same argmin (same dist² folds, same (dist2, cid)
    tie-break via struct array_min, NaNs greatest) with zero shuffles
    and no row explosion — at 100 TB the encode becomes one narrow
    map-side pass over the vectors. The sub-vector and its self-dot
    are hoisted into a per-s struct OUTSIDE the candidate loop
    (evaluated once per subspace, not once per candidate — measured
    2.5 s -> 1.2 s warm for the sf0.1 encode); the dist² doubles are
    unchanged (same folds, same values)."""
    subvv = F.transform(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.slice(F.col(vec_col), i * d + 1, d),
        ),
        lambda sv: F.struct(sv.alias("sv"), vec_dot(sv, sv).alias("vv")),
    )
    return F.transform(
        subvv,
        lambda x, s: F.array_min(
            F.transform(
                F.element_at(F.col("cmap"), s.cast("int")),
                lambda cd: F.struct(
                    (
                        x["vv"]
                        - F.lit(2.0) * vec_dot(x["sv"], cd["c"])
                        + cd["cc"]
                    ).alias("dist2"),
                    cd["cid"].alias("cid"),
                ),
            )
        )["cid"],
    )


def _pq_lut_map(lut: DataFrame, codes_k: int) -> DataFrame:
    """Pack the per-query ADC LUT rows (q_id, s, cid, dd) as one row
    per query: {s * codes_k + cid -> dd} — query-dimension-sized,
    broadcast for the expression-level scoring pass."""
    return lut.groupBy("q_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("s") * codes_k + F.col("cid"))
                    .cast("int")
                    .alias("k"),
                    F.col("dd"),
                )
            )
        ).alias("dds")
    )


def _pq_adc_score(codes_col: str, codes_k: int):
    """ADC approximate cosine: fold of the m looked-up LUT entries in
    subspace order from 0.0 — the same left fold (bit-identical
    doubles) the previous groupBy(q_id, vid) + sorted-collect_list
    formulation produced, but computed row-local against the broadcast
    ``dds`` map: the corpus codes never shuffle for scoring, where the
    old shape shuffled n·m·|queries| partial rows into the (q_id, vid)
    aggregation."""
    return F.aggregate(
        F.transform(
            F.col(codes_col),
            lambda c, i: F.element_at(
                F.col("dds"), (i * codes_k + c).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    codes_k: int = 16,
    iters: int = 2,
    k: int = 10,
    n_dims: int = 64,
    refine: int | None = None,
    train_limit: int | None = None,
    truncate_shortlist: bool = False,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) with asymmetric
    distance computation, fully deterministic. With ``refine=N`` the
    ADC top-N shortlist per query is re-ranked by EXACT cosine on the
    raw unit vectors (FAISS IndexRefine), returning (q_id,
    neighbor_id, cosine, rank) instead of the approximate score:

    1. unit-normalize, split each vector into ``m`` subspaces — as ROWS
       ``(vid, s, subvector)``, not plan width, so ``m`` scales without
       growing the query plan;
    2. train a ``codes_k``-word codebook per subspace in ONE Lloyd loop
       keyed by ``s`` (seeds = lowest ids, exact-decimal means — the
       same deterministic trainer recipe as ``operators.clustering``);
    3. encode the corpus: each vector becomes ``m`` small codes;
    4. ADC: each query precomputes an (s, code) → dot-product LUT
       (m × codes_k × n_queries rows — KBs, broadcast); a corpus
       vector's approximate cosine is the fold of its m looked-up
       entries in subspace order (left fold from 0.0 — bit-identical
       on any engine).

    Scale shape: PQ compresses 100 TB of float vectors to ~1-2% code
    bytes that scan at memory-bandwidth speed. Round-12 shape: the
    corpus encode is a zero-shuffle expression pass against the
    broadcast codebook map (:func:`_pq_encode_codes` — the old encode
    exploded n·m sub-vector rows and ranked a (vid, s) window), and
    ADC scoring folds each row's m codes against the broadcast
    per-query LUT map row-locally (:func:`_pq_adc_score` — the old
    scoring shuffled n·m·|queries| partial rows into a (q_id, vid)
    aggregation). The training sample is the only exploded relation
    left. ``train_limit`` bounds the codebook training sample to
    ``vid < train_limit`` (the FAISS bounded-sample recipe — see
    :func:`_pq_train`); the encoding pass always covers the full
    corpus. Returns (q_id, neighbor_id, approx_cosine, rank), top
    ``k`` per query by approximate score; recall floor vs the exact
    scan pinned in tests/test_ann_recall.py.
    """
    if n_dims % m != 0:
        raise ValueError(f"dim {n_dims} not divisible by m={m}")
    d = n_dims // m

    from .clustering import spread_to_cores

    e = spread_to_cores(
        with_unit_vector(
            corpus.select(
                F.col(id_col).alias("vid"), F.col(vec_col).alias("v0")
            ),
            "v0",
            "u",
        ).select("vid", "u")
    )
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.slice("u", i * d + 1, d),
    )
    # Only the TRAINING sample explodes to sub-vector rows now (the
    # corpus encode below is expression-level); checkpoint it once so
    # the explode+normalize never re-executes across Lloyd rounds.
    from .clustering import LOCAL_TRAIN_MAX

    if train_limit is not None and train_limit <= LOCAL_TRAIN_MAX:
        tsubs = e.where(F.col("vid") < train_limit).select(
            "vid", F.posexplode(slices).alias("s", "v")
        )
        cent = _pq_train_local(tsubs, codes_k, iters)
    else:
        # train_limit above the driver-side gate (or unbounded): the
        # RETAINED distributed Lloyd chain trains on the (possibly
        # filtered) sample — identical values (see LOCAL_TRAIN_MAX).
        subs = e.select(
            "vid", F.posexplode(slices).alias("s", "v")
        ).localCheckpoint(eager=False)
        cent = _pq_train(subs, codes_k, iters, train_limit)
    # Driver-side-trained codebooks ride the plan as literals: the
    # corpus encode and the per-query LUT need no codebook relation,
    # no broadcast exchange, no jobs — only values (same doubles).
    cb_rows = getattr(cent, "_local_rows", None)
    if cb_rows is not None:
        cmap_rel = _pq_local_cands_rel(corpus.sparkSession, cb_rows)
        enc = e.crossJoin(F.broadcast(cmap_rel)).select(
            "vid", _pq_encode_codes("u", m, d).alias("codes")
        )
    else:
        enc = e.crossJoin(F.broadcast(_pq_cands_map(cent))).select(
            "vid", _pq_encode_codes("u", m, d).alias("codes")
        )

    qe = with_unit_vector(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("v0")),
        "v0",
        "qu",
    ).select("q_id", "qu")
    if cb_rows is not None:
        dds_rel = qe.crossJoin(F.broadcast(cmap_rel)).select(
            "q_id",
            _pq_dds_expr("qu", F.col("cmap"), m, d, codes_k).alias("dds"),
        )
    else:
        qslices = F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.slice("qu", i * d + 1, d),
        )
        qsub = qe.select("q_id", F.posexplode(qslices).alias("s", "qs"))
        lut = qsub.join(F.broadcast(cent), "s").select(
            "q_id", "s", "cid", vec_dot("qs", "c").alias("dd")
        )
        dds_rel = _pq_lut_map(lut, codes_k)

    scored_q = (
        enc.crossJoin(F.broadcast(dds_rel))
        .where(F.col("vid") != F.col("q_id"))
        .select(
            "q_id", "vid", _pq_adc_score("codes", codes_k).alias("approx_cosine")
        )
    )
    # Per-query ranks are exact DISTRIBUTED grouped_row_numbers, not a
    # q_id-partitioned window: with a handful of queries ranking a
    # whole corpus each, the partitioned window is lint-clean but
    # still funnels |corpus| rows per query through one task. Values
    # are identical (same total order per query).
    from .stats import grouped_row_numbers

    pq_order = [F.desc("approx_cosine"), F.asc("vid")]
    if refine is None:
        return (
            grouped_row_numbers(scored_q, ["q_id"], pq_order, out_col="rank")
            .where(F.col("rank") <= k)
            .select(
                "q_id", F.col("vid").alias("neighbor_id"), "approx_cosine", "rank"
            )
        )
    # Shortlist-then-refine (the FAISS IndexRefine pattern): ADC picks
    # the top `refine` candidates per query in the compressed domain,
    # then ONLY those shortlist rows fetch their raw unit vectors for
    # an exact cosine re-rank to top k. At 100 TB the exact pass
    # touches refine x |queries| vectors — thousands, not billions —
    # so recall approaches exact while the scan stays compressed.
    short = (
        grouped_row_numbers(scored_q, ["q_id"], pq_order, out_col="arank")
        .where(F.col("arank") <= refine)
        .select("q_id", "vid")
    )
    if truncate_shortlist:
        # Lazy localCheckpoint (round 13, guide §3.3): the shortlist is
        # refine × |queries| rows BY CONSTRUCTION (150 here — tiny at
        # any scale), but its lineage carries the whole compressed-
        # domain scoring tree (broadcast codebooks, the m-way encode
        # expression, the ADC rank machinery). Truncating here stops
        # every downstream consumer from re-embedding that tree —
        # measured 2.42M -> 0.57M plan chars / 2926 -> 686 Exchanges /
        # 7.4 -> 6.1 s isolated on search_hybrid_rrf_batch_ivfpq,
        # oracle-identical — so the deep HYBRID consumers (two more
        # rank passes + the fuse above this shortlist) opt in. The
        # standalone ANN plans leave it off: with only the exact
        # re-rank downstream, the same boundary MEASURED ~0.6-1 s
        # SLOWER (ann_topk_ivfpq isolated 2.4-4.1 -> 4.0-4.7 s) — the
        # extra materialization job buys no construct savings there.
        # AQE/stat loss at the LogicalRDD is irrelevant for 150 rows.
        short = short.localCheckpoint(eager=False)
    ref = (
        short.join(e, "vid")
        .join(F.broadcast(qe), "q_id")
        .select("q_id", "vid", vec_dot("u", "qu").alias("cosine"))
    )
    return (
        grouped_row_numbers(
            ref, ["q_id"], [F.desc("cosine"), F.asc("vid")], out_col="rank"
        )
        .where(F.col("rank") <= k)
        .select("q_id", F.col("vid").alias("neighbor_id"), "cosine", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_coarse: int = 4,
    coarse_iters: int = 2,
    n_probe: int = 2,
    m: int = 16,
    codes_k: int = 16,
    iters: int = 2,
    k: int = 10,
    n_dims: int = 64,
    refine: int | None = None,
    train_limit: int | None = None,
    truncate_shortlist: bool = False,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011; FAISS IndexIVFPQ): coarse cell
    pruning + product quantization of the RESIDUALS — the composition
    of the shipped IVF (``operators.clustering``) and PQ
    (:func:`pq_topk`) halves, and the standard billion-scale index
    layout. Fully deterministic:

    1. unit-normalize; train the coarse quantizer IN UNIT SPACE
       (``kmeans_centroids`` on the unit vectors — for unit vectors L2
       and cosine rank identically, and the inner-product
       decomposition below is exact);
    2. residual r = u - c(cell); train the ``m``-subspace /
       ``codes_k``-word codebooks on the residual sub-vectors (the
       shared :func:`_pq_train` Lloyd chain) and encode the
       corpus to (vid, cell, m codes);
    3. each query probes its ``n_probe`` nearest cells
       (``kmeans_assign_topn``) and precomputes (a) the per-cell base
       term qc = qu·c and (b) the (s, code) → qu_s·codeword LUT —
       both broadcast, query-dimension-sized;
    4. candidates = the codes of the probed cells (CELL-EQUI-JOIN
       against the broadcast probe relation — the IVF prune, never a
       cartesian); a candidate's approximate cosine is exactly
       qu·u = qu·(c + r) ≈ qc + sum_s LUT[s, code_s], folded in
       subspace order from 0.0 then shifted by qc — bit-identical on
       any engine.

    With ``refine=N`` the ADC top-N shortlist per query is re-ranked
    by exact cosine on the raw unit vectors (FAISS IndexRefine),
    returning (q_id, neighbor_id, cosine, rank).

    Scale shape: the 100 TB vector corpus is scanned as ~1-2% code
    bytes AND only in the probed cells (IVF cuts the scanned fraction
    to ~n_probe/k_coarse); no raw-vector shuffle anywhere — the only
    raw-vector touches are quantizer training, the one-off encode, and
    the refine×|queries| exact fetch. ``train_limit`` bounds BOTH
    trainers (coarse k-means and residual PQ) to ``vid < train_limit``
    (the FAISS bounded-sample recipe — see :func:`_pq_train`);
    assignment and encoding always cover the full corpus. Every
    per-query ranking is an exact distributed grouped_row_numbers
    rank. Recall floor vs the exact scan pinned in
    tests/test_ann_recall.py.
    """
    if n_dims % m != 0:
        raise ValueError(f"dim {n_dims} not divisible by m={m}")
    d = n_dims // m
    from .clustering import kmeans_assign, kmeans_assign_topn, kmeans_centroids
    from .stats import grouped_row_numbers

    e = with_unit_vector(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v0")),
        "v0",
        "u",
    ).select("vid", "u")
    cent = kmeans_centroids(
        e, "vid", "u", k=k_coarse, iters=coarse_iters, train_limit=train_limit
    )
    assigned = kmeans_assign(e.select("vid", F.col("u").alias("v")), cent)
    # Driver-side-trained coarse centroids: fetch a row's own centroid
    # from a literal {cid -> c} map instead of a broadcast join — zero
    # jobs, same doubles (see clustering._local_centroid_map).
    cent_rows = getattr(cent, "_local_rows", None)
    if cent_rows is not None:
        from .clustering import _local_centroid_map

        _cmap = _local_centroid_map(cent_rows)
        res = assigned.select(
            "vid",
            F.col("cid").alias("cell"),
            F.zip_with(
                "v", F.element_at(_cmap, F.col("cid")), lambda a, b: a - b
            ).alias("r"),
        )
    else:
        res = assigned.join(F.broadcast(cent), "cid").select(
            "vid",
            F.col("cid").alias("cell"),
            F.zip_with("v", "c", lambda a, b: a - b).alias("r"),
        )
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.slice("r", i * d + 1, d),
    )
    # Only the TRAINING sample explodes to residual sub-vector rows
    # (the corpus encode below is expression-level); bounded samples
    # train driver-side, the unbounded path keeps the distributed loop.
    from .clustering import LOCAL_TRAIN_MAX

    if train_limit is not None and train_limit <= LOCAL_TRAIN_MAX:
        trows = getattr(cent, "_train_rows", None)
        if trows is not None and cent_rows is not None:
            # One collect total: the residual training sample is the
            # coarse trainer's sample transformed driver-side (see
            # _residual_subs_local) — the second collect job the
            # engine-side tsubs chain paid is gone.
            cb = None
            cb_rows = _pq_train_rows(
                _residual_subs_local(trows, cent_rows, m, d), codes_k, iters
            )
        else:
            tsubs = res.where(F.col("vid") < train_limit).select(
                "vid", F.posexplode(slices).alias("s", "v")
            )
            cb = _pq_train_local(tsubs, codes_k, iters)
            cb_rows = cb._local_rows
    else:
        # above the driver-side gate (or unbounded): distributed Lloyd
        # over the (possibly filtered) residual sample — see
        # clustering.LOCAL_TRAIN_MAX for the why and the equivalence.
        subs = res.select(
            "vid", F.posexplode(slices).alias("s", "v")
        ).localCheckpoint(eager=False)
        cb = _pq_train(subs, codes_k, iters, train_limit)
        cb_rows = None
    # zero-shuffle residual encode: (vid, cell, m codes) — see pq_topk;
    # driver-side-trained codebooks ride the plan as literals.
    if cb_rows is not None:
        cmap_rel = _pq_local_cands_rel(corpus.sparkSession, cb_rows)
        enc = res.crossJoin(F.broadcast(cmap_rel)).select(
            "vid", "cell", _pq_encode_codes("r", m, d).alias("codes")
        )
    else:
        enc = res.crossJoin(F.broadcast(_pq_cands_map(cb))).select(
            "vid", "cell", _pq_encode_codes("r", m, d).alias("codes")
        )

    qe = with_unit_vector(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("v0")),
        "v0",
        "qu",
    ).select("q_id", "qu")
    if cb_rows is not None:
        dds_rel = qe.crossJoin(F.broadcast(cmap_rel)).select(
            "q_id",
            _pq_dds_expr("qu", F.col("cmap"), m, d, codes_k).alias("dds"),
        )
    else:
        qslices = F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.slice("qu", i * d + 1, d),
        )
        qsub = qe.select("q_id", F.posexplode(qslices).alias("s", "qs"))
        lut = qsub.join(F.broadcast(cb), "s").select(
            "q_id", "s", "cid", vec_dot("qs", "c").alias("dd")
        )
        dds_rel = _pq_lut_map(lut, codes_k)
    probes = kmeans_assign_topn(
        qe.select(F.col("q_id").alias("vid"), F.col("qu").alias("v")),
        cent,
        n=n_probe,
    )
    if cent_rows is not None:
        probes = probes.select(
            F.col("vid").alias("q_id"),
            F.col("cid").alias("cell"),
            vec_dot("v", F.element_at(_cmap, F.col("cid"))).alias("qc"),
        )
    else:
        probes = (
            probes.select(
                F.col("vid").alias("q_id"), F.col("cid").alias("cell"), "v"
            )
            .join(F.broadcast(cent.withColumnRenamed("cid", "cell")), "cell")
            .select("q_id", "cell", vec_dot("v", "c").alias("qc"))
        )

    # candidates = codes of the probed cells: the CELL-EQUI-JOIN against
    # the broadcast probe relation is still the IVF prune (never a
    # cartesian); a (vid, q_id) pair is unique (one cell per vector, one
    # probe row per (q_id, cell)), so the old groupBy(q_id, vid) with
    # max(qc) + sorted-fold collapses to the row-local qc + ADC fold —
    # same addition order, bit-identical doubles, no scoring shuffle.
    scored_q = (
        enc.join(F.broadcast(probes), "cell")
        .join(F.broadcast(dds_rel), "q_id")
        .where(F.col("vid") != F.col("q_id"))
        .select(
            "q_id",
            "vid",
            (F.col("qc") + _pq_adc_score("codes", codes_k)).alias(
                "approx_cosine"
            ),
        )
    )
    pq_order = [F.desc("approx_cosine"), F.asc("vid")]
    if refine is None:
        return (
            grouped_row_numbers(scored_q, ["q_id"], pq_order, out_col="rank")
            .where(F.col("rank") <= k)
            .select(
                "q_id", F.col("vid").alias("neighbor_id"), "approx_cosine", "rank"
            )
        )
    short = (
        grouped_row_numbers(scored_q, ["q_id"], pq_order, out_col="arank")
        .where(F.col("arank") <= refine)
        .select("q_id", "vid")
    )
    if truncate_shortlist:
        # Lazy localCheckpoint (round 13, guide §3.3): the shortlist is
        # refine × |queries| rows BY CONSTRUCTION (150 here — tiny at
        # any scale), but its lineage carries the whole compressed-
        # domain scoring tree (broadcast codebooks, the m-way encode
        # expression, the ADC rank machinery). Truncating here stops
        # every downstream consumer from re-embedding that tree —
        # measured 2.42M -> 0.57M plan chars / 2926 -> 686 Exchanges /
        # 7.4 -> 6.1 s isolated on search_hybrid_rrf_batch_ivfpq,
        # oracle-identical — so the deep HYBRID consumers (two more
        # rank passes + the fuse above this shortlist) opt in. The
        # standalone ANN plans leave it off: with only the exact
        # re-rank downstream, the same boundary MEASURED ~0.6-1 s
        # SLOWER (ann_topk_ivfpq isolated 2.4-4.1 -> 4.0-4.7 s) — the
        # extra materialization job buys no construct savings there.
        # AQE/stat loss at the LogicalRDD is irrelevant for 150 rows.
        short = short.localCheckpoint(eager=False)
    ref = (
        short.join(e, "vid")
        .join(F.broadcast(qe), "q_id")
        .select("q_id", "vid", vec_dot("u", "qu").alias("cosine"))
    )
    return (
        grouped_row_numbers(
            ref, ["q_id"], [F.desc("cosine"), F.asc("vid")], out_col="rank"
        )
        .where(F.col("rank") <= k)
        .select("q_id", F.col("vid").alias("neighbor_id"), "cosine", "rank")
    )


def semantic_screen(
    corpus: DataFrame,
    refs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Max-cosine screening of a corpus against a bounded reference set
    — SEMANTIC benchmark decontamination (the E40/E48 composition).

    ``text_decontaminate`` catches verbatim leakage (shared 5-grams);
    this catches what n-grams cannot — a paraphrased or translated
    benchmark row is ~0 n-gram overlap but high embedding cosine. The
    reference side is the eval suite: fixed size, scale-INDEPENDENT of
    the corpus, so it broadcasts and candidate generation is a
    map-side nested loop over each corpus partition; the per-row max /
    hit-count collapse map-side (partial aggregation) so the single
    shuffle on ``id_col`` moves one row per corpus vector, never the
    |corpus| x |refs| score relation. At 100 TB this is one narrow
    corpus scan, same shape as the n-gram variant's broadcast join.

    Returns one row per corpus vector:
    ``(id_col, max_cosine, n_hits, contaminated)`` where ``n_hits``
    counts references at or above ``threshold``. Self-matches are NOT
    excluded — screening a corpus that literally contains an eval row
    should flag it.

    ``refs`` must be non-empty (same contract as
    ``text.bm25_scores``'s query bag): an empty eval suite would make
    the crossJoin yield zero rows and every corpus row would silently
    vanish from the audit trail instead of coming back uncontaminated.
    The emptiness probe is one cheap job over the refs relation, which
    is bounded-by-contract (it broadcasts two lines later).
    """
    if refs.isEmpty():
        raise ValueError("refs must be non-empty")
    unit_c = with_unit_vector(corpus, vec_col, "__u")
    q = with_unit_vector(refs, vec_col, "__u").select(
        F.col(id_col).alias("r_id"), F.col("__u").alias("r_vec")
    )
    scored = (
        unit_c.select(F.col(id_col), F.col("__u").alias("c_vec"))
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", vec_dot("c_vec", "r_vec"))
    )
    hit = F.col("cosine") >= F.lit(threshold)
    return scored.groupBy(id_col).agg(
        F.max("cosine").alias("max_cosine"),
        F.count(F.when(hit, F.lit(1))).alias("n_hits"),
        (F.count(F.when(hit, F.lit(1))) > 0).cast("int").alias("contaminated"),
    )


def semantic_screen_ivf(
    corpus: DataFrame,
    refs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """IVF-pruned :func:`semantic_screen` — the recall/cost knob.

    The brute screen costs |refs| dot products per corpus row; this
    variant compares each corpus vector ONLY against references in its
    own coarse cell (``cell_col`` — a trained IVF/k-means assignment;
    the driver tables carry one as ``label``), cutting the per-row
    constant to |refs in cell|. Same physical shape: the refs relation
    is scale-independent and broadcasts, candidates generate map-side
    (now an equi-join on cell instead of a nested loop), and the
    per-row max/hit-count collapse map-side before the single
    ``id_col`` shuffle — still one narrow corpus scan.

    Recall < 1.0 by construction: a paraphrase that lands in a
    different coarse cell than its eval twin is missed (the IVF trade;
    pinned by a measured floor in tests/test_ann_recall.py). The LEFT
    join keeps every corpus row in the audit trail — a row whose cell
    holds no reference comes back uncontaminated with ``max_cosine``
    NULL and ``n_hits`` 0, never dropped. ``refs`` must be non-empty
    (same contract and reason as :func:`semantic_screen`).
    """
    if refs.isEmpty():
        raise ValueError("refs must be non-empty")
    unit_c = with_unit_vector(corpus, vec_col, "__u")
    q = with_unit_vector(refs, vec_col, "__u").select(
        F.col(cell_col).alias("__cell"), F.col("__u").alias("r_vec")
    )
    scored = (
        unit_c.select(
            F.col(id_col),
            F.col(cell_col).alias("__cell"),
            F.col("__u").alias("c_vec"),
        )
        .join(F.broadcast(q), "__cell", "left")
        .withColumn("cosine", vec_dot("c_vec", "r_vec"))
    )
    hit = F.col("cosine") >= F.lit(threshold)
    return scored.groupBy(id_col).agg(
        F.max("cosine").alias("max_cosine"),
        F.count(F.when(hit, F.lit(1))).alias("n_hits"),
        (F.count(F.when(hit, F.lit(1))) > 0).cast("int").alias("contaminated"),
    )
