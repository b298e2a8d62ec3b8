"""Sampling and data-mixing operators for training-data pipelines.

Beyond the reference surface (BASELINE.json north star): deterministic
hash-based stratified sampling and per-group quota top-k selection — the two
primitives behind corpus "data mixing" (up/down-weighting languages or
sources to a target distribution).

Scale design:
- Stratified sampling is a pure projection + filter: the keep/drop decision
  is ``md5(doc_id) % 100 < rate[stratum]``, evaluated row-local with NO
  shuffle, no sort, no count pre-pass.  Unlike ``df.sample()`` the decision
  is a function of the row alone, so it is reproducible across engines,
  cluster sizes, partitionings, and reruns — essential when the sample
  defines a training corpus that must be re-derivable.
- Quota top-k is one shuffle on the stratum key + a bounded per-group sort;
  with AQE skew-split a hot stratum (e.g. ``en`` at 60% of the corpus)
  splits across reducers.  For k << group size, Spark's window TopK rewrite
  (rank filter pushed into the sort) keeps state at O(k) per partition.

The rate/quota tables are tiny driver-side literals folded into the plan
(a ``CASE WHEN`` cascade), not a join — nothing to broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datayours_spark.functions.dedup import md5_int32


def hash_bucket(id_col: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): md5-derived, engine-portable."""
    return md5_int32(F.concat(F.lit(salt), id_col.cast("string"))) % buckets


def rate_column(stratum_col: Column, rates: dict[str, int], default: int = 0) -> Column:
    """Percent keep-rate for a stratum as a literal CASE cascade."""
    expr: Column = F.lit(default)
    for key, rate in sorted(rates.items()):
        expr = F.when(stratum_col == key, F.lit(rate)).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, int],
    salt: str = "strat",
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    ``rates`` maps stratum value -> percent (0..100).  Unlisted strata are
    dropped.  Adds the ``bucket`` column so the decision is auditable.
    """
    bucket = hash_bucket(F.col(id_col), salt)
    return (
        df.withColumn("bucket", bucket)
        .where(F.col("bucket") < rate_column(F.col(stratum_col), rates))
    )


def temperature_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    alpha: float,
    target_rows: int,
    salt: str = "temp",
) -> DataFrame:
    """α-scaled ("temperature") corpus mixing: sample toward the
    distribution ``p_l ∝ c_l^α`` over per-stratum counts — the published
    multilingual-LM scheme that up-weights low-resource languages (α < 1
    flattens the corpus distribution; α=1 is proportional, α=0 uniform
    across strata).

    Per-stratum keep rate ``r_l = min(1, target_rows·p_l / c_l)``; a row
    survives iff its salted-md5 bucket (mod 1e6) falls under
    ``round(r_l·1e6)`` — one integer threshold per stratum, so any engine
    re-derives the identical kept set.  The expected output size is
    ``target_rows`` (exact only when no stratum saturates at rate 1).

    Scale shape: one tiny map-side-combined count aggregation, its scalar
    normalizer attached by a 1-row broadcast cross join, the per-stratum
    thresholds broadcast back onto the corpus, and a row-local hash
    filter — the 100 TB corpus is scanned once and never shuffled.
    Output adds (thr, bucket) for auditability.
    """
    c = F.col("c").cast("double")
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("c"))
    z = counts.agg(F.sum(F.pow(c, F.lit(alpha))).alias("z"))
    rates = counts.crossJoin(F.broadcast(z)).select(
        stratum_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_rows) * F.pow(c, F.lit(alpha)) / F.col("z") / c,
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("thr"),
    )
    bucket = hash_bucket(F.col(id_col), salt, buckets=1_000_000)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .withColumn("bucket", bucket)
        .where(F.col("bucket") < F.col("thr"))
    )


def uniform_sample_k(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "unif",
) -> DataFrame:
    """Exactly-k uniform sample per group, without replacement: rank rows by
    their salted md5 hash and keep the k smallest.

    The hash order is a uniform random permutation that any engine
    re-derives, so this is the deterministic counterpart of per-group
    reservoir sampling — same window top-k shape as :func:`quota_topk`
    (O(k) per-partition state), one shuffle on the group key.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    )
    return df.withColumn("rk", F.row_number().over(w).cast("long")).where(
        F.col("rk") <= k
    )


def token_budget_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    size_col: str,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Fill a per-group size budget: walk the group's rows in salted-hash
    order (a re-derivable uniform shuffle) and keep every row that STARTS
    under the budget — the standard "sample languages to a target token
    count" mixing op.  The kept set is unique and engine-independent; the
    last kept row may overshoot the budget by at most one document.

    One shuffle (the running-sum window on the group key); ``offset`` — the
    tokens consumed before each kept row — is exposed for auditability.
    """
    order = [
        md5_int32(F.concat(F.lit(salt), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    ]
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(size_col).over(w)
    return (
        df.withColumn("offset", (cum - F.col(size_col)).cast("bigint"))
        .where(F.col("offset") < budget)
    )


def quota_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
) -> DataFrame:
    """Per-group quota: the top-k rows by (order_col DESC, tiebreak ASC).

    The deterministic tiebreak makes the selected set unique, so the same
    quota re-derives identically on any cluster.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def leakage_free_split(
    docs: DataFrame,
    clusters: DataFrame,
    train_pct: int = 90,
    salt: str = "split42_",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster-aware train/val split: (doc_id, cluster_id, split).

    The split UNIT is the near-dup cluster, not the document — every member
    of a duplicate cluster lands on the same side, so the eval set can never
    contain a near-copy of a training document (the leakage failure mode of
    naive per-doc splits).  Singletons (docs in no cluster) use their own id
    as the cluster id.  The side decision is the engine-portable salted-md5
    bucket, so the split is re-derivable from ids alone.

    `clusters` is :func:`~datayours_spark.functions.dedup.dup_clusters`
    output — (doc_id, cluster_id).  Scale shape: one left join on doc_id
    (clusters is small relative to the corpus — only docs with a dup) plus
    a row-local hash; no shuffle beyond the join.
    """
    labeled = docs.select(F.col(id_col).alias("doc_id")).join(
        clusters, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )
    side = F.when(
        hash_bucket(F.col("cluster_id"), salt) < train_pct, F.lit("train")
    ).otherwise(F.lit("val"))
    return labeled.withColumn("split", side)


def shard_balance(
    docs: DataFrame,
    n_shards: int = 8,
    stratum_width: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_stratum: int = 4096,
) -> DataFrame:
    """Token-balanced shard assignment for training-data writers:
    (doc_id, n_tokens, stratum, shard).

    Design — STRATIFIED SNAKE, chosen for the distributed plan, not just
    the math: docs bucket into integer token-count strata
    (``n_tokens div stratum_width`` — exact integer arithmetic, so every
    engine agrees), each stratum round-robins over the shards in
    (n_tokens DESC, doc_id) order, and each stratum's round-robin STARTS
    where the previous (larger-token) stratum stopped — without the
    offset chain every stratum would dump its largest docs on shard 0.
    Within a stratum sizes differ by < stratum_width tokens, so
    round-robin spreads at most (#strata x stratum_width) imbalance
    across shards.

    Scale shape: the only corpus-wide operations are one projection and
    ONE window partitioned by stratum (parallel across strata; a hot
    stratum is one sorted partition of doc-id-sized rows, never the
    corpus).  The offset chain is a window over per-stratum counts —
    #strata rows, driver-scale.  No global ordering anywhere: the naive
    "rank all docs by size" formulation needs a single-partition window,
    which is exactly what this avoids.
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("n_tokens")
    ).withColumn(
        # integer div: exact in every engine (no float rounding at
        # stratum boundaries).  The clamp bounds the stratum COUNT — the
        # offset chain is a literal CASE over #strata branches, and an
        # outlier doc (1M tokens) must not mint 60k strata; everything
        # past the cap shares the top stratum (the giant tail, still
        # round-robined in size order within it).
        "stratum",
        F.least(
            F.expr(f"n_tokens div {int(stratum_width)}"),
            F.lit(int(max_stratum)),
        ),
    )
    wr = Window.partitionBy("stratum").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    )
    ranked = d.withColumn("rn", F.row_number().over(wr) - 1)
    # per-stratum start offsets: cumulative counts of the LARGER-token
    # strata.  #strata rows = model state (like centroid tables):
    # computed driver-side, folded into the plan as a literal CASE — no
    # single-partition window, nothing to broadcast.
    counts = sorted(
        ((r["stratum"], r["count"]) for r in d.groupBy("stratum").count().collect()),
        key=lambda sc: -sc[0],
    )
    offset_expr: Column = F.lit(0)
    acc = 0
    for stratum, cnt in counts:
        offset_expr = (
            F.when(F.col("stratum") == stratum, F.lit(acc)).otherwise(offset_expr)
        )
        acc += cnt
    return ranked.select(
        "doc_id",
        "n_tokens",
        "stratum",
        ((offset_expr + F.col("rn")) % n_shards).cast("int").alias("shard"),
    )


def mixing_weights(
    docs: DataFrame,
    stratum_col: str = "source",
    tokens_col: str | None = None,
    text_col: str = "text",
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled corpus mixing weights per stratum (the
    multilingual-sampling rule of mT5/XLM-R, alpha-smoothed source
    weighting): weight_s = share_s**alpha / sum(share**alpha), where
    share_s is the stratum's fraction of corpus tokens.  ``alpha = 1``
    reproduces natural proportions, ``alpha -> 0`` approaches uniform —
    the knob that keeps a 100:1 head source from drowning the tail.

    Returns one row per stratum: (stratum, n_docs, n_tokens, share,
    weight, alloc_tokens, epochs) — ``alloc_tokens`` is the stratum's
    slice of ``budget`` under the smoothed weights and ``epochs`` the
    implied pass count over its data (epochs > 1 on an up-weighted tail
    stratum is the repeat-rate a training run must budget for).

    Scale shape: ONE map-side-combinable aggregate over the corpus scan
    (strata-sized output), then two broadcast scalar cross-joins for the
    corpus total and the weight denominator — no window, no shuffle
    beyond the strata-keyed combine.  Rounding at 6 dp pins the
    pow/summation float edges across engines.
    """
    # NULL text splits to size -1 and '' to size 1 — both would skew a
    # stratum's n_tokens; count them as 0 tokens, same guard as
    # gopher_rules (ADVICE r8)
    tokens = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.when(
            F.col(text_col).isNotNull() & (F.length(text_col) > 0),
            F.size(F.split(F.col(text_col), " ")),
        ).otherwise(F.lit(0))
    ).cast("bigint")
    per = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("tot"))
    shared = (
        per.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_tokens") / F.col("tot"), 6))
        .withColumn("sa", F.pow(F.col("share"), F.lit(float(alpha))))
    )
    denom = shared.agg(F.sum("sa").alias("sden"))
    out = (
        shared.crossJoin(F.broadcast(denom))
        .withColumn("weight", F.round(F.col("sa") / F.col("sden"), 6))
        .withColumn(
            "alloc_tokens",
            F.floor(F.lit(budget) * F.col("weight")).cast("bigint"),
        )
        .withColumn(
            "epochs", F.round(F.col("alloc_tokens") / F.col("n_tokens"), 4)
        )
    )
    return out.select(
        "stratum",
        "n_docs",
        "n_tokens",
        "share",
        "weight",
        "alloc_tokens",
        "epochs",
    )


def shuffle_chunks(
    chunks: DataFrame,
    key_cols: list[str],
    out_shards: int,
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic OFFLINE SHUFFLE of training chunks — the last pass
    before a dataloader consumes a packed corpus: every chunk gets a
    pseudo-random position in one of ``out_shards`` output shards, so
    adjacent source documents (which packing keeps adjacent) land far
    apart at training time.  Shard-level permutation with intra-shard
    order — exactly the layout sharded dataloaders consume (pick a
    shard, read it sequentially).

    Output: the input key columns plus (out_shard, pos) — pos is the
    chunk's 0-based read position within its output shard, ordered by
    the md5 shuffle key (ties impossible: the key feeds its own
    tiebreak through the input keys).

    Determinism is the contract: the permutation is a pure function of
    (key_cols, seed) — reruns, cluster size, partitioning, and engine
    all reproduce it, so a training run is re-derivable from the seed
    alone (the stratified-sampling discipline applied to ordering).

    Scale shape: one projection computes the shuffle key and output
    shard row-locally, then ONE hash shuffle on out_shard with a
    per-shard sort window assigns positions — state per task is one
    shard's keys, never a GLOBAL sort or an empty-partition window
    (the single-task trap the driver gates document).  With
    out_shards sized so a shard's chunk keys fit a task (thousands of
    shards at 100 TB), the whole pass is corpus-linear."""
    skey = md5_int32(
        F.concat_ws(
            ":", F.lit(seed), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    staged = chunks.select(
        *key_cols,
        skey.alias("skey"),
        F.pmod(skey, F.lit(out_shards)).cast("int").alias("out_shard"),
    )
    w = Window.partitionBy("out_shard").orderBy(
        "skey", *[F.col(c) for c in key_cols]
    )
    return staged.select(
        *key_cols,
        "out_shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )
