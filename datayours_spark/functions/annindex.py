"""ANN index persistence: the production lifecycle of the IVF / IVF-PQ
index state (coarse centroids, PQ codebooks, encoded codes, inverted-list
assignments).

Reference scope note: the reference engine has no vector surface — this
module belongs to the training-data extensions (README "Training-data
extensions"), applying the reference's own persist-the-derived-state
discipline (S12 header cache, `L_DataWhisper.lua:624-641`) to the ANN
index.

Layout of an index directory:

- ``centroids/``   parquet (centroid_id, cv, cnorm) — KBs of model state
- ``codebooks/``   parquet (sub, code, cw) — KBs of model state
- ``codes/``       parquet (vec_id, codes, nrm), PARTITIONED BY cluster —
  the m-byte payload per vector, laid out as the inverted lists
  themselves: a search that probes ``nprobe`` clusters reads exactly
  those partitions (partition pruning does the inverted-list seek), so
  search IO is ``nprobe/k`` of the index regardless of corpus size.
- ``meta.json``    dim / m / ks / k / seed / residual — the training
  constants a searcher must share with the builder.

Everything is plain parquet + one JSON file: any engine (or the DuckDB
oracle) can read the same index back.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datayours_spark.io import small_df


def save_ann_index(
    out_dir: str,
    centroids: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    codes: DataFrame,
    assignments: DataFrame,
    meta: dict,
) -> None:
    """Persist the full IVF-PQ index bundle.  ``codes`` must carry
    (vec_id, codes, nrm); the cluster column is joined in from
    ``assignments`` and becomes the partition key (the inverted-list
    layout)."""
    spark = centroids.sparkSession
    centroids.write.mode("overwrite").parquet(f"{out_dir}/centroids")
    cb = small_df(
        spark,
        [
            (sub, code, cw)
            for sub, book in enumerate(codebooks)
            for code, cw in book
        ],
        "sub int, code int, cw array<double>",
    )
    cb.write.mode("overwrite").parquet(f"{out_dir}/codebooks")
    (
        codes.join(assignments, "vec_id")
        .select("cluster", "vec_id", "codes", "nrm")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{out_dir}/codes")
    )
    with open(f"{out_dir}/meta.json", "w") as fh:
        json.dump(meta, fh, sort_keys=True)


def load_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Load an index bundle saved by :func:`save_ann_index`.

    Returns ``{"centroids": DF, "codebooks": list, "codes": DF,
    "assignments": DF, "meta": dict}`` in exactly the shapes
    ``ivfpq_topk``/``ivfpq_residual_topk`` inject: searching a loaded
    index never re-trains or re-encodes anything, and candidate reads
    prune to the probed cluster partitions."""
    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = spark.read.parquet(f"{out_dir}/centroids")
    cb_rows = spark.read.parquet(f"{out_dir}/codebooks").collect()
    m = 1 + max(r["sub"] for r in cb_rows)
    codebooks: list[list[tuple[int, list[float]]]] = [[] for _ in range(m)]
    for r in sorted(cb_rows, key=lambda r: (r["sub"], r["code"])):
        codebooks[r["sub"]].append(
            (int(r["code"]), [float(x) for x in r["cw"]])
        )
    stored = spark.read.parquet(f"{out_dir}/codes")
    return {
        "centroids": centroids,
        "codebooks": codebooks,
        "codes": stored.select("vec_id", "codes", "nrm"),
        "assignments": stored.select(
            "vec_id", F.col("cluster").cast("int").alias("cluster")
        ),
        "meta": meta,
    }


def append_to_ann_index(out_dir: str, new_vectors: DataFrame) -> None:
    """Incrementally index a batch of new vectors against a SAVED index:
    encode with the stored codebooks, assign with the stored centroids,
    and append into the cluster-partitioned codes table.

    This is the streaming-ingest path of the index lifecycle: per-batch
    cost is one encode projection + one broadcast-centroid assignment
    over the BATCH (the standing index is never rewritten — dynamic
    partition append only touches the clusters the batch lands in).
    Model state (centroids/codebooks) is immutable here, as in any IVF
    deployment — retraining is a rebuild, not an append.  The caller owns
    dedup of vec_ids across batches.

    A residual index (``meta['residual']``) encodes ``v - centroid(v)``
    against residual-trained codebooks, while ``nrm`` must stay the FULL
    vector's norm (the ADC scoring contract) — encoding raw vectors there
    would silently corrupt every appended vector's scores.
    """
    from datayours_spark.functions.similarity import (
        as_double_array,
        dot,
        ivf_assign,
        pq_encode,
        residual_vectors,
    )

    spark = new_vectors.sparkSession
    idx = load_ann_index(spark, out_dir)
    dim = idx["meta"]["dim"]
    base = (
        residual_vectors(new_vectors, idx["centroids"])
        if idx["meta"].get("residual")
        else new_vectors
    )
    codes = pq_encode(base, idx["codebooks"], dim)
    if idx["meta"].get("residual"):
        # residual codes carry the residual's norm; swap in the original
        # vector's (mirrors the build path's scoring contract)
        nrms = new_vectors.select(
            F.col("vec_id"), as_double_array("embedding").alias("v")
        ).select("vec_id", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm"))
        codes = codes.select("vec_id", "codes").join(nrms, "vec_id")
    assign = ivf_assign(new_vectors, idx["centroids"])
    (
        codes.join(assign, "vec_id")
        .select("cluster", "vec_id", "codes", "nrm")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{out_dir}/codes")
    )


# ------------------------------------------------------------- SQ8 rung

def save_sq_index(
    out_dir: str,
    centroids: DataFrame,
    bounds: list[tuple[float, float]],
    codes: DataFrame,
    assignments: DataFrame,
    meta: dict,
) -> None:
    """Persist the IVF-SQ index bundle — the SQ rung of the same
    lifecycle :func:`save_ann_index` gives IVF-PQ.  Layout:

    - ``centroids/``  parquet (centroid_id, cv, cnorm) — KBs
    - ``bounds/``     parquet (dim, vmin, vmax) — the 2·dim doubles of
      SQ8 model state, engine-readable like every other artifact
    - ``codes/``      parquet (vec_id, codes), PARTITIONED BY cluster —
      the inverted lists; a probe-limited search reads exactly the
      probed partitions
    - ``meta.json``   dim / k / seed / kind="ivf-sq8"

    ``codes`` carries (vec_id, codes) from
    :func:`~datayours_spark.functions.similarity.sq_encode`; the cluster
    partition key is joined in from ``assignments``."""
    spark = centroids.sparkSession
    centroids.write.mode("overwrite").parquet(f"{out_dir}/centroids")
    b = small_df(
        spark,
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(bounds)],
        "dim int, vmin double, vmax double",
    )
    b.write.mode("overwrite").parquet(f"{out_dir}/bounds")
    (
        codes.join(assignments, "vec_id")
        .select("cluster", "vec_id", "codes")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{out_dir}/codes")
    )
    with open(f"{out_dir}/meta.json", "w") as fh:
        json.dump({**meta, "kind": "ivf-sq8"}, fh, sort_keys=True)


def load_sq_index(spark: SparkSession, out_dir: str) -> dict:
    """Load an SQ bundle saved by :func:`save_sq_index`.

    Returns ``{"centroids": DF, "bounds": list[(vmin, vmax)],
    "codes": DF (cluster, vec_id, codes), "meta": dict}`` in the shapes
    :func:`~datayours_spark.functions.similarity.ivfsq_topk_pruned`
    takes: the codes relation KEEPS its cluster partition column so the
    probe filter prunes partitions, and searching a loaded index never
    re-trains or re-encodes anything."""
    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = spark.read.parquet(f"{out_dir}/centroids")
    brows = spark.read.parquet(f"{out_dir}/bounds").orderBy("dim").collect()
    bounds = [(float(r["vmin"]), float(r["vmax"])) for r in brows]
    stored = spark.read.parquet(f"{out_dir}/codes")
    return {
        "centroids": centroids,
        "bounds": bounds,
        "codes": stored.select(
            F.col("cluster").cast("int").alias("cluster"), "vec_id", "codes"
        ),
        "meta": meta,
    }


def append_to_sq_index(out_dir: str, new_vectors: DataFrame) -> None:
    """Incrementally index a batch against a SAVED SQ index: encode with
    the stored bounds, assign with the stored centroids, append into the
    cluster-partitioned codes table — the streaming-ingest path, same
    contract as :func:`append_to_ann_index` (model state immutable,
    dynamic partition append touches only the clusters the batch lands
    in, caller owns vec_id dedup).

    Out-of-bounds components in a new batch clamp to [0, 255] (the SQ8
    codec's saturation behavior) — bounds retraining is a rebuild."""
    from datayours_spark.functions.similarity import ivf_assign, sq_encode

    spark = new_vectors.sparkSession
    idx = load_sq_index(spark, out_dir)
    codes = sq_encode(new_vectors, idx["bounds"])
    assign = ivf_assign(new_vectors, idx["centroids"])
    (
        codes.join(assign, "vec_id")
        .select("cluster", "vec_id", "codes")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{out_dir}/codes")
    )
