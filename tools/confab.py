#!/usr/bin/env python
"""Scale A/B for the round's session confs (r15 verdict #7): prove
`coalescePartitions.parallelismFirst=false` and `io.spread_scan` on a
corpus two orders of magnitude past the sf0.1 fixtures, not only on the
tuning-guide citation.

Builds a synthetic fixture directory (documents: CONFAB_DOCS rows,
default 600k, same schema as the driver fixtures, with planted
near-dup pairs so the dedup paths do real pair work; embeddings:
CONFAB_VECS x 64 float rows) under spark-warehouse/, then times a
document/embedding-heavy query subset in a FRESH session per config:

  base      DATAYOURS_AQE_PARALLELISM_FIRST=false (the shipped default)
  pfirst    ...=true  (Spark's out-of-the-box value)
  nospread  base + DATAYOURS_NO_SPREAD=1

Each config line is CPU-probe bracketed.  At this corpus size the
documents scan delivers >= cores splits, so every r16 small-input gate
(static_construct / _fuse_small) is provably a no-op — the run also
demonstrates that.  Prints one JSON line per config.

Usage: python tools/confab.py            [CONFAB_DOCS=600000]
       python tools/confab.py --keep     # keep the generated fixture
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("CONFAB_DOCS", 600_000))
N_VECS = int(os.environ.get("CONFAB_VECS", 200_000))
FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", f"confab_sf_{N_DOCS}",
)

QUERIES = [
    "q_winnow_fingerprints",
    "q_winnow_neardup",
    "q_ingest_pipeline",
    "q_pipeline_payload",
    "q_bm25",
    "q_top_ngrams",
    "q_simhash_neardup",
    "q_dedup_minhash",
    "q_dedup_embed",
    "q_ann_ivf",
]


def _probe() -> float:
    t0 = time.perf_counter()
    sum(i * i for i in range(20_000_000))
    return round(time.perf_counter() - t0, 2)


def build_fixture() -> None:
    if os.path.exists(os.path.join(FIX, "_DONE")):
        return
    shutil.rmtree(FIX, ignore_errors=True)
    from pyspark.sql import functions as F

    from datayours_spark.session import get_spark

    spark = get_spark("confab-build", driver_memory=os.environ.get("CONFAB_DRIVER_MEM", "24g"))
    # documents: ~60 tokens/doc drawn deterministically from a 50k-word
    # vocabulary; every 50th doc re-emits its neighbour's token stream
    # with ONE token changed — a planted near-dup pair per 50 docs, so
    # winnow / minhash / simhash emit linear real pairs
    src = F.when(
        F.pmod(F.col("id"), F.lit(50)) == 49, F.col("id") - 1
    ).otherwise(F.col("id"))
    docs = (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(59)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(
                                src * 100 + i
                                + F.when(
                                    (F.pmod(F.col("id"), F.lit(50)) == 49)
                                    & (i == 30),
                                    F.lit(10_000_000),
                                ).otherwise(F.lit(0)),
                            ),
                            F.lit(50_000),
                        ),
                    ),
                ),
                " ",
            ).alias("text"),
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("lang"),
            F.element_at(
                F.array(F.lit("web"), F.lit("books"), F.lit("code"),
                        F.lit("wiki")),
                (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.write.mode("overwrite").parquet(os.path.join(FIX, "documents.parquet"))
    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id") * 64 + d), F.lit(2000)) / 1000.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
        F.pmod(F.col("id"), F.lit(7)).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(FIX, "embeddings.parquet"))
    with open(os.path.join(FIX, "_DONE"), "w") as fh:
        fh.write("ok")
    spark.stop()


RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import __spark_entry__ as em
from datayours_spark.session import get_spark
spark = get_spark("confab-run", driver_memory=os.environ.get("CONFAB_DRIVER_MEM", "24g"))
timings = {{}}
for name in {queries!r}:
    fn = em.queries()[name]
    t0 = time.perf_counter()
    try:
        df = fn(spark, {fix!r})
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
    except Exception as e:  # keep the line: one query must not void the A/B
        timings[name] = "ERR " + type(e).__name__
print("CONFAB " + json.dumps(timings))
spark.stop()
"""


def main() -> None:
    build_fixture()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = {
        "base": {},
        "pfirst_true": {"DATAYOURS_AQE_PARALLELISM_FIRST": "true"},
        "nospread": {"DATAYOURS_NO_SPREAD": "1"},
    }
    for cname, envdelta in configs.items():
        env = dict(os.environ)
        env.update(envdelta)
        env["SPARK_GRAFT_SF_DIR"] = FIX
        p_before = _probe()
        code = RUN_ONE.format(root=root, queries=QUERIES, fix=FIX)
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True,
        )
        wall = round(time.perf_counter() - t0, 1)
        p_after = _probe()
        line = next(
            (ln for ln in out.stdout.splitlines() if ln.startswith("CONFAB ")),
            None,
        )
        timings = json.loads(line.removeprefix("CONFAB ")) if line else None
        print(json.dumps({
            "config": cname, "docs": N_DOCS, "vecs": N_VECS,
            "probe_before": p_before, "probe_after": p_after,
            "session_wall": wall, "queries": timings,
            "rc": out.returncode,
            **({"stderr_tail": out.stderr[-500:]} if timings is None else {}),
        }), flush=True)
    if "--keep" not in sys.argv[1:]:
        shutil.rmtree(FIX, ignore_errors=True)


if __name__ == "__main__":
    main()
