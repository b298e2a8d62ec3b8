"""Full-path integration: Carbon plaintext ingest → stored datapoints →
rollup → render API output (the §3.1 → §3.2 lifecycle in one test).

A user of the reference pushes `path value ts` lines and reads back
Graphite JSON from /render; this test does exactly that against the Spark
engine: streaming ingest with rewrite rules and admission control, the
stored LWW datapoints view, and api.render CSV/JSON over a glob target.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from datayours_spark import api
from datayours_spark.kernel.rules import RewriteRule
from datayours_spark.streaming.ingest import IngestPipeline

TMP = Path(__file__).resolve().parent / "_tmp" / "integration"

NOW = 1_704_672_000  # 2024-01-08 00:00 UTC
H = 3_600


@pytest.fixture()
def pipeline(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    (TMP / "in").mkdir(parents=True)
    p = IngestPipeline(
        spark=spark,
        input_dir=str(TMP / "in"),
        output_dir=str(TMP / "out"),
        checkpoint_dir=str(TMP / "ckpt"),
        now_override=NOW,
        rewrites=[RewriteRule(r"^house\.", "home.")],
        rollup_steps=(3_600,),
    )
    yield p
    shutil.rmtree(TMP, ignore_errors=True)


def test_ingest_to_render(spark, pipeline):
    t0 = NOW - 4 * H
    lines = [
        f"house.temp.kitchen 20.5 {t0}",
        f"house.temp.kitchen 21.5 {t0 + H}",
        f"house.temp.kitchen 19.0 {t0 + H}",  # same slot, later arrival wins
        f"house.temp.hall 18.0 {t0}",
        f"house.temp.hall 17.5 {t0 + 3 * H}",
        f"house.power.total 250 {t0 + 2 * H}",
    ]
    (TMP / "in" / "data.txt").write_text("\n".join(lines) + "\n")
    q = pipeline.start()
    q.processAllAvailable()
    q.stop()

    dp = pipeline.datapoints()

    # catalog sees the rewritten namespace
    assert [r["path"] for r in api.index(dp).collect()] == [
        "home.power.total",
        "home.temp.hall",
        "home.temp.kitchen",
    ]

    # glob render over the ingested data, dense grid with LWW + nulls
    grid = api.render(
        spark,
        dp,
        targets="home.temp.*",
        from_=t0,
        until_=t0 + 3 * H,
        step=H,
        format="df",
    )
    got = {(r["path"], r["slot"]): r["value"] for r in grid.collect()}
    assert got == {
        ("home.temp.kitchen", t0): 20.5,
        ("home.temp.kitchen", t0 + H): 19.0,  # later line overwrote the slot
        ("home.temp.kitchen", t0 + 2 * H): None,
        ("home.temp.kitchen", t0 + 3 * H): None,
        ("home.temp.hall", t0): 18.0,
        ("home.temp.hall", t0 + H): None,
        ("home.temp.hall", t0 + 2 * H): None,
        ("home.temp.hall", t0 + 3 * H): 17.5,
    }

    # JSON render text for one series
    out = api.render(
        spark, dp, targets="home.power.total",
        from_=t0 + 2 * H, until_=t0 + 2 * H, step=H, format="json",
    )
    assert '"target": "home.power.total"' in out
    assert f"[250, {t0 + 2 * H}]" in out

    # the hourly rollup maintenance job materialized the same slots
    levels = pipeline.refresh_rollups()
    rolled = {
        (r["path"], r["slot"]): r["value"]
        for r in levels[3_600].where("path = 'home.temp.kitchen'").collect()
    }
    assert rolled == {
        ("home.temp.kitchen", t0): 20.5,
        ("home.temp.kitchen", t0 + H): 19.0,
    }
