"""datayours_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of akbooer/DataYours (Graphite/Whisper-style
time-series database), re-expressed Spark-first.

Layout:
    kernel/     pure-Python semantics (retention specs, time parsing, globs,
                first-match rule engines) — no Spark dependency
    sources/    ingest parsing (Carbon plaintext), events adapter, dataMine
    operators/  fetch (dense grid), rollup (+xFF), alignment (pivot/as-of/
                LOCF/staircase), catalog (find/expand/index)
    functions/  text analysis, dedup (exact/minhash/simhash/span/semantic),
                similarity search (brute/LSH/IVF/IVF-PQ + index
                persistence), sampling/mixing/sharding, multimodal column
                plumbing
    plans/      resolution router (archive selection on read)
    streaming/  Structured Streaming ingest with slot last-write-wins
    render/     Graphite-compatible JSON/CSV output formats
"""

__version__ = "0.1.0"
