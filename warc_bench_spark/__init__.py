"""warc_bench_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch re-expression of the data-processing capabilities of the
reference system (sanjari-orb/warc-bench, surveyed in /root/repo/SURVEY.md)
as idiomatic Spark: DataFrame/SQL plans, Arrow-vectorized pandas UDFs for the
few string-scalar functions Spark lacks, explicit partitioning / skew
handling, and snapshot-committed table state for resumable crawl waves.

Layout:
    config.py        CrawlConfig — every knob of the deterministic crawl spec
    session.py       SparkSession factory (local test/bench tuning)
    synth.py         deterministic synthetic web corpus (documents/pages/seeds/robots)
    simulator.py     pure-Python reference simulator (golden crawl order)
    state.py         snapshot-manifest table state (Iceberg-semantics fallback)
    functions/urls.py    canonicalize + hash (vectorized)
    functions/text.py    text-analysis column functions (lang id, quality, tokens)
    operators/extract.py span explode + URL extraction
    operators/dedup.py   URL-seen anti-join + Bloom shard prefilter
    operators/politeness.py  per-host virtual-time schedule, skew-aware ranking
    operators/crawl.py   the wave loop (schedule → fetch → expand → commit)
    operators/similarity.py  minhash/simhash/ngram/embedding dedup + ANN
    plans/relational.py  relational operator inventory for the driver oracle
"""

__version__ = "0.1.0"
