"""Source-format scans (S6 CSV, S7 JSON config, S9 JSONL) and the parsing
scalar functions (C9/C13/C14/C15)."""

import json

from pyspark.sql import functions as F


def test_csv_roundtrip(spark, tmp_path):
    """S6: CSV task scan (scripts/generate_benchmark_json.py:21-90)."""
    p = str(tmp_path / "tasks.csv")
    with open(p, "w") as f:
        f.write("task id,start url,goal\n")
        f.write("t1,https://a.com,buy things\n")
        f.write('t2,https://b.com,"find, compare"\n')
    df = (
        spark.read.csv(p, header=True)
        .select(
            F.col("task id").alias("task_id"),
            F.col("start url").alias("start_url"),
            "goal",
        )
    )
    rows = {r["task_id"]: (r["start_url"], r["goal"]) for r in df.collect()}
    assert rows == {
        "t1": ("https://a.com", "buy things"),
        "t2": ("https://b.com", "find, compare"),
    }


def test_json_config_scan(spark, tmp_path):
    """S7: multi-line JSON config scan (subtask_benchmark/config/config.py)."""
    p = str(tmp_path / "cfg.json")
    cfg = [
        {"task_id": "a", "env": {"start_url": "https://x.com"}, "eval": {"eval_type": "url_matcher"}},
        {"task_id": "b", "env": {"start_url": "https://y.com"}, "eval": {"eval_type": "string_matcher"}},
    ]
    with open(p, "w") as f:
        json.dump(cfg, f)
    df = spark.read.json(p, multiLine=True)
    got = {r["task_id"]: r["env"]["start_url"] for r in df.collect()}
    assert got == {"a": "https://x.com", "b": "https://y.com"}


def test_jsonl_scan(spark, tmp_path):
    """S9: line-delimited JSONL page list (wacz.ts:54-66 pages.jsonl)."""
    p = str(tmp_path / "pages.jsonl")
    with open(p, "w") as f:
        f.write('{"startUrl": "https://s1.com", "title": "one"}\n')
        f.write('{"startUrl": "https://s2.com", "title": "two"}\n')
    df = spark.read.json(p)
    assert sorted(r["startUrl"] for r in df.collect()) == [
        "https://s1.com",
        "https://s2.com",
    ]


def test_parse_call_args(spark):
    from warc_bench_spark.functions.parsing import parse_call_args_udf

    df = spark.createDataFrame(
        [('click("a1", 3, 4.5)',), ("scroll(0, -100)",), ("garbage",), (None,)],
        "s string",
    )
    got = [r["a"] for r in df.select(parse_call_args_udf("s").alias("a")).collect()]
    assert json.loads(got[0]) == ["a1", 3, 4.5]
    assert json.loads(got[1]) == [0, -100]
    assert got[2] is None and got[3] is None


def test_unicode_unescape(spark):
    from warc_bench_spark.functions.parsing import unicode_unescape_udf

    df = spark.createDataFrame([("a\\nb",), ("caf\\u00e9",)], "s string")
    got = [r["u"] for r in df.select(unicode_unescape_udf("s").alias("u")).collect()]
    assert got == ["a\nb", "café"]


def test_payload_decode_and_normalize(spark):
    from warc_bench_spark.functions.parsing import (
        decode_payload_col,
        normalize_payload_col,
    )

    df = spark.createDataFrame(
        [
            (b'{"x":1,"timestamp=123": 0}', "application/json"),
            (b"\x89PNG...", "image/png"),
            (b"a=1&timestamp=999", "application/x-www-form-urlencoded"),
        ],
        "payload binary, content_type string",
    )
    out = df.select(
        normalize_payload_col(
            decode_payload_col(F.col("payload"), F.col("content_type"))
        ).alias("p")
    ).collect()
    assert out[0]["p"] == '{"x":1,"timestamp={timestamp}": 0}'
    assert out[1]["p"] is None  # non-textual content type stays opaque
    assert out[2]["p"] == "a=1&timestamp={timestamp}"
