"""Matcher registry tests — mirror the evaluator rule tables of
subtask_benchmark/evaluator/evaluator.py (string/json/multiset/url)."""

from pyspark.sql import functions as F

from warc_bench_spark.functions.matchers import MATCHERS


def run_matcher(spark, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [
        r["m"]
        for r in df.select(MATCHERS[name](F.col("e"), F.col("a")).alias("m")).collect()
    ]


def test_string_matcher(spark):
    rows = [
        ("Hello  World", "hello world"),
        ("  spaced\tout ", "spaced out"),
        ("abc", "abd"),
    ]
    assert run_matcher(spark, "string", rows, "e string, a string") == [True, True, False]


def test_json_matcher(spark):
    rows = [
        ('{"a": 1, "b": "x"}', '{"b": "x", "a": 1}'),   # key order irrelevant
        ('{"a": 1}', '{"a": 2}'),                        # value differs
        ('{"a": 1}', '{"a": 1, "b": 2}'),                # key set differs
        ('{"a": null}', '{"a": null}'),                  # nulls equal
    ]
    assert run_matcher(spark, "json", rows, "e string, a string") == [
        True,
        False,
        False,
        True,
    ]


def test_multiset_matcher(spark):
    rows = [
        (["x", "y", "y"], ["y", "x", "y"]),
        (["x", "y"], ["x", "y", "y"]),
    ]
    assert run_matcher(
        spark, "multiset", rows, "e array<string>, a array<string>"
    ) == [True, False]


def test_url_matcher(spark):
    rows = [
        # volatile param values differ -> still equal after canonicalization
        ("https://a.com/x?timestamp=1", "https://a.com/x?timestamp=99999"),
        ("https://a.com/x?id=1", "https://a.com/x?id=2"),
        ("A.com/x", "https://a.com/x"),  # scheme completion + host case
    ]
    assert run_matcher(spark, "url", rows, "e string, a string") == [True, False, True]
