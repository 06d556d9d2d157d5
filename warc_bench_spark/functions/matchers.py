"""Vectorized matcher/evaluator registry (SURVEY.md §2.12, U1).

The reference scores outcomes through a registry of named per-row matchers
(``/root/reference/src/orby/subtask_benchmark/evaluator/evaluator.py:17-190``,
``@EvaluatorRegistry.register(...)``): ``string_matcher`` (normalized string
equality, :165-174), ``json_matcher`` (key-set + multiset/dict equality,
:118-148), ``url_matcher`` (URL equality, :185-190). ``js_matcher``
(:58-91) executes live-page JavaScript; its *declarative subset* — ~97% of
the actual benchmark script corpus — is covered by ``dom`` over parsed
markup (``functions/dom_match.py``); only truly dynamic scripts remain out
of scope.

Here each matcher is a *column expression factory* — ``match(expected,
actual) -> BooleanColumn`` — so scoring a billion rows is one vectorized
select, not a Python loop. The registry keeps the reference's pluggability:
``MATCHERS["string"](col_a, col_b)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urls import canonicalize_udf

MATCHERS: dict[str, Callable[[Column, Column], Column]] = {}


def register(name: str):
    def deco(fn):
        MATCHERS[name] = fn
        return fn

    return deco


@register("string")
def string_matcher(expected: Column, actual: Column) -> Column:
    """Normalized string equality: trim, collapse whitespace, casefold —
    the evaluator.py:165-174 semantics."""
    def norm(c: Column) -> Column:
        return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))

    return norm(expected) == norm(actual)


@register("json")
def json_matcher(expected: Column, actual: Column) -> Column:
    """Order-insensitive JSON equality for flat objects: equal sorted key
    sets and equal values per key (evaluator.py:118-148 — Counter/dict
    equality). Inputs are JSON object strings; values compared as strings."""
    em = F.from_json(expected, "map<string,string>")
    am = F.from_json(actual, "map<string,string>")
    keys_equal = F.array_sort(F.map_keys(em)) == F.array_sort(F.map_keys(am))
    vals_equal = F.forall(
        F.map_keys(em),
        lambda k: F.element_at(em, k).eqNullSafe(F.element_at(am, k)),
    )
    return keys_equal & vals_equal


@register("multiset")
def multiset_matcher(expected: Column, actual: Column) -> Column:
    """Order-insensitive list equality (Counter semantics,
    evaluator.py:137-148) over array columns."""
    return F.array_sort(expected) == F.array_sort(actual)


@register("url")
def url_matcher(expected: Column, actual: Column) -> Column:
    """URL equality after canonicalization (evaluator.py:185-190, upgraded
    with the C1 normalizeUrl rules so volatile params don't break equality)."""
    return canonicalize_udf(expected).eqNullSafe(canonicalize_udf(actual))


@register("dom")
def dom_matcher(expected: Column, actual: Column) -> Column:
    """js_matcher's declarative subset as data (evaluator.py:58-91 reward
    semantics): ``expected`` = the evaluate script, ``actual`` = the page
    markup; True iff the DOM predicate holds (reward 1.0). NULL marks a
    script outside the declarative subset — the honest boundary, distinct
    from a failed task. See functions/dom_match.py."""
    from .dom_match import dom_reward_udf

    return dom_reward_udf(actual, expected) == F.lit(1.0)
