"""AXTree / web-state text similarity (SURVEY.md §2 M2).

Re-expresses the reference's accessibility-tree change detector
(``/root/reference/src/orby/trajectory_collector/utils/data_utils.py:75-100``
``axtrees_differ`` and ``:154-171`` ``_keep_the_middle_part_of_string``):
both strings are middle-truncated to 50k chars, compared with a
SequenceMatcher ratio (the reference uses cdifflib's ``CSequenceMatcher``,
the C implementation of stdlib ``difflib.SequenceMatcher`` — same
algorithm, same numbers), and "differ" means ratio < 0.9999.

The ratio algorithm is not expressible in SQL, so the Spark lift is an
Arrow-batched pandas UDF (one Python call per pair, vectorized transfer);
the driver's oracle records a rows-only check and ``tests/test_textsim.py``
pins the numbers against this pure-Python reference implementation.

Backend: when ``cdifflib`` is installed (the reference's own dependency —
``data_utils.py:14`` imports ``CSequenceMatcher``), the C implementation is
used; it computes the identical number ~10-40x faster. This sandbox ships
only stdlib ``difflib``, so the probe (``cdifflib_available``, same gating
pattern as ``codecs.pil_available``) falls back — the one honest O(n^2)
pure-Python boundary in the package.

Identical strings short-circuit to 1.0 — the dominant case for a
change-detector over crawl states that usually have NOT changed. This is
a pure FAST PATH, not a semantic change, but the reason is subtler than
"equal strings trivially match": with default autojunk, characters
occurring in >1% of a ≥200-char sequence are junked and excluded from
``b2j``, so one might expect ``SequenceMatcher(None, a, a).ratio() < 1.0``
for repetitive ``a`` (and indeed NEAR-identical repetitive pairs do
collapse: ``'a'*300`` vs ``'b'+'a'*299`` -> 0.0). Equal strings survive
because ``find_longest_match`` extends any match through ADJACENT EQUAL
JUNK on both sides and size-ties resolve to the lowest (i, j) — the
diagonal — so for ``a == b`` the recursion always covers the full string
and the ratio is exactly 1.0, junk or not. Pinned empirically in
``tests/test_textsim.py`` (structured adversarial cases + the
near-identical pair where autojunk DOES bite, proving the junking is
active); a 3000-case random fuzz over popularity-saturated alphabets
found zero equal-string counterexamples.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

try:  # reference C backend (data_utils.py:14); pure-python fallback here
    from cdifflib import CSequenceMatcher as _Matcher

    _CDIFFLIB = True
except ImportError:
    _Matcher = SequenceMatcher
    _CDIFFLIB = False

DEFAULT_SIMILARITY_THRESHOLD = 0.9999
DEFAULT_MAX_LENGTH = 50_000


def cdifflib_available() -> bool:
    """True when the C SequenceMatcher backend is active (probe, not a
    behavior switch: both backends produce bit-identical ratios)."""
    return _CDIFFLIB


def keep_middle(string: str, length: int) -> str:
    """Middle slice of at most ``length`` chars (data_utils.py:154-171)."""
    if len(string) <= length:
        return string
    return string[
        max(0, (len(string) - length) // 2) : min(len(string), (len(string) + length) // 2)
    ]


def axtree_similarity(
    a: str, b: str, max_length: int = DEFAULT_MAX_LENGTH
) -> float:
    """SequenceMatcher ratio of the middle-truncated strings."""
    a = keep_middle(a or "", max_length)
    b = keep_middle(b or "", max_length)
    if a == b:
        # fast path; equal strings ratio to exactly 1.0 even under
        # autojunk (junk-extension + diagonal tie-break, see module
        # docstring — NOT "by definition")
        return 1.0
    return _Matcher(None, a, b).ratio()


def axtrees_differ(
    a: str,
    b: str,
    threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
    max_length: int = DEFAULT_MAX_LENGTH,
) -> bool:
    """True when the trees changed (ratio below threshold) — M2 semantics."""
    return axtree_similarity(a, b, max_length) < threshold


@pandas_udf(DoubleType())
def axtree_similarity_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched pairwise similarity (per-pair Python is inherent to the
    SequenceMatcher algorithm; the batch transfer is columnar)."""
    return pd.Series(
        [axtree_similarity(x, y) for x, y in zip(a, b)], dtype="float64"
    )
