"""dom_matcher — the declarative js_matcher subset (evaluator.py:58-91).

The case table mirrors the real shapes in the reference's
environments/benchmark.json evaluate_scripts corpus (selector-exists,
.value/.textContent/.getAttribute/.style comparisons, .checked,
.includes, querySelectorAll().length, && chains, :nth-child paths).
"""

import pytest

from warc_bench_spark.functions.dom_match import (
    UnsupportedScript,
    condition_supported,
    dom_reward,
    parse_selector,
)

MARKUP = """
<html><body>
  <div id="app">
    <a href="#/base/willow">Willow</a>
    <div class="demo-status">x changed: 40</div>
    <auro-datepicker calendarfocusdate="03/21/2025" valueend="04/21/2025"></auro-datepicker>
    <form>
      <input id="submissionDate" type="text" value="2024-03-15"/>
      <input id="project-budget" value="50000"/>
      <input id="intern" type="checkbox" checked="true"/>
      <input id="former" type="checkbox"/>
    </form>
    <div data-row="6" data-col="B" style="font-weight: bold; font-style: italic">cell</div>
    <div id="dropdown">
      <div>first</div>
      <div>second</div>
      <div><div><span class="inputNumber special">42</span></div><div>x</div></div>
    </div>
    <ul id="cart"><li>a</li><li>b</li><li>c</li></ul>
    <p class="note">The total is 50000 dollars</p>
    <div id="column"><div data-portlet-type="reminders" class="portlet selected">r</div><div data-portlet-type="kpimeter" class="portlet selected">k</div><div data-portlet-type="news" class="portlet">n</div></div>
    <input id="slider" value="0" min="0" max="100"/>
    <details id="opened" open="true"><p>body</p></details>
    <div id="mixed">alpha<span>beta</span>gamma</div>
  </div>
</body></html>
"""

CASES = [
    # selector existence (the q1 shape in the corpus)
    ("""document.querySelector('a[href="#/base/willow"]') != null""", 1.0),
    ("""document.querySelector('a[href="#/base/missing"]') != null""", 0.0),
    ("""document.querySelector('#nope') == null""", 1.0),
    # textContent equality
    ("""document.querySelector('div[class="demo-status"]').textContent == 'x changed: 40'""", 1.0),
    ("""document.querySelector('div[class="demo-status"]').textContent == 'x changed: 41'""", 0.0),
    # getAttribute with && conjunction (auro-datepicker shape)
    ("""document.querySelector('auro-datepicker').getAttribute("calendarfocusdate")=="03/21/2025" && document.querySelector('auro-datepicker').getAttribute("valueend")=="04/21/2025\"""", 1.0),
    ("""document.querySelector('auro-datepicker').getAttribute("calendarfocusdate")=="03/22/2025" && document.querySelector('auro-datepicker').getAttribute("valueend")=="04/21/2025\"""", 0.0),
    # .value strict equality (the dominant corpus shape)
    ("document.querySelector('#submissionDate').value === '2024-03-15'", 1.0),
    ("document.querySelector('#submissionDate').value === '2024-03-16'", 0.0),
    ("document.querySelector('#project-budget').value === '50000'", 1.0),
    # loose numeric coercion vs strict type mismatch
    ("document.querySelector('#project-budget').value == 50000", 1.0),
    ("document.querySelector('#project-budget').value === 50000", 0.0),
    # checkbox truthiness
    ("document.querySelector('#intern').checked", 1.0),
    ("document.querySelector('#former').checked", 0.0),
    # inline style with camelCase property
    ("""document.querySelector('[data-row="6"][data-col="B"]').style.fontStyle === 'italic'""", 1.0),
    ("""document.querySelector('[data-row="6"][data-col="B"]').style.fontStyle === 'normal'""", 0.0),
    # includes
    ("document.querySelector('p.note').textContent.includes('total is 50000')", 1.0),
    ("document.querySelector('p.note').textContent.includes('grand total')", 0.0),
    # querySelectorAll().length
    ("document.querySelectorAll('#cart > li').length === 3", 1.0),
    ("document.querySelectorAll('#cart > li').length === 2", 0.0),
    # child-combinator + :nth-child path (the deep-selector corpus shape)
    ("document.querySelector('#dropdown > div:nth-child(3) > div:nth-child(1) > span.inputNumber').textContent == '42'", 1.0),
    ("document.querySelector('#dropdown > div:nth-child(2) > div:nth-child(1) > span.inputNumber') != null", 0.0),
    # descendant combinator
    ("document.querySelector('#app span.special') != null", 1.0),
    # || disjunction, JS precedence
    ("document.querySelector('#nope') != null || document.querySelector('#intern').checked", 1.0),
    # property access on a missing node = JS throw = reward 0 (reference
    # try/except semantics, evaluator.py:80-89)
    ("document.querySelector('#missing').value === 'x'", 0.0),
    # negation
    ("!document.querySelector('#former').checked", 1.0),
    # trim()
    ("document.querySelector('p.note').textContent.trim() === 'The total is 50000 dollars'", 1.0),
    # getElementById alias (the corpus's second-most-common lookup)
    ("document.getElementById('submissionDate').value === '2024-03-15'", 1.0),
    # classList.contains
    ("document.querySelector('#dropdown span').classList.contains('special')", 1.0),
    ("document.querySelector('#dropdown span').classList.contains('missing')", 0.0),
    # chained element-scoped querySelector (kanban-column corpus shape)
    ("document.querySelector('#dropdown').querySelector('span.inputNumber') != null", 1.0),
    ("document.querySelector('#cart').querySelector('span.inputNumber') != null", 0.0),
    # attribute substring operator (th[onclick*=...] corpus shape)
    ("""document.querySelector('a[href*="willow"]') != null""", 1.0),
    ("""document.querySelector('a[href^="#/base"]') != null""", 1.0),
    ("""document.querySelector('a[href$="/nope"]') != null""", 0.0),
    # toLowerCase transform
    ("document.querySelector('#dropdown > div:nth-child(1)').textContent.toLowerCase() === 'first'", 1.0),
    # .children[i] indexing + .children.length (dashboard-column corpus shape)
    ("document.querySelector('#column').children.length == 3", 1.0),
    ("document.querySelector('#column').children.length === 2", 0.0),
    ("""document.querySelector('div[id="column"]').children[1].getAttribute('data-portlet-type')=='kpimeter'""", 1.0),
    ("""document.querySelector('div[id="column"]').children[0].getAttribute('data-portlet-type')=='kpimeter'""", 0.0),
    # out-of-range index: JS undefined -> property access throws -> 0.0
    ("document.querySelector('#column').children[9].getAttribute('data-portlet-type')=='x'", 0.0),
    # Array.from(...)[i] element pick (employeeList corpus shape), incl. the
    # bare-index truthiness conjunct
    ("Array.from(document.getElementById('column').children)[1] && Array.from(document.getElementById('column').children)[1].classList.contains('selected')", 1.0),
    ("Array.from(document.getElementById('column').children)[2].classList.contains('selected')", 0.0),
    ("Array.from(document.getElementById('column').children)[9] && Array.from(document.getElementById('column').children)[9].classList.contains('selected')", 0.0),
    # querySelectorAll(sel)[i] direct indexing (nah-status-filter shape)
    ("""document.querySelectorAll('#column > div')[0].getAttribute('data-portlet-type')=="reminders\"""", 1.0),
    # Array.from(list).slice(a,b).every(v => atom) sweeps (row-checkbox shape)
    ("Array.from(document.querySelectorAll('#column .portlet')).slice(0,2).every(item => item.classList.contains('selected'))", 1.0),
    ("Array.from(document.querySelectorAll('#column .portlet')).slice(0,3).every(item => item.classList.contains('selected'))", 0.0),
    ("Array.from(document.querySelectorAll('input.row-checkbox')).slice(0,3).every(checkbox => checkbox.checked === true)", 1.0),  # vacuous truth, JS every([]) semantics
    # target-vs-target comparison via .min/.max (slider corpus shape)
    ("document.querySelector('#slider').value ==document.querySelector('#slider').min", 1.0),
    ("document.querySelector('#slider').value ==document.querySelector('#slider').max", 0.0),
    # .open boolean attribute (details corpus shape)
    ("document.querySelector('#opened').open", 1.0),
    ("document.querySelector('#cart').open", 0.0),
    # loose == between string actual and bool literal: JS ToNumber coercion
    # ('1' == true is true, '' == false is true, 'x' == false is false)
    ("document.querySelector('#former').getAttribute('type') == true", 0.0),
    ("document.querySelector('#slider').value == false", 1.0),  # '0' == false
    # mixed content: textContent is TRUE document order (abc, never acb)
    ("document.querySelector('#mixed').textContent === 'alphabetagamma'", 1.0),
    ("document.querySelector('#mixed').textContent === 'alphagammabeta'", 0.0),
]


@pytest.mark.parametrize("script,want", CASES)
def test_dom_reward_cases(script, want):
    assert dom_reward(MARKUP, script) == want


def test_unsupported_scripts_raise_not_zero():
    """Dynamic/out-of-subset scripts are an explicit boundary, not a failed
    task: dom_reward raises, never silently returns 0."""
    for script in [
        "window.location.href === 'https://x.com'",
        "document.querySelector('#a').dispatchEvent(new Event('click'))",
        "document.title === 'Home'",
        "document.querySelector('#a').value.length > 3",
        # '!' binds tighter than '===' in JS: supporting '!cmp' as !(cmp)
        # would silently diverge, so it is an explicit boundary
        "!document.querySelector('#a').value === 'x'",
        "!document.querySelector('#a').textContent.includes('y')",
        # dynamic layout state never serialized into markup
        "document.querySelector('#a').scrollTop > 0",
        # .slice without .every has no declarative meaning here
        "Array.from(document.querySelectorAll('li')).slice(0,2)",
    ]:
        assert not condition_supported(script)
        with pytest.raises(UnsupportedScript):
            dom_reward(MARKUP, script)


def test_selector_parse_shapes():
    steps = parse_selector('#dropdown > div:nth-child(3) span.inputNumber[data-x="1"]')
    assert [c for c, _ in steps] == [" ", ">", " "]
    assert steps[1][1].nth_child == 3
    assert steps[2][1].classes == ["inputNumber"] and steps[2][1].attrs == [("data-x", "=", "1")]
    with pytest.raises(UnsupportedScript):
        parse_selector("div:hover")


def test_corpus_parse_coverage():
    """Gated evidence run: when the reference corpus is present, the
    declarative parser must cover >= 97% of the real js_matcher scripts
    (measured 97.6% after the r6 .children[i]/Array.from/every/min-max
    lifts; the remainder is genuinely procedural or browser-coupled —
    scrollTop/getBoundingClientRect, shadowRoot, innerHTML/getHTML
    serialization, generator Array.from, and malformed-JS scripts)."""
    import json
    import os

    path = "/root/reference/src/orby/subtask_benchmark/environments/benchmark.json"
    if not os.path.exists(path):
        pytest.skip("reference corpus not present")
    with open(path) as f:
        data = json.load(f)

    scripts = []

    def walk(o):
        if isinstance(o, dict):
            if o.get("eval_type") == "js_matcher":
                for s in o.get("evaluate_scripts", []):
                    scripts.append(s["script"])
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(data)
    assert len(scripts) > 1000
    ok = sum(condition_supported(s) for s in scripts)
    assert ok / len(scripts) >= 0.97, f"coverage {ok}/{len(scripts)}"


def test_dom_matcher_udf(spark):
    """MATCHERS['dom'] over columns: reward parity with the Python path,
    NULL for out-of-subset scripts."""
    from warc_bench_spark.functions.matchers import MATCHERS

    rows = [
        (MARKUP, "document.querySelector('#intern').checked"),
        (MARKUP, "document.querySelector('#former').checked"),
        (MARKUP, "window.close()"),
    ]
    df = spark.createDataFrame(rows, "markup string, script string")
    got = [
        r["ok"]
        for r in df.select(
            MATCHERS["dom"](df["script"], df["markup"]).alias("ok")
        ).collect()
    ]
    assert got == [True, False, None]
