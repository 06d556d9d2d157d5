"""Declarative DOM-predicate matcher — the data-shaped subset of js_matcher.

The reference's ``js_matcher`` evaluator
(``/root/reference/src/orby/subtask_benchmark/evaluator/evaluator.py:58-91``)
executes an arbitrary JavaScript expression in a live Playwright page and
rewards 1.0 when it is truthy, 0.0 on falsy or ANY evaluation error. That
browser coupling is why SURVEY §7.5 scoped it out — but the actual script
corpus is overwhelmingly declarative: of the 1,311 js_matcher scripts in
``environments/benchmark.json``, ~97% are conjunctions/disjunctions of a
tiny atom grammar over element lookups (``document.querySelector`` /
``getElementById``, optionally chained element-scoped ``.querySelector``,
``.children[i]`` indexing, ``querySelectorAll(sel)[i]`` /
``Array.from(list)[i]`` element picks) with ``.value`` / ``.textContent``
/ ``.checked`` / ``.open`` / ``.min`` / ``.max`` / ``.getAttribute`` /
``.style.prop`` / ``.classList.contains`` reads, ``.includes``,
``querySelectorAll(...).length`` / ``.children.length``, null existence
checks, and ``Array.from(list).slice(a,b).every(v => atom)`` sweeps.

This module re-expresses exactly that subset over the ``parse_markup``
node rows (``functions/dom.py``), so replaying benchmark verdicts becomes
a DATA operation — no browser, no JS engine:

* ``parse_selector`` — CSS subset: ``#id``, ``tag``, ``.class``, compound
  ``tag.c1[a="v"]:nth-child(n)`` steps (attribute ops ``= *= ^= $= ~= |=``),
  descendant and child (``>``) combinators. (78% of corpus selectors are
  bare ``#id``.)
* ``parse_condition`` — the atom grammar above with JS precedence
  (``&&`` over ``||``, ``!`` on boolean atoms only — negating a
  comparison would silently diverge from JS's tighter ``!`` binding, so
  that raises) and ``.trim()``/``.toLowerCase()`` transforms. Scripts
  outside the subset raise ``UnsupportedScript`` — an explicit boundary,
  never a silent 0.
* ``dom_reward`` — reference reward semantics: truthy -> 1.0; falsy OR a
  JS-style evaluation error (property access on a missing node) -> 0.0.

Semantics notes (static-DOM approximations, pinned in
``tests/test_dom_match.py``): ``.value``/``.min``/``.max`` read the
like-named attribute ('' when absent, like a pristine input);
``.checked``/``.open`` are boolean-attribute presence; ``.textContent``/
``.innerText`` concatenate the subtree's text segments in true document
order (each segment carries a global sequence index from the parser;
whitespace-only segments are dropped); ``.style.fontStyle`` reads the
inline ``style`` attribute with camelCase->kebab-case key translation;
``el.querySelector(s)`` filters the document-wide match list to ``el``'s
subtree (the DOM-spec scoping); ``.children`` is the element-children
list in document order (our node table stores text separately, so all
rows are elements); an out-of-range index yields JS ``undefined`` — falsy
for existence, a throw (reward 0.0) for any property access. ``==``
applies JS-style numeric coercion between mismatched primitive types
(string/number/boolean); ``===`` requires matching types. Dynamic state a
live page would have (user edits, scroll positions, bounding rects —
never serialized into markup) is out of scope by construction. Markup
attributes must be double-quoted — ``parse_markup``'s tokenizer contract
(functions/dom.py:27), shared with the q55/q56 oracles.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

from .dom import Node, parse_markup


class UnsupportedScript(ValueError):
    """Script is outside the declarative js_matcher subset."""


class _EvalError(Exception):
    """JS-style runtime error (e.g. property access on null) -> reward 0."""


def _junescape(s: str) -> str:
    """Undo JS string escapes for the quote/backslash cases the corpus uses."""
    return re.sub(r"\\(.)", r"\1", s)


# --------------------------------------------------------------------------
# CSS selector subset
# --------------------------------------------------------------------------

@dataclass
class SimpleSelector:
    tag: str | None = None
    id_: str | None = None
    classes: list[str] = field(default_factory=list)
    attrs: list[tuple[str, str, str | None]] = field(default_factory=list)
    nth_child: int | None = None


_STEP_TOKEN_RE = re.compile(
    r"""
    (?P<id>\#[\w-]+)
  | (?P<cls>\.[\w-]+)
  | (?P<attr>\[\s*[\w-]+\s*(?:[*^$|~]?=\s*(?:"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*'))?\s*\])
  | (?P<nth>:nth-child\(\s*\d+\s*\))
    """,
    re.X,
)
_ATTR_BODY_RE = re.compile(
    r"""\[\s*(?P<k>[\w-]+)\s*
        (?:(?P<op>[*^$|~]?=)\s*(?P<q>["'])(?P<v>(?:\\.|(?!(?P=q)).)*)(?P=q))?
        \s*\]""",
    re.X | re.S,
)
_TAG_RE = re.compile(r"[a-zA-Z][\w-]*|\*")


def _parse_step(step: str) -> SimpleSelector:
    s = SimpleSelector()
    pos = 0
    m = _TAG_RE.match(step)
    if m:
        s.tag = None if m.group(0) == "*" else m.group(0).lower()
        pos = m.end()
    while pos < len(step):
        m = _STEP_TOKEN_RE.match(step, pos)
        if not m:
            raise UnsupportedScript(f"unsupported selector syntax: {step!r}")
        if m.group("id"):
            s.id_ = m.group("id")[1:]
        elif m.group("cls"):
            s.classes.append(m.group("cls")[1:])
        elif m.group("attr"):
            am = _ATTR_BODY_RE.fullmatch(m.group("attr"))
            if not am:
                raise UnsupportedScript(f"unsupported attribute selector: {step!r}")
            v = am.group("v")
            s.attrs.append(
                (am.group("k"), am.group("op") or "=", None if v is None else _junescape(v))
            )
        elif m.group("nth"):
            s.nth_child = int(re.search(r"\d+", m.group("nth")).group())
        pos = m.end()
    if s.tag is None and s.id_ is None and not s.classes and not s.attrs and s.nth_child is None:
        raise UnsupportedScript(f"empty selector step: {step!r}")
    return s


def parse_selector(sel: str) -> list[tuple[str, SimpleSelector]]:
    """Selector -> [(combinator, step)]; combinator ' ' (descendant) or '>'
    (child); the first step's combinator is ' '."""
    steps: list[tuple[str, SimpleSelector]] = []
    buf: list[str] = []
    comb = " "
    depth = 0
    quote: str | None = None

    def flush(next_comb: str) -> None:
        nonlocal comb
        if buf:
            steps.append((comb, _parse_step("".join(buf))))
            buf.clear()
            comb = next_comb
        else:
            # '>' after whitespace-flush: upgrade the pending combinator
            if next_comb == ">":
                comb = ">"

    for ch in sel.strip():
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"" and depth:
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch == ">":
            flush(">")
        elif depth == 0 and ch.isspace():
            flush(" ")
        else:
            buf.append(ch)
    flush(" ")
    if not steps:
        raise UnsupportedScript(f"empty selector: {sel!r}")
    return steps


def _attr_match(val: str | None, op: str, want: str) -> bool:
    if val is None:
        return False
    if op == "=":
        return val == want
    if op == "*=":
        return want in val
    if op == "^=":
        return val.startswith(want)
    if op == "$=":
        return val.endswith(want)
    if op == "~=":
        return want in val.split()
    if op == "|=":
        return val == want or val.startswith(want + "-")
    raise UnsupportedScript(f"unsupported attribute operator: {op!r}")


class _Doc:
    """Indexed node table for one document."""

    def __init__(self, nodes: list[Node]):
        self.nodes = nodes
        children: dict[int, list[Node]] = defaultdict(list)
        for n in nodes:
            children[n.parent_id].append(n)
        self._children = children
        # CSS :nth-child is 1-based position among element siblings
        self.nth = {
            n.node_id: i + 1
            for sibs in children.values()
            for i, n in enumerate(sibs)
        }

    def _matches(self, n: Node, s: SimpleSelector) -> bool:
        if s.tag is not None and n.tag != s.tag:
            return False
        if s.id_ is not None and n.attrs.get("id") != s.id_:
            return False
        if s.classes:
            have = set((n.attrs.get("class") or "").split())
            if not set(s.classes) <= have:
                return False
        for k, op, v in s.attrs:
            if v is None:
                if k not in n.attrs:
                    return False
            elif not _attr_match(n.attrs.get(k), op, v):
                return False
        if s.nth_child is not None and self.nth.get(n.node_id) != s.nth_child:
            return False
        return True

    def select_all(self, sel: str, within: Node | None = None) -> list[Node]:
        """Document-order matches; ``within`` scopes to a subtree (the
        el.querySelector DOM-spec semantics: evaluate document-wide, filter
        to descendants)."""
        steps = parse_selector(sel)
        cur = [n for n in self.nodes if self._matches(n, steps[0][1])]
        for comb, s in steps[1:]:
            cur_ids = {n.node_id for n in cur}
            if comb == ">":
                cur = [
                    n
                    for n in self.nodes
                    if n.parent_id in cur_ids and self._matches(n, s)
                ]
            else:
                cur = [
                    n
                    for n in self.nodes
                    if self._matches(n, s)
                    and not cur_ids.isdisjoint(n.ancestor_ids)
                ]
        if within is not None:
            cur = [n for n in cur if within.node_id in n.ancestor_ids]
        return cur  # self.nodes iteration preserves document order

    def children_of(self, node: Node) -> list[Node]:
        return self._children.get(node.node_id, [])

    def resolve(self, steps: list[tuple], var_node: Node | None = None) -> Node | None:
        """Walk an element-target step list to a node (or None == JS
        null/undefined). A chained lookup on a null is a JS throw; an
        out-of-range index is JS undefined (None here) — falsy, but any
        later step on it throws."""
        cur: Node | None = None
        lst: list[Node] | None = None
        for j, st in enumerate(steps):
            kind = st[0]
            if kind == "var":
                cur = var_node
            elif kind == "sel":
                if j > 0 and cur is None:
                    raise _EvalError("querySelector on null")
                found = self.select_all(st[1], within=cur if j else None)
                cur = found[0] if found else None
            elif kind == "qsa":
                lst = self.select_all(st[1])
                cur = None
            elif kind == "children":
                if cur is None:
                    raise _EvalError("children of null")
                lst = self.children_of(cur)
                cur = None
            elif kind == "idx":
                i = st[1]
                cur = lst[i] if lst is not None and 0 <= i < len(lst) else None
                lst = None
        return cur

    def resolve_list(self, steps: list[tuple], var_node: Node | None = None) -> list[Node]:
        """Walk a list-target step list (ends with 'qsa' or 'children')."""
        last = steps[-1][0]
        if last == "qsa":
            return self.select_all(steps[-1][1])
        node = self.resolve(steps[:-1], var_node)
        if node is None:
            raise _EvalError("children of null")
        return self.children_of(node)

    def text_content(self, node: Node) -> str:
        """Subtree text in TRUE document order: mixed content stores a
        parent's post-child segments after the child nodes exist, so we
        sort on the parser's global per-segment sequence index."""
        nid = node.node_id
        segs = [
            (sq, t)
            for n in self.nodes
            if n.node_id == nid or nid in n.ancestor_ids
            for sq, t in zip(n.text_seqs, n.texts)
        ]
        segs.sort()
        return "".join(t for _, t in segs)


# --------------------------------------------------------------------------
# JS condition subset
# --------------------------------------------------------------------------

_STR = r"(?P<q>['\"])(?P<s>(?:\\.|(?!(?P=q)).)*)(?P=q)"


def _str_arg(name: str) -> str:
    return _STR.replace("<q>", f"<q{name}>").replace("<s>", f"<{name}>").replace(
        "(?P=q)", f"(?P=q{name})"
    )


_QS_HEAD_RE = re.compile(
    r"^document\.(?:querySelector\(\s*" + _str_arg("sel")
    + r"\s*\)|getElementById\(\s*" + _str_arg("eid") + r"\s*\))"
)
_QS_CHAIN_RE = re.compile(r"^\.querySelector\(\s*" + _str_arg("sel") + r"\s*\)")
_QSA_RE = re.compile(r"^document\.querySelectorAll\(\s*" + _str_arg("sel") + r"\s*\)")
_IDX_RE = re.compile(r"^\s*\[\s*(?P<idx>\d+)\s*\]")
_CHILDREN_RE = re.compile(r"^\.children(?![\w])")
_SLICE_RE = re.compile(r"^\.slice\(\s*(?P<a>\d+)\s*,\s*(?P<b>\d+)\s*\)")
_ARROW_RE = re.compile(r"^\s*(?P<var>[A-Za-z_]\w*)\s*=>\s*(?P<body>.*)$", re.S)
_CMP_RE = re.compile(r"^\s*(?P<op>===|==|!==|!=)\s*")
_STR_LIT_RE = re.compile(r"^" + _STR + r"\s*$", re.S)
_NUM_LIT_RE = re.compile(r"^-?\d+(?:\.\d+)?\s*$")
_XFORM = r"(?P<xf>(?:\.(?:trim|toLowerCase)\(\))*)"
_PROP_RE = re.compile(
    r"^\.(?P<prop>value|textContent|innerText|checked|open|min|max)(?!\w)" + _XFORM
)
_GETATTR_RE = re.compile(
    r"^\.getAttribute\(\s*" + _str_arg("attr") + r"\s*\)" + _XFORM
)
_STYLE_RE = re.compile(r"^\.style\.(?P<sprop>\w+)")
_CLASSLIST_RE = re.compile(
    r"^\.classList\.contains\(\s*" + _str_arg("cls") + r"\s*\)\s*$", re.S
)
_INCLUDES_RE = re.compile(
    r"^\.includes\(\s*" + _str_arg("lit") + r"\s*\)\s*$", re.S
)
_LENGTH_RE = re.compile(r"^\.length\s*")

_BOOL_ATOMS = frozenset({"exists", "truthy", "classlist", "not"})


def _split_top(s: str, op: str) -> list[str]:
    """Split on a top-level JS operator, respecting quotes and parens."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    i = 0
    while i < len(s):
        ch = s[i]
        if quote:
            buf.append(ch)
            if ch == "\\":
                if i + 1 < len(s):
                    buf.append(s[i + 1])
                    i += 2
                    continue
            elif ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and s.startswith(op, i):
            parts.append("".join(buf))
            buf = []
            i += len(op)
            continue
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _take_paren(s: str, open_at: int) -> tuple[str, str]:
    """``s[open_at]`` must be '(' — return (inner, rest-after-close),
    respecting nesting and quotes."""
    if open_at >= len(s) or s[open_at] != "(":
        raise UnsupportedScript(f"expected '(': {s[:40]!r}")
    depth = 0
    quote: str | None = None
    i = open_at
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
            if depth == 0:
                return s[open_at + 1 : i], s[i + 1 :]
        i += 1
    raise UnsupportedScript(f"unbalanced parens: {s[:40]!r}")


def _parse_literal(s: str):
    s = s.strip()
    m = _STR_LIT_RE.match(s)
    if m:
        return ("str", _junescape(m.group("s")))
    if _NUM_LIT_RE.match(s):
        return ("num", float(s))
    if s == "true":
        return ("bool", True)
    if s == "false":
        return ("bool", False)
    if s == "null":
        return ("null", None)
    raise UnsupportedScript(f"unsupported literal: {s!r}")


def _is_list(steps: list[tuple]) -> bool:
    return steps[-1][0] in ("qsa", "children")


def _parse_postfix(steps: list[tuple], rest: str) -> tuple[list[tuple], str]:
    """Consume ``.querySelector(sel)`` / ``.children`` / ``.children[i]``
    postfix steps. Stops when the target is a LIST (qsa/children without
    an index) — only ``.length`` may follow, handled by the caller."""
    while True:
        if _is_list(steps):
            m = _IDX_RE.match(rest)
            if not m:
                break
            steps.append(("idx", int(m.group("idx"))))
            rest = rest[m.end():]
            continue
        m = _QS_CHAIN_RE.match(rest)
        if m:
            steps.append(("sel", _junescape(m.group("sel"))))
            rest = rest[m.end():]
            continue
        m = _CHILDREN_RE.match(rest)
        if m:
            steps.append(("children",))
            rest = rest[m.end():]
            continue
        break
    return steps, rest


def _parse_target(s: str, var: str | None = None) -> tuple[list[tuple], str]:
    """A lookup chain -> (step list, rest). Steps: ('sel', css) document /
    element-scoped querySelector; ('qsa', css); ('children',); ('idx', i);
    ('var',) the bound arrow variable. A list-typed result (last step
    qsa/children) is only valid under ``.length`` or an every() sweep."""
    s = s.lstrip()
    if var is not None:
        vm = re.match(rf"^{re.escape(var)}(?![\w])", s)
        if vm:
            return _parse_postfix([("var",)], s[vm.end():])
    if s.startswith("Array.from"):
        inner, rest = _take_paren(s, len("Array.from"))
        lsteps, lrest = _parse_target(inner, var)
        if lrest.strip() or not _is_list(lsteps):
            raise UnsupportedScript(f"unsupported Array.from argument: {inner[:40]!r}")
        return _parse_postfix(lsteps, rest)
    m = _QSA_RE.match(s)
    if m:
        return _parse_postfix([("qsa", _junescape(m.group("sel")))], s[m.end():])
    m = _QS_HEAD_RE.match(s)
    if not m:
        raise UnsupportedScript(f"not a querySelector atom: {s[:40]!r}")
    if m.group("eid") is not None:
        eid = _junescape(m.group("eid"))
        if not re.fullmatch(r"[\w-]+", eid):
            raise UnsupportedScript(f"unsupported getElementById id: {eid!r}")
        sel0 = "#" + eid
    else:
        sel0 = _junescape(m.group("sel"))
    return _parse_postfix([("sel", sel0)], s[m.end():])


def _parse_xforms(xf: str) -> tuple[str, ...]:
    return tuple(re.findall(r"trim|toLowerCase", xf or ""))


def _parse_access(rest: str) -> tuple[tuple, str] | None:
    """A property / getAttribute / style read -> (access AST, tail)."""
    for rx, kind in ((_PROP_RE, "prop"), (_GETATTR_RE, "attr"), (_STYLE_RE, "style")):
        pm = rx.match(rest)
        if not pm:
            continue
        if kind == "prop":
            return ("prop", pm.group("prop"), _parse_xforms(pm.group("xf"))), rest[pm.end():]
        if kind == "attr":
            return (
                ("attr", _junescape(pm.group("attr")), _parse_xforms(pm.group("xf"))),
                rest[pm.end():],
            )
        return ("style", pm.group("sprop"), ()), rest[pm.end():]
    return None


def _parse_rhs(rhs: str):
    """Comparison RHS: a literal, or another element-target property read
    (the ``el.value == el.min`` corpus shape) -> ('lit', lit) | ('read',
    steps, access)."""
    try:
        return ("lit", _parse_literal(rhs))
    except UnsupportedScript:
        pass
    steps, rest = _parse_target(rhs)
    if _is_list(steps):
        raise UnsupportedScript(f"unsupported comparison RHS: {rhs[:40]!r}")
    got = _parse_access(rest.strip())
    if got is None or got[1].strip():
        raise UnsupportedScript(f"unsupported comparison RHS: {rhs[:40]!r}")
    return ("read", steps, got[0])


def _parse_tail(steps: list[tuple], rest: str):
    """Everything after an element target -> atom AST."""
    rest_s = rest.strip()

    if not rest_s:
        return ("exists", steps, True)  # bare element truthiness
    cm = _CMP_RE.match(rest_s)
    if cm:
        try:
            if _parse_literal(rest_s[cm.end():])[0] == "null":
                wants_exist = cm.group("op") in ("!=", "!==")
                return ("exists", steps, wants_exist)
        except UnsupportedScript:
            pass

    clm = _CLASSLIST_RE.match(rest_s)
    if clm:
        return ("classlist", steps, _junescape(clm.group("cls")))

    got = _parse_access(rest_s)
    if got is not None:
        access, tail = got
        tail_s = tail.strip()
        if not tail_s:
            return ("truthy", steps, access)
        im = _INCLUDES_RE.match(tail_s)
        if im:
            return ("includes", steps, access, _junescape(im.group("lit")))
        cm = _CMP_RE.match(tail)
        if cm:
            rhs = _parse_rhs(tail[cm.end():])
            if rhs[0] == "lit":
                return ("cmp", steps, access, cm.group("op"), rhs[1])
            return ("cmp2", steps, access, cm.group("op"), rhs[1], rhs[2])
        raise UnsupportedScript(f"unsupported property use: {rest_s[:60]!r}")
    raise UnsupportedScript(f"unsupported expression tail: {rest_s[:60]!r}")


def _parse_atom(s: str, var: str | None = None):
    """One comparison/existence atom -> AST tuple. Raises UnsupportedScript."""
    s = s.strip()
    if s.startswith("(") and s.endswith(")"):
        inner = s[1:-1]
        if not _split_top(inner, "&&")[1:] and not _split_top(inner, "||")[1:]:
            return _parse_atom(inner, var)
    if s.startswith("!") and not s.startswith("!="):
        inner = _parse_atom(s[1:], var)
        if inner[0] not in _BOOL_ATOMS:
            # JS binds '!' tighter than any comparison: '!el.value === "x"'
            # is (!value) === "x", not !(value === "x") — supporting it
            # here would be a silent divergence, so it is a boundary.
            raise UnsupportedScript(f"'!' on a non-boolean atom: {s[:60]!r}")
        return ("not", inner)

    # Array.from(list).slice(a,b).every(v => atom) — the corpus's bulk
    # checkbox/selection sweeps; slice is optional.
    if s.startswith("Array.from"):
        inner, rest = _take_paren(s, len("Array.from"))
        lsteps, lrest = _parse_target(inner, var)
        if not lrest.strip() and _is_list(lsteps):
            rest_l = rest.lstrip()
            slc = None
            sm = _SLICE_RE.match(rest_l)
            if sm:
                slc = (int(sm.group("a")), int(sm.group("b")))
                rest_l = rest_l[sm.end():].lstrip()
            if rest_l.startswith(".every"):
                body, tail2 = _take_paren(rest_l, len(".every"))
                if tail2.strip():
                    raise UnsupportedScript(f"unsupported tail after every(): {tail2[:40]!r}")
                am = _ARROW_RE.match(body)
                if not am or am.group("body").lstrip().startswith("{"):
                    raise UnsupportedScript(f"unsupported every() body: {body[:60]!r}")
                pred = _parse_atom(am.group("body").strip(), var=am.group("var"))
                return ("every", lsteps, slc, pred)
            if slc is not None:
                raise UnsupportedScript(".slice() without .every()")
            # fall through: Array.from(list)[i]... is an element target

    steps, rest = _parse_target(s, var)
    if _is_list(steps):
        rest_s = rest.strip()
        lm = _LENGTH_RE.match(rest_s)
        if not lm:
            raise UnsupportedScript(f"unsupported list use: {s[:60]!r}")
        cm = _CMP_RE.match(rest_s[lm.end():])
        if not cm:
            raise UnsupportedScript(f"unsupported .length use: {s[:60]!r}")
        lit = _parse_literal(rest_s[lm.end() + cm.end():])
        if lit[0] != "num":
            raise UnsupportedScript(f".length compared to non-number: {s[:60]!r}")
        return ("list_length", steps, cm.group("op"), lit[1])
    return _parse_tail(steps, rest)


def parse_condition(script: str):
    """Full script -> AST: ('or', [('and', [atom, ...]), ...])."""
    script = script.strip().rstrip(";").strip()
    if not script:
        raise UnsupportedScript("empty script")
    ors = []
    for disjunct in _split_top(script, "||"):
        ands = [_parse_atom(a) for a in _split_top(disjunct, "&&")]
        ors.append(("and", ands))
    return ("or", ors)


def condition_supported(script: str) -> bool:
    try:
        parse_condition(script)
        return True
    except UnsupportedScript:
        return False


# --------------------------------------------------------------------------
# Evaluation
# --------------------------------------------------------------------------

_CAMEL_RE = re.compile(r"(?<!^)(?=[A-Z])")


def _style_dict(node: Node) -> dict[str, str]:
    out = {}
    for part in (node.attrs.get("style") or "").split(";"):
        k, _, v = part.partition(":")
        if k.strip():
            out[k.strip().lower()] = v.strip()
    return out


def _access(doc: _Doc, node: Node | None, access) -> object:
    if node is None:
        raise _EvalError("property access on null")
    kind, name, xforms = access
    if kind == "prop":
        if name in ("checked", "open"):
            return name in node.attrs
        if name in ("value", "min", "max"):
            val = node.attrs.get(name, "")
        else:  # textContent / innerText
            val = doc.text_content(node)
    elif kind == "attr":
        val = node.attrs.get(name)  # None == JS null
    else:  # style
        css_key = _CAMEL_RE.sub("-", name).lower()
        val = _style_dict(node).get(css_key, "")
    for t in xforms:
        if val is None:
            raise _EvalError(f".{t}() on null")
        val = val.strip() if t == "trim" else val.lower()
    return val


def _js_num(v: object) -> float | None:
    """JS ToNumber for our primitive set; None == NaN (never equal)."""
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v.strip() or "0")
        except ValueError:
            return None
    return None


def _type_tag(v: object) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    return "str"


def _compare_vals(a: object, op: str, b: object) -> bool:
    """JS ==/===/!=/!== between two evaluated primitives: strict needs
    matching types; loose coerces mismatched string/number/boolean via
    ToNumber (null loose-equals only null/undefined)."""
    ta, tb = _type_tag(a), _type_tag(b)
    if op in ("===", "!=="):
        eq = ta == tb and a == b
        return eq if op == "===" else not eq
    if ta == "null" or tb == "null":
        eq = ta == tb
    elif ta == tb:
        eq = a == b
    else:
        na, nb = _js_num(a), _js_num(b)
        eq = na is not None and nb is not None and na == nb
    return eq if op == "==" else not eq


def _compare(actual: object, op: str, lit: tuple) -> bool:
    kind, want = lit
    if op in ("===", "!=="):
        if kind == "num":
            eq = (
                isinstance(actual, (int, float))
                and not isinstance(actual, bool)
                and float(actual) == want
            )
        elif kind == "bool":
            eq = isinstance(actual, bool) and actual == want
        elif kind == "null":
            eq = actual is None
        else:
            eq = isinstance(actual, str) and actual == want
        return eq if op == "===" else not eq
    return _compare_vals(actual, op, want)


def _eval_atom(doc: _Doc, atom, var_node: Node | None = None) -> bool:
    tag = atom[0]
    if tag == "not":
        return not _eval_atom(doc, atom[1], var_node)
    if tag == "exists":
        _, steps, wants = atom
        return (doc.resolve(steps, var_node) is not None) == wants
    if tag == "list_length":
        _, steps, op, want = atom
        return _compare(float(len(doc.resolve_list(steps, var_node))), op, ("num", want))
    if tag == "every":
        _, lsteps, slc, pred = atom
        els = doc.resolve_list(lsteps, var_node)
        if slc is not None:
            els = els[slc[0] : slc[1]]
        return all(_eval_atom(doc, pred, var_node=el) for el in els)
    if tag == "truthy":
        _, steps, access = atom
        return bool(_access(doc, doc.resolve(steps, var_node), access))
    if tag == "classlist":
        _, steps, cls = atom
        node = doc.resolve(steps, var_node)
        if node is None:
            raise _EvalError("classList of null")
        return cls in (node.attrs.get("class") or "").split()
    if tag == "includes":
        _, steps, access, lit = atom
        val = _access(doc, doc.resolve(steps, var_node), access)
        if not isinstance(val, str):
            raise _EvalError("includes on non-string")
        return lit in val
    if tag == "cmp":
        _, steps, access, op, lit = atom
        return _compare(_access(doc, doc.resolve(steps, var_node), access), op, lit)
    if tag == "cmp2":
        _, steps, access, op, rsteps, racc = atom
        a = _access(doc, doc.resolve(steps, var_node), access)
        b = _access(doc, doc.resolve(rsteps, var_node), racc)
        return _compare_vals(a, op, b)
    raise UnsupportedScript(f"unknown atom: {atom!r}")


def evaluate_condition(nodes: list[Node], script: str) -> bool:
    """True/False for a parsed-subset script over node rows. Raises
    UnsupportedScript (outside the subset) or _EvalError (JS would throw)."""
    doc = _Doc(nodes)
    _, ors = parse_condition(script)
    for _, ands in ors:
        if all(_eval_atom(doc, a) for a in ands):
            return True
    return False


def dom_reward(markup: str, script: str) -> float:
    """Reference js_matcher reward semantics over a markup string: 1.0 when
    the condition is truthy, 0.0 when falsy OR when evaluation raises the
    way JS would (missing node). UnsupportedScript still raises — an
    explicit boundary is not a failed task."""
    try:
        return 1.0 if evaluate_condition(parse_markup(markup), script) else 0.0
    except _EvalError:
        return 0.0


# --------------------------------------------------------------------------
# Spark-side (Arrow-vectorized)
# --------------------------------------------------------------------------

def _dom_reward_batch(markups, scripts):
    import pandas as pd

    out = []
    for markup, script in zip(markups, scripts):
        if markup is None or script is None:
            out.append(None)
            continue
        try:
            out.append(dom_reward(markup, script))
        except UnsupportedScript:
            out.append(None)  # boundary, not a failed task: null, not 0.0
    return pd.Series(out, dtype="float64")


def make_dom_reward_udf():
    """Arrow-batched (markup, script) -> reward UDF; unsupported scripts
    yield NULL so data-scale callers can quantify the boundary instead of
    mistaking it for task failure."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    return pandas_udf(_dom_reward_batch, DoubleType())


dom_reward_udf = make_dom_reward_udf()
