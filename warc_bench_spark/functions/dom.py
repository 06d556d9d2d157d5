"""DOM flatten + tree search, re-expressed as a node TABLE (M5/M6, J8).

The reference walks an Element proto tree: ``html_to_string`` DFS-flattens
it to an indented string with semantic-attribute filtering
(``/root/reference/src/orby/digitalagent/utils/dom_utils.py:138-250``),
``find_node_by_attribute`` / ``find_element_by_bid`` search it recursively
collecting ancestors (``:65-93, 293-326``), and
``make_id_bbox_map_from_element_proto`` builds the id→bbox map that
``fill_in_coordinates`` joins against (``:269-291``).

The Spark-first form (SURVEY §2 M6's own prescription) replaces tree
recursion with ONE explode: ``parse_markup`` is a from-scratch tolerant
tag tokenizer that turns a markup string into node ROWS — DFS-preorder
``node_id``, ``parent_id``, ``depth``, ``tag``, attribute map, direct text,
and the full ``ancestor_ids`` path (root last, the reference's ancestor
order) — so search, ancestor walks and the bid→bbox enrichment all become
filters and equi-joins Catalyst can plan. The parser is the only Python,
Arrow-batched; everything downstream is JVM-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOKEN_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\s+[^<>]*?)?)(/?)>", re.S)
_ATTR_RE = re.compile(r'([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*"([^"]*)"')

VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link"})

# the reference's semantic-attribute whitelist shape (_get_semantic_attributes)
SEMANTIC_ATTRS = ("id", "class", "name", "type", "value", "href", "bid", "aria-label")


@dataclass
class Node:
    node_id: int
    parent_id: int
    depth: int
    tag: str
    attrs: dict[str, str]
    texts: list[str] = field(default_factory=list)
    ancestor_ids: list[int] = field(default_factory=list)
    # global document-order index of each segment in ``texts`` — mixed
    # content like <div>a<span>b</span>c</div> stores 'a','c' on the div
    # AFTER the span exists, so node-local order alone cannot reconstruct
    # DOM textContent order ('abc' not 'acb'); sort on these instead.
    text_seqs: list[int] = field(default_factory=list)

    @property
    def text(self) -> str:
        return " ".join(t for t in (s.strip() for s in self.texts) if t)


def parse_markup(markup: str) -> list[Node]:
    """Tolerant from-scratch parse of a markup string into DFS node rows.

    Unclosed tags are closed implicitly when an enclosing tag closes (or at
    EOF); stray close tags pop to the nearest matching open tag and are
    otherwise ignored — the forgiving behavior a crawler needs.
    """
    nodes: list[Node] = []
    stack: list[Node] = []
    pos = 0
    seq = 0
    for m in _TOKEN_RE.finditer(markup or ""):
        text = markup[pos : m.start()]
        if text.strip() and stack:
            stack[-1].texts.append(text)
            stack[-1].text_seqs.append(seq)
            seq += 1
        pos = m.end()
        closing, tag, attr_str, self_close = m.groups()
        tag = tag.lower()
        if closing:
            for i in range(len(stack) - 1, -1, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        parent = stack[-1] if stack else None
        node = Node(
            node_id=len(nodes),
            parent_id=parent.node_id if parent else -1,
            depth=len(stack),
            tag=tag,
            attrs=dict(_ATTR_RE.findall(attr_str or "")),
            ancestor_ids=[n.node_id for n in reversed(stack)],  # root LAST
        )
        nodes.append(node)
        if not self_close and tag not in VOID_TAGS:
            stack.append(node)
    if pos < len(markup or "") and stack:
        tail = markup[pos:]
        if tail.strip():
            stack[-1].texts.append(tail)
            stack[-1].text_seqs.append(seq)
    return nodes


def semantic_attributes(attrs: dict[str, str]) -> dict[str, str]:
    """The whitelist filter of _get_semantic_attributes (dom_utils.py)."""
    return {k: v for k, v in attrs.items() if k in SEMANTIC_ATTRS and v}


def flatten_to_string(
    nodes: list[Node],
    indent_character: str = "\t",
    keep_all_attributes: bool = False,
) -> str:
    """Indented flat string of the node rows — the html_to_string shape
    (opening tags with filtered attributes, direct text lines, DFS order)."""
    lines: list[str] = []
    for n in nodes:
        attrs = dict(n.attrs) if keep_all_attributes else semantic_attributes(n.attrs)
        formatted = "".join(f' {k}="{v}"' for k, v in sorted(attrs.items()))
        lines.append(f"{indent_character * n.depth}<{n.tag}{formatted}>")
        if n.text:
            lines.append(f"{indent_character * (n.depth + 1)}{n.text}")
    return "\n".join(lines)


def find_by_attribute(nodes: list[Node], key: str, value: str) -> Node | None:
    """First DFS node whose attribute matches — find_node_by_attribute
    semantics (strip() on the stored value, first match wins)."""
    for n in nodes:
        if n.attrs.get(key, "").strip() == value:
            return n
    return None


def id_bbox_map(nodes: list[Node]) -> dict[int, tuple[float, float, float, float]]:
    """node_id -> (x, y, w, h) from bbox attributes, when present —
    make_id_bbox_map_from_element_proto over the row form."""
    out = {}
    for n in nodes:
        if all(k in n.attrs for k in ("x", "y", "w", "h")):
            out[n.node_id] = tuple(float(n.attrs[k]) for k in ("x", "y", "w", "h"))
    return out
