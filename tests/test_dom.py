"""DOM node-table operators (M5/M6/J8): from-scratch parser, flatten,
search, ancestors, bid→bbox enrichment."""

from pyspark.sql import functions as F

from warc_bench_spark.functions.dom import (
    find_by_attribute,
    flatten_to_string,
    id_bbox_map,
    parse_markup,
    semantic_attributes,
)

MARKUP = (
    '<html><body><div id="main" class="row" data-junk="zz">'
    "<span>hello <b>world</b></span>"
    '<a href="https://x/1" bid="b1" x="10" y="20" w="4" h="6">link</a>'
    "<br><img src_ignored>"
    "</div></body></html>"
)


def test_parse_markup_structure():
    nodes = parse_markup(MARKUP)
    by_tag = {n.tag: n for n in nodes}
    assert [n.node_id for n in nodes] == list(range(len(nodes)))
    assert by_tag["html"].parent_id == -1 and by_tag["html"].depth == 0
    assert by_tag["div"].parent_id == by_tag["body"].node_id
    assert by_tag["b"].parent_id == by_tag["span"].node_id
    # direct text only; nested <b> text belongs to <b>
    assert by_tag["span"].text == "hello"
    assert by_tag["b"].text == "world"
    assert by_tag["a"].text == "link"
    # ancestor path: root LAST (reference's ancestors.append order)
    assert by_tag["b"].ancestor_ids == [
        by_tag["span"].node_id,
        by_tag["div"].node_id,
        by_tag["body"].node_id,
        by_tag["html"].node_id,
    ]
    # void tags don't capture children
    assert by_tag["br"].depth == by_tag["a"].depth


def test_parse_markup_tolerates_malformed():
    nodes = parse_markup("<div><p>one<p>two</div>tail<span>s</span>")
    tags = [n.tag for n in nodes]
    assert tags == ["div", "p", "p", "span"]
    # unclosed <p>s: second <p> nests under first (no implicit sibling close,
    # documented tolerant behavior); </div> pops everything
    assert nodes[2].parent_id == nodes[1].node_id
    assert nodes[3].parent_id == -1  # after </div>, span is a root
    assert parse_markup("") == [] and parse_markup("just text") == []


def test_semantic_attribute_filter_and_flatten():
    nodes = parse_markup(MARKUP)
    div = next(n for n in nodes if n.tag == "div")
    assert semantic_attributes(div.attrs) == {"id": "main", "class": "row"}
    s = flatten_to_string(nodes)
    lines = s.splitlines()
    assert lines[0] == "<html>"
    assert "\t\t<div" in s and 'data-junk' not in s
    assert "\t\t\t\thello" in s  # text indented one past its element


def test_find_and_bbox_map():
    nodes = parse_markup(MARKUP)
    hit = find_by_attribute(nodes, "bid", "b1")
    assert hit is not None and hit.tag == "a"
    assert find_by_attribute(nodes, "bid", "nope") is None
    boxes = id_bbox_map(nodes)
    assert boxes == {hit.node_id: (10.0, 20.0, 4.0, 6.0)}


def test_dom_nodes_and_enrichment_spark(spark):
    from warc_bench_spark.operators.dom import (
        ancestors_of,
        dom_nodes,
        fill_in_coordinates,
        find_nodes_by_attribute,
    )

    docs = spark.createDataFrame(
        [(1, MARKUP), (2, '<div bid="b2" x="0" y="0" w="2" h="8"><i>t</i></div>')],
        "doc_id long, markup string",
    )
    nodes = dom_nodes(docs, "markup", ["doc_id"])
    assert nodes.filter("doc_id = 1").count() == len(parse_markup(MARKUP))

    # M6 search — first match in DFS order
    hits = find_nodes_by_attribute(nodes, "bid", F.lit("b1")).collect()
    assert len(hits) == 1 and hits[0]["tag"] == "a"

    # ancestors: root last, by position
    targets = find_nodes_by_attribute(nodes, "bid", F.lit("b1"))
    anc = ancestors_of(nodes, targets, ["doc_id"]).collect()
    assert [a["tag"] for a in anc] == ["div", "body", "html"]

    # J8: bid -> bbox center
    actions = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "missing")], "doc_id long, bid string"
    )
    filled = {
        (r["doc_id"], r["bid"]): (r["center_x"], r["center_y"])
        for r in fill_in_coordinates(actions, nodes, ["doc_id"]).collect()
    }
    assert filled[(1, "b1")] == (12.0, 23.0)
    assert filled[(2, "b2")] == (1.0, 4.0)
    assert filled[(2, "missing")] == (None, None)
