"""DOM node-table queries (M5/M6/J8 literal forms) under the oracle gate.

The markup is synthesized per row from table columns, so the DuckDB oracle
can state the expected node rows BY CONSTRUCTION while the Spark side must
actually parse the bytes (functions/dom.py tokenizer) — a differential test
of the parser, the explode lift, and the bid→bbox join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import register, t


def _order_markup(okey):
    k = okey.cast("string")
    return F.concat(
        F.lit('<html><body><div id="o'), k,
        F.lit('" class="row"><span>item '), k,
        F.lit('</span><a href="https://shop.example.com/item/'), k,
        F.lit('">buy</a></div></body></html>'),
    )


@register(
    "q55_dom_flatten",
    """
    WITH o AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 60),
    n(node_id, parent_id, depth, tag) AS (
        VALUES (0, -1, 0, 'html'), (1, 0, 1, 'body'), (2, 1, 2, 'div'),
               (3, 2, 3, 'span'), (4, 2, 3, 'a'))
    SELECT k AS o_orderkey, node_id, parent_id, depth, tag,
           CASE WHEN tag = 'span' THEN 'item ' || k
                WHEN tag = 'a' THEN 'buy' ELSE '' END AS text,
           CASE WHEN tag = 'div' THEN 'o' || k ELSE '' END AS attr_id,
           CASE WHEN tag = 'a'
                THEN 'https://shop.example.com/item/' || k ELSE '' END AS href
    FROM o CROSS JOIN n
    ORDER BY o_orderkey, node_id
    """,
)
def q55(spark, sf_dir):
    """M5 DOM flatten-to-table (dom_utils.py:138-250 re-expressed): the
    from-scratch tokenizer parses real markup bytes into DFS node rows;
    the oracle knows the rows by construction."""
    from ..operators.dom import dom_nodes

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 60)
    docs = o.select("o_orderkey", _order_markup(F.col("o_orderkey")).alias("markup"))
    nodes = dom_nodes(docs, "markup", ["o_orderkey"])
    return nodes.select(
        "o_orderkey",
        "node_id",
        "parent_id",
        "depth",
        "tag",
        "text",
        F.coalesce(F.col("attrs").getItem("id"), F.lit("")).alias("attr_id"),
        F.coalesce(F.col("attrs").getItem("href"), F.lit("")).alias("href"),
    ).orderBy("o_orderkey", "node_id")


@register(
    "q56_bid_bbox_centers",
    """
    SELECT event_id, 'b' || event_id AS bid,
           CAST(event_id AS DOUBLE) + (((user_id % 7) + 1)) / 2 AS center_x,
           CAST(user_id AS DOUBLE) + (((event_id % 3) + 2)) / 2 AS center_y
    FROM events WHERE event_id < 150 ORDER BY event_id
    """,
)
def q56(spark, sf_dir):
    """J8 literal (executor_eval.py:288-330 fill_in_coordinates +
    dom_utils.py:293-326 find_element_by_bid): actions join the node table
    on bid and fill the bbox center — through the REAL parser (bbox values
    ride as integer markup attributes)."""
    from ..operators.dom import dom_nodes, fill_in_coordinates

    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 150)
    e = F.col("event_id").cast("string")
    markup = F.concat(
        F.lit('<div bid="b'), e,
        F.lit('" x="'), F.col("event_id").cast("string"),
        F.lit('" y="'), F.col("user_id").cast("string"),
        F.lit('" w="'), ((F.col("user_id") % 7) + 1).cast("string"),
        F.lit('" h="'), ((F.col("event_id") % 3) + 2).cast("string"),
        F.lit('"><button>go</button></div>'),
    )
    docs = ev.select("event_id", markup.alias("markup"))
    nodes = dom_nodes(docs, "markup", ["event_id"])
    actions = ev.select("event_id", F.concat(F.lit("b"), e).alias("bid"))
    filled = fill_in_coordinates(actions, nodes, ["event_id"])
    return filled.select("event_id", "bid", "center_x", "center_y").orderBy("event_id")


@register(
    "q66_dom_predicate_rewards",
    """
    SELECT o_orderkey,
           CAST(o_orderkey % 5 AS INT) AS kind,
           CAST(CASE CAST(o_orderkey % 5 AS INT)
             WHEN 0 THEN CASE WHEN o_orderkey % 2 = 0 THEN 1.0 ELSE 0.0 END
             WHEN 1 THEN CASE WHEN o_custkey % 3 = 0 THEN 1.0 ELSE 0.0 END
             WHEN 2 THEN CASE WHEN o_custkey % 2 = 0 THEN 1.0 ELSE 0.0 END
             WHEN 3 THEN CASE WHEN o_orderkey % 2 = 0 THEN 1.0 ELSE 0.0 END
             ELSE CASE WHEN o_custkey % 5 = 0 THEN -1.0 ELSE 0.0 END
           END AS DOUBLE) AS reward
    FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
    """,
)
def q66(spark, sf_dir):
    """U1 js_matcher's declarative subset under the value-hash gate
    (evaluator.py:58-91 reward semantics via functions/dom_match.py): per
    row, markup AND an evaluate-script are synthesized from order columns,
    the Spark side must parse the markup, run the selector chain, and
    apply the JS comparison; the oracle knows every reward by
    construction. Five script kinds cycle: .value === (true/false by
    parity), getElementById().checked, querySelectorAll().length,
    classList.contains, and the failure modes (missing-node JS-throw ->
    0.0; out-of-subset script -> NULL, surfaced as the -1.0 marker so the
    boundary is value-checked too)."""
    from ..functions.dom_match import dom_reward_udf

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey").cast("string")
    vstr = ((F.col("o_orderkey") * 7) % 1000).cast("string")
    o = o.withColumn("_nli", (F.col("o_orderkey") % 4 + 1).cast("int"))
    cls = F.when(F.col("o_orderkey") % 2 == 0, "active").otherwise("idle")
    markup = F.concat(
        F.lit('<html><body><form><input id="f'), k,
        F.lit('" value="'), vstr,
        F.lit('"/><input id="c'), k, F.lit('" type="checkbox"'),
        F.when(F.col("o_custkey") % 3 == 0, ' checked="true"').otherwise(""),
        F.lit("/></form><ul>"),
        F.expr("repeat('<li>x</li>', _nli)"),
        F.lit('</ul><div id="panel" class="status '), cls,
        F.lit('">state: '), cls, F.lit("</div></body></html>"),
    )
    kind = (F.col("o_orderkey") % 5).cast("int")
    val_lit = F.when(
        F.col("o_orderkey") % 2 == 0, vstr
    ).otherwise(((F.col("o_orderkey") * 7) % 1000 + 1).cast("string"))
    len_lit = F.when(
        F.col("o_custkey") % 2 == 0, F.col("_nli")
    ).otherwise(F.col("_nli") + 1).cast("string")
    script = (
        F.when(kind == 0, F.concat(
            F.lit("document.querySelector('#f"), k,
            F.lit("').value === '"), val_lit, F.lit("'")))
        .when(kind == 1, F.concat(
            F.lit("document.getElementById('c"), k, F.lit("').checked")))
        .when(kind == 2, F.concat(
            F.lit("document.querySelectorAll('ul > li').length === "), len_lit))
        .when(kind == 3, F.lit(
            "document.querySelector('#panel').classList.contains('active')"))
        .otherwise(F.when(
            F.col("o_custkey") % 5 == 0, F.lit("window.scrollY === 0")
        ).otherwise(F.lit("document.querySelector('#missing').value === 'x'")))
    )
    return o.select(
        "o_orderkey",
        kind.alias("kind"),
        F.coalesce(
            dom_reward_udf(markup, script), F.lit(-1.0)
        ).alias("reward"),
    ).orderBy("o_orderkey")
