"""DOM node-table operators: parse → explode → search/enrich (M5/M6/J8).

``dom_nodes`` runs the from-scratch parser (functions/dom.py) as ONE
Arrow-batched stage that returns each document's nodes as an array of
structs; the JVM ``explode`` turns them into the node table every
downstream op works on. Search (M6), ancestor walks and the bid→bbox
center-point enrichment (J8, ``executor_eval.py:288-330``
``fill_in_coordinates`` + ``dom_utils.py:293-326``) are then plain
filters/joins — no recursion, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODES_FIELD_DDL = (
    "array<struct<node_id:int,parent_id:int,depth:int,tag:string,"
    "attrs:map<string,string>,text:string,ancestor_ids:array<int>>>"
)


def dom_nodes(df: DataFrame, markup_col: str, id_cols: list[str]) -> DataFrame:
    """(id_cols..., markup) -> one row per DOM node (exploded node table)."""
    from ..functions.dom import parse_markup

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in id_cols
    ) + f", _nodes {NODES_FIELD_DDL}"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for node_list in pdf[markup_col].map(parse_markup):
                rows.append(
                    [
                        {
                            "node_id": n.node_id,
                            "parent_id": n.parent_id,
                            "depth": n.depth,
                            "tag": n.tag,
                            "attrs": n.attrs,
                            "text": n.text,
                            "ancestor_ids": n.ancestor_ids,
                        }
                        for n in node_list
                    ]
                )
            out = pdf[id_cols].copy()
            out["_nodes"] = rows
            yield out

    nested = df.select(*id_cols, markup_col).mapInPandas(parse, schema)
    return nested.select(*id_cols, F.explode("_nodes").alias("n")).select(
        *id_cols,
        "n.node_id",
        "n.parent_id",
        "n.depth",
        "n.tag",
        "n.attrs",
        "n.text",
        "n.ancestor_ids",
    )


def find_nodes_by_attribute(nodes: DataFrame, key: str, value_col) -> DataFrame:
    """M6 search as a filter: nodes whose attribute ``key`` equals the
    (column or literal) value — first-match semantics come from taking
    min(node_id) downstream if needed; DFS order is the node_id order."""
    return nodes.filter(F.col("attrs").getItem(key) == value_col)


def ancestors_of(nodes: DataFrame, targets: DataFrame, id_cols: list[str]) -> DataFrame:
    """Explode a target's ancestor path and join back to node rows — the
    relational form of find_node_by_attribute's ancestor collection
    (root last; ``ancestor_pos`` preserves that order)."""
    t = targets.select(
        *id_cols,
        F.col("node_id").alias("target_id"),
        F.posexplode("ancestor_ids").alias("ancestor_pos", "anc_id"),
    )
    return t.join(
        nodes.select(*id_cols, F.col("node_id").alias("anc_id"), "tag", "depth"),
        [*id_cols, "anc_id"],
    ).orderBy(*id_cols, "target_id", "ancestor_pos")


def fill_in_coordinates(
    actions: DataFrame, nodes: DataFrame, id_cols: list[str], bid_col: str = "bid"
) -> DataFrame:
    """J8 literal: look up each action's element by bid in the node table,
    fill the bbox center point (x + w/2, y + h/2) — fill_in_coordinates /
    _find_bbox_of_bid re-expressed as an equi-join."""
    boxes = nodes.filter(F.col("attrs").getItem("bid").isNotNull()).select(
        *id_cols,
        F.col("attrs").getItem("bid").alias(bid_col),
        F.col("attrs").getItem("x").cast("double").alias("x"),
        F.col("attrs").getItem("y").cast("double").alias("y"),
        F.col("attrs").getItem("w").cast("double").alias("w"),
        F.col("attrs").getItem("h").cast("double").alias("h"),
    )
    return actions.join(boxes, [*id_cols, bid_col], "left").withColumns(
        {
            "center_x": F.col("x") + F.col("w") / 2,
            "center_y": F.col("y") + F.col("h") / 2,
        }
    )
