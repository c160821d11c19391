"""Mirrors the reference's five parser tests 1:1
(reference graph_etl/tests/test_parser.py; fixtures in FIXTURES.md).

Same inputs, same assertions on catalog + staged output — against the
Spark engine.
"""

from __future__ import annotations

import graph_etl_spark as getl
from graph_etl_spark.catalog import get_store
from graph_etl_spark.context import Context


def _staged_node_rows(store, label):
    ctx = Context(store, {})
    cfg = store._configs["nodes"][label]
    rows = []
    for f in cfg["files"]:
        rows += [r.asDict() for r in ctx.read_staged("nodes", f).collect()]
    return rows


def _staged_edge_rows(store, edge_type):
    ctx = Context(store, {})
    rows = []
    for f in store._configs["edges"][edge_type]:
        rows += [r.asDict() for r in ctx.read_staged("edges", f).collect()]
    return rows


# F1: basic node set, inferred int key (reference test_parser.py:6-44)
def test_decorator(spark, output_dir):
    getl.init(spark, output_folder=output_dir)

    @getl.Parser(source="test", metadata1=15_000)
    def parse_persons(ctx):
        ctx.save_nodes(
            [{"id": 1, "name": "Tom"}, {"id": 2, "name": "Marie"}],
            label="Person",
            indexs=["name"],
        )

    getl.parse()
    store = get_store()
    cfg = store._configs["nodes"]["Person"]
    assert "Int" in cfg["properties_type"]["id"]
    assert cfg["constraints"] == ["id"]
    assert cfg["indexs"] == ["name"]
    (file_info,) = cfg["files"].values()
    assert file_info["count"] == 2
    assert file_info["metadatas"] == {"source": "test", "metadata1": 15_000}


# F2: dedup-by-key, string key (reference test_parser.py:46-81)
def test_with_keyword(spark, output_dir):
    getl.init(spark, output_folder=output_dir)
    with getl.Parser(source="test") as ctx:
        ctx.save_nodes(
            [
                {"id": "5", "name": "Andrew"},
                {"id": "8", "name": "Chloe"},
                {"id": "8", "name": "Donald"},
            ],
            label="Person",
        )
    store = get_store()
    cfg = store._configs["nodes"]["Person"]
    (file_info,) = cfg["files"].values()
    assert file_info["count"] == 2  # duplicate id dropped
    ids = sorted(r["id"] for r in _staged_node_rows(store, "Person"))
    assert ids == ["5", "8"]


# F3: explicit ID remap / J1 (reference test_parser.py:83-124)
def test_decorator_mapping(spark, output_dir):
    getl.init(spark, output_folder=output_dir)

    @getl.Parser(source="test_map")
    def parse_edges(ctx):
        ctx.save_edges(
            [
                {"start": 1, "end": "Tom"},
                {"start": 2, "end": "Marie"},
                {"start": 2, "end": "Chloe"},
            ],
            edge_type="DRIVED_BY",
            start_id="Car:id",
            end_id="Person:id",
        )
        ctx.map_ids(
            [
                {"old_value": 1, "new_value": "P821DS"},
                {"old_value": 2, "new_value": "F432OP"},
                {"old_value": 2, "new_value": "DUPLICATE_F432OP"},
            ],
            target="Car:id",
        )

    getl.parse()
    store = get_store()
    rows = _staged_edge_rows(store, "DRIVED_BY")
    by_end = {r["end"]: r for r in rows if r["end"] is not None}
    assert by_end["Tom"]["start"] == "P821DS"
    assert by_end["Tom"]["mapped_from"] == 1
    # duplicate mapping rows fan out and survive (start,end) dedup
    assert {r["start"] for r in rows if r.get("end") == "Marie"} == {
        "F432OP",
        "DUPLICATE_F432OP",
    }
    # catalog dtype of start flipped to string
    (info,) = store._configs["edges"]["DRIVED_BY"].values()
    assert "Utf8" in info["properties_type"]["start"]
    # pre-mapping count stays recorded (reference test_parser.py:122)
    assert info["count"] == 3


# F4: natural-key auto-map / J2 (reference test_parser.py:127-174)
def test_decorator_auto_mapping(spark, output_dir):
    getl.init(spark, output_folder=output_dir)

    @getl.Parser(source="test_autom")
    def parse_all(ctx):
        ctx.save_nodes(
            [
                {"id": 101, "name": "Tom"},
                {"id": 102, "name": "Marie"},
                {"id": 103, "name": "Chloe"},
            ],
            label="Person",
        )
        ctx.save_edges(
            [{"start": 1, "end": "Tom"}, {"start": 2, "end": "Marie"}],
            edge_type="DRIVED_BY",
            start_id="Car:id",
            end_id="Person:name",
        )

    getl.parse()
    store = get_store()
    rows = _staged_edge_rows(store, "DRIVED_BY")
    # names resolved to node ids; coalesce(new bigint, old string) promotes
    # to string — byte-identical to the reference's CSV staging, where
    # 101 and "101" are indistinguishable (SURVEY.md §7.4.3)
    ends = sorted(str(r["end"]) for r in rows if r["start"] is not None)
    assert ends == ["101", "102"]
    assert all("mapped_from" not in r for r in rows)  # J2 drops old values
    (info,) = store._configs["edges"]["DRIVED_BY"].values()
    assert info["end"] == "Person:id"  # catalog endpoint decl updated


# F5: metadata filter / P7 (reference test_parser.py:177-218)
def test_decorator_filter(spark, output_dir):
    flt = getl.Filter().add_metadata("source", "test2")
    getl.init(spark, filters=[flt], output_folder=output_dir)

    @getl.Parser(source="test")
    def parse_a(ctx):
        ctx.save_nodes([{"id": 1}, {"id": 2}], label="Person")

    @getl.Parser(source="test2")
    def parse_b(ctx):
        ctx.save_nodes([{"id": 8}, {"id": 4}], label="Person")

    getl.parse()
    store = get_store()
    files = store._configs["nodes"]["Person"]["files"]
    assert len(files) == 1  # only matching parser ran
    ids = sorted(r["id"] for r in _staged_node_rows(store, "Person"))
    assert ids == [4, 8]


# F8: array flatten + control-char strip (F1/F2 normalization)
def test_normalization_chain(spark, output_dir):
    getl.init(spark, output_folder=output_dir)
    with getl.Parser(source="test") as ctx:
        ctx.save_nodes(
            [
                {"id": "a\r\n1", "tags": ["x", "y"]},
                {"id": "b\\2", "tags": ["z"]},
            ],
            label="Tagged",
        )
    store = get_store()
    rows = {r["id"]: r for r in _staged_node_rows(store, "Tagged")}
    assert set(rows) == {"a1", "b2"}  # CR/LF/backslash stripped
    assert rows["a1"]["tags"] == "x|y"  # List[Utf8] flattened
    assert "List" in store._configs["nodes"]["Tagged"]["properties_type"]["tags"]
