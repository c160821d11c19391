"""End-to-end parity with the reference's example pipeline
(reference example/imdb.py + example/oscar.py; fixtures F6/F7).

Two parsers share the Person label (IMDB actors/directors + Oscar
awards); AWARDED_FOR edges are declared against Person:name and the
mapping engine resolves them cross-parser — the load-bearing behavior
of the reference example.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import graph_etl_spark as getl
from graph_etl_spark.catalog import get_store
from graph_etl_spark.context import Context
from graph_etl_spark.sources import read_csv

IMDB_CSV = """Rank,Title,Director,Actors,Year,Rating
1,Movie A,Dir One,"Act One, Act Two",2006,8.1
2,Movie B,Dir Two,"Act Two, Act Three",2012,7.0
3,Movie C,Dir One,"Act Four",2016,6.5
"""

OSCAR_CSV = """year_film,category,name,film,winner
2006,BEST PICTURE,Act One,Movie A,True
2012,BEST ACTOR,Act Three,Movie B,False
2012,BEST ACTOR,Act Two,Movie B,True
"""


def _write_csvs(tmp_path):
    imdb = tmp_path / "imdb.csv"
    oscar = tmp_path / "oscar.csv"
    imdb.write_text(IMDB_CSV)
    oscar.write_text(OSCAR_CSV)
    return str(imdb), str(oscar)


def test_imdb_oscar_flow(spark, output_dir, tmp_path):
    imdb_path, oscar_path = _write_csvs(tmp_path)
    getl.init(spark, output_folder=output_dir)

    @getl.Parser(source="imdb", sources_path=[imdb_path])
    def parse_imdb(ctx):
        movies = read_csv(spark, imdb_path)
        ctx.save_nodes(
            movies.selectExpr("Rank as id", "Title as title", "Year as year", "Rating as rating"),
            label="Movie",
        )
        actors = movies.select(
            F.explode(F.split("Actors", ", ")).alias("name")
        )
        directors = movies.select(F.col("Director").alias("name"))
        persons = actors.unionByName(directors).distinct()
        ctx.save_nodes(persons, label="Person", primary_key="name")
        acted = movies.select(
            F.explode(F.split("Actors", ", ")).alias("start"),
            F.col("Rank").alias("end"),
        )
        ctx.save_edges(acted, edge_type="ACTED_IN", start_id="Person:name", end_id="Movie:id")
        directed = movies.select(
            F.col("Director").alias("start"), F.col("Rank").alias("end")
        )
        ctx.save_edges(directed, edge_type="DIRECTED", start_id="Person:name", end_id="Movie:id")

    @getl.Parser(source="oscar", sources_path=[oscar_path])
    def parse_oscar(ctx):
        awards = read_csv(spark, oscar_path)
        ctx.save_nodes(
            awards.selectExpr("category", "year_film", "winner"),
            label="Award",
            primary_key="category",
        )
        awarded = awards.selectExpr("name as start", "category as end", "film", "winner")
        ctx.save_edges(awarded, edge_type="AWARDED_FOR", start_id="Person:name", end_id="Award:category")

    getl.parse()
    store = get_store()

    # dedup: Act Two appears in two movies + Dir One twice → Person unique by name
    person_files = store._configs["nodes"]["Person"]["files"]
    assert sum(f["count"] for f in person_files.values()) == 6
    # Award dedup by category: 3 rows → 2 categories
    award_files = store._configs["nodes"]["Award"]["files"]
    assert sum(f["count"] for f in award_files.values()) == 2

    # ACTED_IN endpoints auto-mapped Person:name → Person:name stays
    # (name IS the pk, no remap); AWARDED_FOR same. Movie ids stay ints.
    ctx = Context(store, {})
    acted = []
    for f in store._configs["edges"]["ACTED_IN"]:
        acted += ctx.read_staged("edges", f).collect()
    assert {(r["start"], r["end"]) for r in acted} == {
        ("Act One", 1), ("Act Two", 1), ("Act Two", 2), ("Act Three", 2), ("Act Four", 3),
    }

    # load into the native sink: match strategy keeps all edges since
    # every endpoint exists
    loader = getl.SparkNativeGraphLoader(
        spark, graph_dir=f"{output_dir}/graph", node_finding_strategy="match"
    )
    totals = getl.load(loader)
    assert totals["nodes"] == 6 + 3 + 2
    assert totals["edges"] == 5 + 3 + 3

    # graph query: who was awarded for a movie they acted in?
    awarded = loader.edges("AWARDED_FOR").select(
        F.col("start").alias("person"), "film", "winner"
    )
    acted_in = loader.edges("ACTED_IN").join(
        loader.nodes("Movie").selectExpr("id as end", "title"), "end"
    ).select(F.col("start").alias("person"), F.col("title").alias("film"))
    both = awarded.join(acted_in, ["person", "film"])
    assert {r["person"] for r in both.collect()} == {"Act One", "Act Two", "Act Three"}
