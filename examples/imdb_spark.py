"""End-to-end demo: CSV → property graph, the Spark port of the
reference's shipped example (reference ``example/imdb.py:11-50``,
``example/oscar.py``, ``example/main.py``).

Flow (identical shape to the reference, Spark-first mechanics):
  * ``movies.csv`` → Movie nodes, Person nodes (actors ∪ directors,
    natural-key ``name``), ACTED_IN + DIRECTED edges. ACTED_IN's end
    is deliberately declared against ``Movie:title`` (a natural key,
    not the pk) so the J2 auto-map has real work: during ``parse()``
    the mapping engine joins titles to ids, rewrites the staged edges,
    and updates the catalog declaration to ``Movie:id``.
  * ``awards.csv`` → Award nodes (pk ``category``), AWARDED_FOR edges.
  * A ``Filter`` whitelists the loaded labels/edge types, and the OWL +
    SHACL callbacks emit schema documents, exactly like the reference's
    ``main.py``.
  * The graph lands in the ``SparkNativeGraphLoader`` (Parquet node/
    edge tables — swap in ``Neo4JLoader()`` against a live DB for the
    reference's sink).

The data under ``examples/data/`` is synthetic (fictional titles and
people, same schema as the reference's Kaggle CSVs).

Run:  python examples/imdb_spark.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import graph_etl_spark as getl  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
MOVIES_CSV = os.path.join(HERE, "data", "movies.csv")
AWARDS_CSV = os.path.join(HERE, "data", "awards.csv")


def register_parsers(spark) -> None:
    """Two parsers, mirroring the reference's imdb.py + oscar.py."""

    @getl.Parser(sources_path=[MOVIES_CSV], source="synthetic-imdb")
    def parse_movies(ctx: getl.Context) -> None:
        df = (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(MOVIES_CSV)
            .select("Rank", "Title", "Director", "Actors")
            .withColumn("Actors", F.split(F.col("Actors"), ", "))
            .withColumn("Actors", F.explode("Actors"))
            .withColumnRenamed("Rank", "id")
            .withColumnRenamed("Title", "title")
        )

        ctx.save_nodes(df.select("id", "title"), "Movie")
        ctx.save_nodes(
            df.select(F.col("Actors").alias("name")).unionByName(
                df.select(F.col("Director").alias("name"))
            ),
            "Person",
            primary_key="name",
        )
        # end declared against the natural key Movie:title — parse()'s
        # J2 auto-map resolves it to Movie:id (title → id join) and
        # rewrites the staged edge file + catalog declaration
        ctx.save_edges(
            df.select(F.col("Actors").alias("start"), F.col("title").alias("end")),
            "ACTED_IN",
            start_id="Person:name",
            end_id="Movie:title",
        )
        ctx.save_edges(
            df.select(F.col("Director").alias("start"), F.col("id").alias("end")),
            "DIRECTED",
            start_id="Person:name",
            end_id="Movie:id",
        )

    @getl.Parser(sources_path=[AWARDS_CSV], source="synthetic-awards")
    def parse_awards(ctx: getl.Context) -> None:
        df = (
            spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(AWARDS_CSV)
        )
        ctx.save_nodes(df.select("category"), "Award", primary_key="category")
        ctx.save_edges(
            df.select(F.col("name").alias("start"), F.col("category").alias("end")),
            "AWARDED_FOR",
            start_id="Person:name",
            end_id="Award:category",
        )


def main(workdir: str | None = None) -> dict[str, int]:
    workdir = workdir or os.path.join(HERE, "_output")
    shutil.rmtree(workdir, ignore_errors=True)

    spark = getl.get_spark("imdb-example")
    spark.sparkContext.setLogLevel("ERROR")

    # whitelist what reaches the sink + emit OWL/SHACL schema docs,
    # exactly like the reference's main.py
    filters = (
        getl.Filter()
        .add_node_label("Movie")
        .add_node_label("Person")
        .add_node_label("Award")
        .add_edge_type("ACTED_IN")
        .add_edge_type("AWARDED_FOR")
    )
    getl.init(
        spark,
        filters=[filters],
        callbacks=[getl.CallbackOWL(), getl.CallbackSHACL()],
        output_folder=os.path.join(workdir, "output"),
    )

    register_parsers(spark)
    getl.parse()  # stage + J2 natural-key auto-map

    loader = getl.SparkNativeGraphLoader(
        spark, graph_dir=os.path.join(workdir, "graph")
    )
    totals = getl.load(loader)
    print(f"loaded: {totals}")

    print("-- Movie sample --")
    loader.nodes("Movie").orderBy("id").show(3, truncate=False)
    print("-- ACTED_IN sample (end auto-mapped Movie:title → Movie:id) --")
    loader.edges("ACTED_IN").orderBy("end", "start").show(3, truncate=False)
    # the J2 auto-map must have rewritten the catalog declaration
    acted = getl.get_store()._configs["edges"]["ACTED_IN"]
    assert all(info["end"] == "Movie:id" for info in acted.values()), acted
    # DIRECTED is filtered OUT by the whitelist — same demonstration
    # the reference's Filter makes by omitting it
    assert not os.path.isdir(os.path.join(workdir, "graph", "edges", "DIRECTED"))
    return totals


if __name__ == "__main__":
    totals = main()
    assert totals["nodes"] > 0 and totals["edges"] > 0, totals
    print("example OK")
