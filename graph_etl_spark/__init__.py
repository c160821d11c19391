"""graph_etl_spark — PySpark-native property-graph ETL engine.

Brand-new implementation of the capabilities of juju21555/graph-etl
(reference surveyed in SURVEY.md), re-expressed Spark-first: DataFrame
data plane, Parquet staging, Catalyst-optimized mapping joins — plus
the large-scale data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing) under ``operators/``.

Public API mirrors the reference (graph_etl/__init__.py:1-6):
``Parser, parse, load, init, clear, Context, Filter, Neo4JLoader,
TigerGraphLoader, CallbackOWL, CallbackSHACL`` — with the additions
``SparkNativeGraphLoader`` and ``get_spark``.
"""

from .callbacks import Callback, CallbackOWL, CallbackSHACL
from .catalog import CatalogStore, get_store
from .context import Context
from .filters import Filter
from .loaders.base import Loader
from .loaders.neo4j import Neo4JLoader
from .loaders.spark_native import SparkNativeGraphLoader
from .loaders.tigergraph import TigerGraphLoader
from .parser import Parser
from .pipeline import clear, init, load, parse

# expose the extension-operator namespace at the package root so
# `getl.operators.<op>` works without a separate submodule import
from . import operators  # noqa: E402
from .session import get_spark

__all__ = [
    "Callback",
    "CallbackOWL",
    "CallbackSHACL",
    "CatalogStore",
    "Context",
    "Filter",
    "Loader",
    "Neo4JLoader",
    "Parser",
    "SparkNativeGraphLoader",
    "TigerGraphLoader",
    "clear",
    "get_spark",
    "get_store",
    "init",
    "load",
    "parse",
]

__version__ = "0.1.0"
