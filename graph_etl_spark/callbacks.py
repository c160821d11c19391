"""Callback ABC + OWL2/SHACL schema exporters
(reference graph_etl/callbacks.py).

Callbacks are schema-observation hooks fired on every save with the
label/type, the (Spark) schema, and the parser metadata
(reference callbacks.py:6-30; fired at context.py:114-116,213-220).
The exporters accumulate axioms/shapes and write on ``export()``.
Pure driver-side metadata — no Spark jobs.
"""

from __future__ import annotations

import os
from abc import ABC
from typing import Any

from pyspark.sql import types as T

from .catalog import spark_dtype_to_ref

# reference dtype → XSD datatype (callbacks.py:43-55, 147-159)
_XSD: dict[str, str] = {
    "Utf8": "xsd:string",
    "Int8": "xsd:integer",
    "Int16": "xsd:integer",
    "Int32": "xsd:integer",
    "Int64": "xsd:integer",
    "Float32": "xsd:float",
    "Float64": "xsd:double",
    "Boolean": "xsd:boolean",
    "Date": "xsd:date",
    "Datetime": "xsd:dateTime",
    "List[Utf8]": "xsd:string",
}


def _xsd(dt: T.DataType) -> str:
    return _XSD.get(spark_dtype_to_ref(dt), "xsd:string")


class Callback(ABC):
    """Hook interface (reference callbacks.py:6-30)."""

    def save_nodes(self, label: str, schema: T.StructType, metadatas: dict[str, Any], **kwargs) -> None:
        pass

    def save_edges(self, edge_type: str, schema: T.StructType, metadatas: dict[str, Any], **kwargs) -> None:
        pass


class CallbackOWL(Callback):
    """OWL2 (functional-style Turtle-ish) schema exporter
    (reference callbacks.py:57-128)."""

    def __init__(self, path: str = "./output/file.owl", base_iri: str = "http://graphetl.spark/onto#"):
        self.path = path
        self.base_iri = base_iri
        self.axioms: list[str] = []
        self._classes: set[str] = set()

    def save_nodes(self, label, schema, metadatas, **kwargs):
        if label not in self._classes:
            self._classes.add(label)
            self.axioms.append(f"Declaration(Class(:{label}))")
        for f in schema.fields:
            self.axioms.append(
                f"Declaration(DataProperty(:{label}_{f.name})) "
                f"DataPropertyDomain(:{label}_{f.name} :{label}) "
                f"DataPropertyRange(:{label}_{f.name} {_xsd(f.dataType)})"
            )

    def save_edges(self, edge_type, schema, metadatas, **kwargs):
        start = (kwargs.get("start") or ":Thing").split(":")[0]
        end = (kwargs.get("end") or ":Thing").split(":")[0]
        self.axioms.append(
            f"Declaration(ObjectProperty(:{edge_type})) "
            f"ObjectPropertyDomain(:{edge_type} :{start}) "
            f"ObjectPropertyRange(:{edge_type} :{end})"
        )

    def export(self) -> str:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        body = (
            f"Prefix(:=<{self.base_iri}>)\n"
            "Prefix(xsd:=<http://www.w3.org/2001/XMLSchema#>)\n"
            f"Ontology(<{self.base_iri.rstrip('#')}>\n"
            + "\n".join(self.axioms)
            + "\n)\n"
        )
        with open(self.path, "w") as f:
            f.write(body)
        return self.path


class CallbackSHACL(Callback):
    """SHACL NodeShape exporter (reference callbacks.py:161-217)."""

    def __init__(self, path: str = "./output/file.ttl", base_iri: str = "http://graphetl.spark/shape#"):
        self.path = path
        self.base_iri = base_iri
        self.shapes: dict[str, list[str]] = {}

    def save_nodes(self, label, schema, metadatas, **kwargs):
        props = self.shapes.setdefault(label, [])
        pk = kwargs.get("primary_key", "id")
        for f in schema.fields:
            min_count = " ; sh:minCount 1" if f.name == pk else ""
            props.append(
                f"  sh:property [ sh:path :{f.name} ; "
                f"sh:datatype {_xsd(f.dataType)}{min_count} ]"
            )

    def save_edges(self, edge_type, schema, metadatas, **kwargs):
        start = (kwargs.get("start") or "Thing:id").split(":")[0]
        end = (kwargs.get("end") or "Thing:id").split(":")[0]
        props = self.shapes.setdefault(start, [])
        props.append(f"  sh:property [ sh:path :{edge_type} ; sh:class :{end} ]")

    def export(self) -> str:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        lines = [
            f"@prefix : <{self.base_iri}> .",
            "@prefix sh: <http://www.w3.org/ns/shacl#> .",
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
            "",
        ]
        for label, props in self.shapes.items():
            lines.append(f":{label}Shape a sh:NodeShape ;")
            lines.append(f"  sh:targetClass :{label} ;")
            lines.append(" ;\n".join(props) + " .")
            lines.append("")
        with open(self.path, "w") as f:
            f.write("\n".join(lines))
        return self.path
