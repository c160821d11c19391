"""Filter — control-plane metadata/label predicates (reference
graph_etl/filters.py).

Semantics pinned by the reference tests (SURVEY.md §2.2 P7):
  * ``skip_parse(metadatas)``: skip a parser iff it shares at least one
    metadata KEY with the filter but no (key, value) pair matches.
  * ``skip_load_node(label, metadatas)`` / ``skip_load_edge``: same
    metadata rule, plus an optional label/type whitelist.

This is the file-granularity analog of partition pruning: work is
skipped before any Spark job is submitted.
"""

from __future__ import annotations

from typing import Any


class Filter:
    def __init__(self) -> None:
        self._metadatas: dict[str, list[Any]] = {}
        self._node_labels: set[str] = set()
        self._edge_types: set[str] = set()

    # -- construction (reference filters.py:18-48) ------------------------------

    def add_metadata(self, key: str, value: Any) -> "Filter":
        self._metadatas.setdefault(key, []).append(value)
        return self

    def add_node_label(self, label: str) -> "Filter":
        self._node_labels.add(label)
        return self

    def add_edge_type(self, edge_type: str) -> "Filter":
        self._edge_types.add(edge_type)
        return self

    # -- predicates (reference filters.py:51-58) --------------------------------

    def _metadata_mismatch(self, metadatas: dict[str, Any]) -> bool:
        """True iff ≥1 shared key but no (key, value) match."""
        shared = [k for k in self._metadatas if k in metadatas]
        if not shared:
            return False
        return not any(metadatas[k] in self._metadatas[k] for k in shared)

    def skip_parse(self, metadatas: dict[str, Any]) -> bool:
        return self._metadata_mismatch(metadatas or {})

    def skip_load_node(self, label: str, metadatas: dict[str, Any]) -> bool:
        if self._node_labels and label not in self._node_labels:
            return True
        return self._metadata_mismatch(metadatas or {})

    def skip_load_edge(self, edge_type: str, metadatas: dict[str, Any]) -> bool:
        if self._edge_types and edge_type not in self._edge_types:
            return True
        return self._metadata_mismatch(metadatas or {})
