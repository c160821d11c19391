"""Loader ABC — sink plug-in interface (reference graph_etl/loader.py:5-37).

Same signatures as the reference so user loaders port unchanged;
``file_path`` is a staged dataset directory (parquet or ';'-CSV parts)
instead of a single CSV file.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any


class Loader(ABC):
    @abstractmethod
    def load_nodes(
        self,
        file_path: str,
        label: str,
        primary_key: str,
        metadatas: dict[str, Any],
        properties_type: dict[str, str],
        constraints: list[str],
        indexs: list[str],
    ) -> int:
        """Load one staged node dataset; return created/loaded count."""

    @abstractmethod
    def load_edges(
        self,
        file_path: str,
        edge_type: str,
        start: str,
        end: str,
        metadatas: dict[str, Any],
        properties_type: dict[str, str],
    ) -> int:
        """Load one staged edge dataset; return created/loaded count."""
