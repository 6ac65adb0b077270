"""Text / dedup / similarity / quality operator queries (filled in
batches; see dedup.py, similarity.py, quality.py, retrieval.py)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict = {}
