"""Shipped algorithms re-expressed Spark-first (SURVEY.md §2.11)."""

from .simple_pagerank import simple_pagerank  # noqa: F401
