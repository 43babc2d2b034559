"""Sources & ingest: web pages → text → links → contiguous-id edge table.

The reference's only ingest surface is buildMatrixUnique + a matrix-market
/SNAP parser (SURVEY.md §2.3); our engine's primary source is a
Common-Crawl-style pages table (BASELINE.json input_hint) parsed with
vectorized Arrow UDFs.
"""

from .extract import extract_links_udf, extract_text_udf  # noqa: F401
from .ids import assign_contiguous_ids  # noqa: F401
from .links import build_edge_table, extract_edges  # noqa: F401
from .pages import synthesize_pages  # noqa: F401
from .readers import read_matrix_market, read_snap_edges  # noqa: F401
from .sinks import read_bucketed, write_bucketed  # noqa: F401
