"""Pages → (src, dst) edge table (SURVEY.md §7 step 1).

pages --extract_links_udf--> (src_url, dst_url) --id dictionary join-->
(src, dst) long ids, deduplicated, hash-partitioned by src (the analog of
buildMatrixUnique's bucket ingest, reference/matrix.hpp:245-291).

Scale notes: the two dictionary joins are plain shuffle hash joins on the
url key (broadcast when the dictionary is small); dedup happens in the
same shuffle as the final src partition. Dangling link targets (urls
never crawled) are dropped by the inner join — matching the closed-world
vertex set the reference requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import extract_links_udf
from .ids import assign_contiguous_ids


def extract_edges(pages: DataFrame) -> DataFrame:
    """(url, html) → (src_url, dst_url), one row per hyperlink."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links_udf(F.col("html"))).alias("dst_url"),
        )
    )


def build_edge_table(
    pages: DataFrame,
    id_map: DataFrame | None = None,
    n_buckets: int | None = None,
    drop_self_loops: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full ingest: returns (edges(src,dst), id_map(url,id))."""
    if id_map is None:
        id_map = assign_contiguous_ids(pages.select("url"))
    id_map = id_map.persist()

    raw = extract_edges(pages)
    src_ids = id_map.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_ids = id_map.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    edges = (
        raw.join(src_ids, on="src_url")
        .join(dst_ids, on="dst_url")
        .select("src", "dst")
    )
    if drop_self_loops:
        edges = edges.where(F.col("src") != F.col("dst"))
    edges = edges.dropDuplicates(["src", "dst"])
    if n_buckets:
        edges = edges.repartition(n_buckets, "src")
    return edges, id_map
