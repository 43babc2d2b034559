"""alp_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the *capabilities* of ALP
(ALP/GraphBLAS + ALP/Pregel, reference: BenBrock/ALP, C++11) on idiomatic
Spark: DataFrames + Catalyst for the algebra, Arrow-vectorized pandas UDFs
for the per-element escape hatches, a driver-side superstep loop with
parquet checkpoint/lineage for Pregel.

Layout
------
- :mod:`alp_spark.algebra`      — operators / monoids / semirings (ref: ops.hpp, monoid.hpp, semiring.hpp)
- :mod:`alp_spark.operators`    — BLAS-1/2/3 primitives on DataFrames (ref: base/blas{1,2,3}.hpp)
- :mod:`alp_spark.pregel`       — vertex-centric superstep runtime (ref: interfaces/pregel.hpp)
- :mod:`alp_spark.algorithms`   — PageRank / CC / label propagation / knn / triangles (ref: algorithms/)
- :mod:`alp_spark.sources`      — pages synthesis, html→text extraction, link/edge ingest
- :mod:`alp_spark.pipeline`     — dedup / similarity / text-analysis ops for training-data pipelines
- :mod:`alp_spark.checkpoint`   — parquet warehouse with lineage + superstep metrics, resume support
"""

__version__ = "0.1.0"
