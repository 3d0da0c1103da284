"""geminigraph_spark — a PySpark-native link-graph analytics engine.

A brand-new implementation (NOT a port) of the capabilities of Gemini, the
computation-centric distributed graph system (OSDI '16; reference code at
/root/reference): hyperlink extraction from Common-Crawl-style web pages,
dictionary-encoded dense vertex ids with locality-aware degree-weighted
chunking, and iterative vertex-centric workloads (PageRank, connected
components, label propagation, triangle counting, SSSP, BFS, BC) executed
through DataFrames + vectorized Arrow/pandas UDFs, with Gemini's adaptive
sparse/dense (push/pull) mode switching re-expressed as a driver-level
choice between broadcast-join and partial/final-aggregation pipelines
(reference: core/graph.hpp:1502-1508).

Layout:
  sources/    pages fixture generator, link extraction, edge derivation
  plans/      dictionary encoding, chunk partitioning, checkpoint, metrics
  operators/  vertex-centric engine (process_vertices / process_edges),
              per-chunk CSR/CSC kernels
  functions/  algorithm kernels (A1-A7) + training-data pipeline functions
              (dedup, minhash-LSH, similarity search, text stats)
  streaming/  incremental edge ingest (Structured Streaming)
"""

__version__ = "0.1.0"
