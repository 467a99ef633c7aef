"""Extension operators for large-scale training-data pipelines.

These go beyond the reference's surface (north star in
/root/repo/BASELINE.json): deduplication, similarity search, text
analysis, multimodal column plumbing. All hot paths are built-in Column
expressions (JVM-side, codegen); Python appears only in the multimodal
mapInPandas plumbing where per-batch imperative decode is the point.
"""
