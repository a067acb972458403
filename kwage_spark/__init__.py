"""kwage_spark — a PySpark-native mergeable-sketch analytics engine.

From-scratch re-creation of the query/data-processing capabilities of
LANL-Bioinformatics/KWAGE (a bit-sliced Bloom-filter sequence index) as an
idiomatic Spark library: vectorized numpy/Arrow kernels for Bloom / HLL /
count-min / KLL sketches, DataFrame-first ingest and containment search,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis) the same engine serves at 100 TB scale.

Layout:
  kernels/    pure-numpy sketch kernels (no Spark import)
  sources/    table loading + deterministic fixtures
  operators/  ingest / search / merge / checkpoint / dedup / similarity / text
  functions/  column-level helpers built on pyspark.sql.functions
  streaming/  structured-streaming ingest
  plans/      plan-inspection helpers (.explain assertions)
"""

__version__ = "0.1.0"
