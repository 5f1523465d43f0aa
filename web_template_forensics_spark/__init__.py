"""web_template_forensics_spark — a PySpark-native spatial-join + tiling engine
over Common-Crawl-style web-page tables.

Brand-new engine (NOT a port) re-expressing the query semantics of the
reference repo ``hemrajbhakar/web-template-forensics`` (a single-process
Flask template-comparison tool) as idiomatic Spark DataFrame dataflow,
then extending it with the geospatial operator set mandated by the graft
north rule: H3/S2-style hierarchical cell index, point-in-polygon joins,
kNN via k-ring expansion, raster<->vector tile materialization, plus the
training-data-pipeline operators (dedup, similarity search, text
analysis) a 100 TB corpus job needs.

Layout:
  oracle/     pure-Python reference-semantics parsers (the correctness oracle)
  functions/  vectorized pandas/Arrow UDFs + pure-SQL column expressions
  geo/        cell-index spec, polygon model, geocoding (pure numpy)
  operators/  dataflow operators (spatial joins, dedup, matching, tiles)
  sources/    synthetic pages generator + Iceberg-style table layout
  plans/      end-to-end jobs with per-partition lineage + resume
  streaming/  Structured Streaming ingestion demos
"""

__version__ = "0.1.0"
