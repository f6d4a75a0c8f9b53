"""PySpark-native analytics engine with the query/data-processing
capabilities of ``sw249/Process-AlphaFold3-outputs`` (see SURVEY.md).

Brand-new Spark-first design: every operator is a composable
``DataFrame -> DataFrame`` transform expressed with the DataFrame API so
Catalyst handles pushdown/pruning/join-selection; Python crosses the
JVM boundary only for mmCIF parse/write (Arrow-batched pandas UDFs).

Layout
------
- ``sources``   : parquet/JSON/mmCIF readers (schema'd, malformed-tolerant)
- ``operators`` : screen, intervals, islands, spatial, report, dedup,
                  similarity, text, multimodal
- ``functions`` : scalar/array helpers (amino-acid maps, vector math)
- ``plans``     : end-to-end pipelines (the reference's entry points)
- ``streaming`` : watch-folder ingest (Structured Streaming)
"""

__version__ = "0.1.0"
