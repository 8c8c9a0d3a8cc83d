"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference VLM data pipeline (Zou-2004/VLM_data_pipeline).

Brand-new, Spark-first design: DataFrame/SQL logical plans optimized by
Catalyst, Pandas UDFs only where built-ins can't express the semantics.

Layout
------
- ``session``    : SparkSession builder with scale-conscious defaults
- ``schemas``    : canonical StructTypes (frames, boxes, cameras, QA pairs)
- ``functions/`` : geometry, text-analysis, deterministic-random column libs
- ``operators/`` : dedup, similarity search, as-of join, pair join, audits
- ``sources/``   : JSON-frame / COCO / binary-file source adapters
- ``qa/``        : the QA task generators as DataFrame transforms
- ``plans/``     : the star-schema query registry backing __spark_entry__.py
- ``streaming/`` : Structured Streaming extensions (labeled as such)
"""

__version__ = "0.1.0"
