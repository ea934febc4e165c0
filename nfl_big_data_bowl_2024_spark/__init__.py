"""PySpark-native analytics engine with the query/data-processing capabilities of
g-lopp/NFL_Big_Data_Bowl_2024 (see SURVEY.md), rebuilt Spark-first.

Layout:
    session    -- SparkSession factory tuned for the 100 TB design point
    schemas    -- explicit StructTypes for every table (reference + testdata)
    sources    -- readers (parquet/csv, partitioned tracking) and sinks
    functions  -- scalar column function families (spatial F1-F5, text)
    operators  -- window/ordered ops (W1-W5), dedup, similarity search
    kernels    -- numpy LQR pursuit solver (U2) + applyInPandas kernels (U1/U3)
    plans      -- end-to-end pipelines (E1 max-params, E2 YAP, E3 reporting)
    streaming  -- Structured Streaming ingest of the 10 Hz tracking feed
"""

__version__ = "0.1.0"
