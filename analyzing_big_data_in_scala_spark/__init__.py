"""PySpark-native analytics engine with the capabilities of
AshWije/Analyzing-Big-Data-In-Scala, re-expressed Spark-first.

The reference (six Scala/Spark analytics programs — TF-IDF movie search,
NER word count, ML sentiment pipeline, GraphFrames analytics, hand-rolled
PageRank, Twitter DStream sentiment) is documented in SURVEY.md; every
operator here cites the reference usage site it covers and is implemented
as idiomatic DataFrame/SQL so Catalyst/Tungsten/AQE stay in the loop.

Layout:
    session     SparkSession factory (AQE on, sane shuffle partitions)
    sources     parquet/csv/text readers with explicit schemas + sinks
    functions   column-level building blocks (tokenize, hashes, quality)
    operators   composite operators (tfidf, graph, dedup, similarity, ml)
    plans       the query registry consumed by __spark_entry__.py
    streaming   Structured Streaming equivalents of the DStream workload
"""

__version__ = "0.1.0"
