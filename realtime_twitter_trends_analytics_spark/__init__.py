"""PySpark-native analytics engine with the capability surface of
akshitvjain/realtime-twitter-trends-analytics (reference at /root/reference,
~425 LoC: KafkaSparkProcessor.scala + KafkaTwitterProducer.java), rebuilt
Spark-first (DataFrame / Spark SQL / Structured Streaming) and extended with
the large-scale training-data-pipeline operators (dedup, similarity search,
multimodal plumbing, text analysis).

Layout:
    session.py    - SparkSession factory tuned for scale (AQE, Arrow, UTC)
    sources/      - parquet loaders for the driver tables; streaming sources
    functions/    - column-expression libraries (text cleaning, country,
                    sentiment lexicon, portable hashing)
    operators/    - named batch queries: relational core, trends pipeline,
                    dedup, similarity, text stats, multimodal plumbing
    streaming/    - Structured Streaming versions of the pipeline
    plans/        - plan-inspection helpers (explain capture, shuffle count)
    registry.py   - aggregates {name -> query fn} and {name -> oracle SQL}
"""

__version__ = "0.1.0"
