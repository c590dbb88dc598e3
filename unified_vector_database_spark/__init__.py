"""unified_vector_database_spark — a PySpark-native batch analytics engine
with the query and data-processing capabilities of
knowusuboaky/unified_vector_database (see /root/reference, SURVEY.md).

The reference is a unified API over five vector/search backends
(Chroma, Elasticsearch, Milvus, Qdrant, Weaviate; reference
README.md:1-11, docs/.guide.md:3). This package re-expresses that
surface — collections, CRUD, filtered k-NN, range/grouped/batch
search, BM25 + hybrid fusion, index build/probe, quantization — as
declarative Spark DataFrame plans, plus the LLM-data-pipeline
operators (dedup family, similarity joins, text analysis, multimodal
columns) needed at 100 TB scale.
"""

__version__ = "0.1.0"
