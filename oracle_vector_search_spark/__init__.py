"""oracle_vector_search_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference CBIR pipeline ``Niobe96/Oracle_vector_search``
(see /root/repo/SURVEY.md): batch vector indexing, exact + approximate
similarity search, metadata joins, image-pipeline ingestion — generalized
into LLM-data-pipeline operators (dedup, similarity joins, text analysis,
multimodal columns) designed for 100 TB scale.

Design rules (SURVEY.md §7):
- Vectors are plain ``ARRAY<FLOAT>`` columns; scoring math is Spark SQL
  higher-order functions first (oracle-checkable), numpy GEMM fast path
  second.
- DataFrame/SQL API throughout; Catalyst does the optimizing.
- Python row-at-a-time UDFs are banned; pixel/model work is Arrow pandas
  UDFs; everything else is built-in column expressions.
- torch/cv2 are optional plugins; the engine core has zero heavy deps.
"""

__version__ = "0.1.0"
