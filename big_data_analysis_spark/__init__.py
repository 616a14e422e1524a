"""big_data_analysis_spark — a PySpark-native analytics engine.

Re-expresses the operator surface of the reference repo
``PerEngineer/Big_Data_Analysis`` (five single-node pandas/sklearn/torch
analysis scripts; see SURVEY.md) as an idiomatic Spark DataFrame / SQL /
ML / Structured Streaming library, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design rules (see SURVEY.md §4.2, §7):
- Declarative DataFrame plans; Catalyst/Tungsten/AQE do the physical work.
- Implicit pandas row order is always rewritten as an explicit
  (partitionBy, orderBy) window — the core semantic translation.
- Python UDFs only where built-in expressions genuinely cannot express
  the semantics (image decode, CJK numeral parsing); always Arrow-batched.
- Every operator takes partition keys so plans scale horizontally; the
  single-partition shapes the reference implies are a special case.
"""

__version__ = "0.1.0"
