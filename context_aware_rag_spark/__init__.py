"""context_aware_rag_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the ingestion capabilities of
NVIDIA/context-aware-rag (reference at /root/reference, see SURVEY.md):
turn-window chunking, batched (subj, pred, obj) triple extraction,
entity linking with similarity-scored candidate ranking, alias
canonicalization via connected components, and graph materialization
into node/edge tables — all as pyspark.sql DataFrame transforms plus
vectorized pandas/Arrow UDFs. No per-row Python in the hot path.
"""

__version__ = "0.1.0"
