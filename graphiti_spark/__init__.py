"""graphiti_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of oncallai/graphiti.

Pipeline shape (SURVEY.md §3.2, modeled on the reference's bulk path
``graphiti_core/graphiti.py:554-831`` but re-expressed as one Spark DAG):

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      → episode assembly          (window over (conv_id, turn_idx))
      → mention/triple extraction (vectorized pandas UDFs, deterministic rules)
      → entity canonicalization   (token + LSH blocking → connected components)
      → edge dedup + temporal versioning (window dedup, T1/T2 semantics)
      → partitioned entities/edges/episodes tables (+ lineage, checkpoints)

Everything is DataFrame-first; Python only runs inside Arrow-vectorized
pandas UDFs. No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
