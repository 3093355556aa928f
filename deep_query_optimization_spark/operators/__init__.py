"""Scale-oriented data-pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal columns.
Each operator is a pure DataFrame transformation (JVM-side expressions,
Pandas UDFs only where genuinely necessary) designed for 100 TB inputs.
"""
