"""Large-scale training-data pipeline operators (beyond-reference
surface): deduplication, similarity search, text analysis, multimodal
column plumbing.  All operators are DataFrame→DataFrame and built from
JVM-side expressions wherever possible; Python appears only in
Arrow-batched pandas UDFs."""
