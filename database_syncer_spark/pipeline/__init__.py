"""LLM-data-pipeline operators (SURVEY.md §2 B10/B11; BASELINE.json
north-star mandate): dedup, similarity search, text analysis, multimodal
column plumbing — each designed as a distributed Spark query shape first,
with Python only in Arrow-batched UDFs where built-ins can't express the
semantics."""
