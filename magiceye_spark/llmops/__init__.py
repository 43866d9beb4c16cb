"""LLM-data-pipeline operators: text statistics, language ID, exact and
near deduplication, similarity search, multimodal column plumbing.

These are the mandated extension surface (SURVEY.md §2.4) for running a
training-data pipeline at 100 TB on Spark. Everything scalar-heavy stays in
built-in JVM expressions; Python appears only in Arrow-batched Pandas UDFs
where Spark has no primitive (multimodal decode).
"""
