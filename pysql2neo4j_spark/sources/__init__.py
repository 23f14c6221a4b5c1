"""Sources & sinks: transcript/star-schema readers and the partitioned
graph writer (Iceberg when a runtime jar is present, Parquet fallback
with an equivalent bucket partition spec — SURVEY.md §7.7).
"""
