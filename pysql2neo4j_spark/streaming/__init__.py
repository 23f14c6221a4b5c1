"""Structured Streaming surface. The reference has no streaming at all
[recon: whole repo — pysql2neo4j is a batch ETL tool], so this layer is
scoped as the incremental-ingest path for the same transcript/event
schemas: file-source ingest, watermarked tumbling/session windows, and
stateful streaming dedup (SURVEY.md §2.C / §7 step 7).
"""
