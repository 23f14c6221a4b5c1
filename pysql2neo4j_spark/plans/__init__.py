"""Pipeline orchestration: the end-to-end transcript->graph plan,
per-partition checkpoint/resume, and lineage metrics (SURVEY.md §3.2).
"""
