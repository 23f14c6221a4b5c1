"""Config-file surface (configman analogue) + EP2/EP3 stage split:
extract-only followed by materialize-only must equal a single full
build."""

from __future__ import annotations

import os

import pytest

from pysql2neo4j_spark.config import RunConfig, load_config
from pysql2neo4j_spark.plans.pipeline import (
    PipelineConfig,
    build_graph,
    extract_stage,
    materialize_graph,
    read_committed_ir,
)

INI = """
[input]
path = /data/transcripts

[output]
path = /data/graph

[pipeline]
n_buckets = 12
n_salts = 8
threshold = 0.7
catalog = parquet

[run]
stage = extract
resume = false
"""


def test_load_config_roundtrip(tmp_out):
    p = os.path.join(tmp_out, "settings.ini")
    with open(p, "w") as f:
        f.write(INI)
    run = load_config(p)
    assert run.input_path == "/data/transcripts"
    assert run.output_path == "/data/graph"
    assert run.stage == "extract"
    assert run.resume is False and run.dry_run is False
    assert run.pipeline.n_buckets == 12
    assert run.pipeline.n_salts == 8
    assert run.pipeline.threshold == 0.7
    assert run.pipeline_explicit >= {"n_buckets", "n_salts", "threshold"}
    # untouched keys keep defaults
    assert run.pipeline.bands == PipelineConfig().bands


def test_load_config_defaults_and_bad_stage(tmp_out):
    p = os.path.join(tmp_out, "empty.ini")
    with open(p, "w") as f:
        f.write("[run]\nstage = bogus\n")
    with pytest.raises(ValueError, match="stage"):
        load_config(p)
    defaults = RunConfig()
    assert defaults.stage == "all" and defaults.resume and not defaults.dry_run


def test_extract_then_materialize_equals_full_build(spark, transcripts_df, tmp_out):
    """EP2 (export-only) then EP3 (import-only, no transcript input)
    must produce the same graph as a single EP1 run."""
    cfg = PipelineConfig(n_buckets=8)

    split_out = os.path.join(tmp_out, "split")
    extract_stage(spark, transcripts_df, split_out, cfg)          # EP2
    mentions, triples = read_committed_ir(spark, split_out, cfg)  # EP3 input
    res_split = materialize_graph(spark, mentions, triples, split_out, cfg)

    res_full = build_graph(
        spark, transcripts_df, os.path.join(tmp_out, "full"), cfg
    )
    cols = ["src_entity", "dst_entity", "pred", "n_obs", "first_ts", "provenance"]
    a = sorted(map(tuple, res_split["edges"].select(*cols).collect()))
    b = sorted(map(tuple, res_full["edges"].select(*cols).collect()))
    assert a == b
    assert res_split["nodes"].count() == res_full["nodes"].count()
