"""Config-file surface — the reconstruction's ``settings.ini`` analogue
[recon: pysql2neo4j/configman.py reads source-DB URL, CSV dir,
transaction size, offline flags from an ini file].

Spark-native mapping:

    [input]                         [recon: configman sourcedb]
    path = /data/transcripts        parquet dir or iceberg:<table>

    [output]                        [recon: configman csvdir/neo4j]
    path = /data/graph

    [pipeline]                      [recon: transaction/periodic-commit size]
    n_buckets = 32                  checkpoint grain (conv-hash partitions)
    n_entity_buckets = 64
    n_salts = 16
    bands = 12
    rows = 2
    max_block = 64
    threshold = 0.63
    catalog = parquet               parquet | iceberg
    cc_partitions = 4

    [run]                           [recon: offline/dry-run flags + EP2/EP3]
    stage = all                     all | extract | materialize
    resume = true
    dry_run = false

Every key is optional; omitted keys keep the PipelineConfig defaults.
``stage=extract`` is the export-only entry point (EP2 analogue: stop
after the staged IR + manifest commit); ``stage=materialize`` is the
import-only entry point (EP3 analogue: build the graph from a
previously committed stage store, no transcript input needed).
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass

from .plans.pipeline import PipelineConfig

_PIPELINE_INT_KEYS = (
    "n_buckets", "n_entity_buckets", "n_salts", "bands", "rows",
    "max_block", "cc_partitions",
)


@dataclass
class RunConfig:
    input_path: str | None = None
    output_path: str | None = None
    stage: str = "all"          # all | extract | materialize
    resume: bool = True
    dry_run: bool = False
    pipeline: PipelineConfig = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.pipeline is None:
            self.pipeline = PipelineConfig()
        # keys the ini set explicitly (CLI > ini > computed default)
        self.pipeline_explicit: set[str] = getattr(self, "pipeline_explicit", set())


def load_config(path: str) -> RunConfig:
    cp = configparser.ConfigParser()
    with open(path) as f:  # configparser.read silently ignores missing files
        cp.read_file(f)

    pcfg = PipelineConfig()
    explicit: set[str] = set()
    if cp.has_section("pipeline"):
        sec = cp["pipeline"]
        for k in _PIPELINE_INT_KEYS:
            if k in sec:
                setattr(pcfg, k, sec.getint(k))
                explicit.add(k)
        if "threshold" in sec:
            pcfg.threshold = sec.getfloat("threshold")
            explicit.add("threshold")
        if "catalog" in sec:
            pcfg.catalog = sec.get("catalog")
            explicit.add("catalog")

    run = RunConfig(pipeline=pcfg)
    run.pipeline_explicit = explicit
    if cp.has_section("input"):
        run.input_path = cp["input"].get("path", run.input_path)
    if cp.has_section("output"):
        run.output_path = cp["output"].get("path", run.output_path)
    if cp.has_section("run"):
        sec = cp["run"]
        run.stage = sec.get("stage", run.stage).lower()
        run.resume = sec.getboolean("resume", run.resume)
        run.dry_run = sec.getboolean("dry_run", run.dry_run)
    if run.stage not in ("all", "extract", "materialize"):
        raise ValueError(f"[run] stage must be all|extract|materialize, got {run.stage!r}")
    return run
