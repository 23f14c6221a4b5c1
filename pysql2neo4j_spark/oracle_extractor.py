"""FROZEN reference extractor — the executable spec for P/R >= 0.95.

The reference tree (`/root/reference/`) was empty at survey time
(SURVEY.md §0), so "the reference's emitted triples" [BASELINE.json:2,14]
are defined by this module: a tiny, obviously-correct, row-at-a-time
pure-pandas rule-based extractor over the corpus grammar
(``corpus.PREDICATES``). It is imported by *tests only*, never by the
pipeline, and must never be optimized or refactored — the Spark
pipeline (operators/mentions.py, operators/triples.py) re-implements
the semantics independently with vectorized Arrow/pandas UDFs, and the
pytest P/R gate compares the two (tests/test_pipeline_e2e.py).

Row-at-a-time Python here is deliberate: this is the frozen oracle,
not the engine.
"""

from __future__ import annotations

import re

import pandas as pd

from .corpus import MENTION_ONLY_TEMPLATES, PREDICATES, build_gazetteer, normalize_surface

_SENT_SPLIT = re.compile(r"(?<=[.?])\s+")

_REL_PATTERNS = {
    pred: re.compile(r"^(.+?) " + re.escape(phrase) + r" (.+?)[.?]$")
    for pred, (_, _, phrase) in PREDICATES.items()
}

_MENTION_ONLY_PATTERNS = [
    re.compile(
        "^"
        + re.escape(t.split("{E}")[0])
        + r"(.+?)"
        + re.escape(t.split("{E}")[1])
        + "$"
    )
    for t in MENTION_ONLY_TEMPLATES
]


def extract_turn(text: str) -> tuple[list[tuple], list[tuple]]:
    """Extract from one turn. Returns (mentions, triples) where
    mentions = [(surface, norm, start, end)] and
    triples = [(subj_surface, pred, obj_surface, subj_start, obj_start)].
    Offsets are char offsets into ``text``."""
    mentions: list[tuple] = []
    triples: list[tuple] = []
    offset = 0
    for sent in _SENT_SPLIT.split(text):
        for pred, pat in _REL_PATTERNS.items():
            m = pat.match(sent)
            if m:
                s_surf, o_surf = m.group(1), m.group(2)
                s_start = offset + m.start(1)
                o_start = offset + m.start(2)
                mentions.append((s_surf, normalize_surface(s_surf), s_start, s_start + len(s_surf)))
                mentions.append((o_surf, normalize_surface(o_surf), o_start, o_start + len(o_surf)))
                triples.append((s_surf, pred, o_surf, s_start, o_start))
                break
        else:
            for pat in _MENTION_ONLY_PATTERNS:
                m = pat.match(sent)
                if m:
                    surf = m.group(1)
                    start = offset + m.start(1)
                    mentions.append((surf, normalize_surface(surf), start, start + len(surf)))
                    break
        offset += len(sent) + 1  # sentences are joined with a single space
    return mentions, triples


def reference_mentions(transcripts: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in transcripts.itertuples(index=False):
        ms, _ = extract_turn(r.text)
        for surf, norm, start, end in ms:
            rows.append((r.conv_id, r.turn_idx, surf, norm, start, end, r.role))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "surface", "norm", "start", "end", "role"]
    )


def reference_triples(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Surface-level reference triples, one row per extracted instance."""
    rows = []
    for r in transcripts.itertuples(index=False):
        _, ts = extract_turn(r.text)
        for s_surf, pred, o_surf, s_start, o_start in ts:
            rows.append((r.conv_id, r.turn_idx, s_surf, pred, o_surf, s_start, o_start))
    return pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "subj_surface", "pred", "obj_surface",
                 "subj_start", "obj_start"],
    )


def alias_to_canonical() -> dict[str, str]:
    """norm(alias) -> canonical *representative* = min norm(alias) over the
    entity's aliases. The reference is allowed to use the gazetteer; the
    pipeline is NOT (it must recover clusters via linking + hash-min CC).
    Using the min-norm as the cluster representative makes reference and
    pipeline entity ids directly comparable when clustering is correct."""
    out: dict[str, str] = {}
    for e in build_gazetteer():
        norms = sorted(normalize_surface(a) for a in e.aliases)
        rep = norms[0]
        for n in norms:
            out[n] = rep
    return out


def reference_canonical_triples(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Distinct canonical (subj_rep, pred, obj_rep) set — the P/R target."""
    t = reference_triples(transcripts)
    a2c = alias_to_canonical()
    t["subj_rep"] = t["subj_surface"].map(lambda s: a2c[normalize_surface(s)])
    t["obj_rep"] = t["obj_surface"].map(lambda s: a2c[normalize_surface(s)])
    return (
        t[["subj_rep", "pred", "obj_rep"]]
        .drop_duplicates()
        .sort_values(["subj_rep", "pred", "obj_rep"])
        .reset_index(drop=True)
    )
