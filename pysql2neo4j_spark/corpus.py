"""Deterministic synthetic transcript corpus (FIXTURES.md §B).

Pure function of ``(seed, n_convs)`` — identical output across runs,
machines, and partitionings. No external data. The generator also emits
the *gold* canonical triple set it embedded, which the frozen oracle
extractor (``oracle_extractor.py``) must recover exactly; that pair of
artifacts plays the role of "the reference's emitted triples" for the
P/R >= 0.95 gate [BASELINE.json:2,14] (see SURVEY.md §0/§7.1 — the
reference tree is empty, so the executable spec is frozen here).

Corpus shape:
  * ~100 canonical entities (person / org / tool / place), each with
    2-5 surface aliases (case, first-initial, dropped-suffix, typo) so
    entity linking + canonicalization is non-trivial;
  * 10 templated predicates realized as regex-extractable sentences;
  * one designated HOT entity receiving ~30% of tool-typed object
    mentions (hot-entity skew test, SURVEY.md §5.2);
  * multi-turn conversations with mixed roles, mention-only sentences,
    zero-mention filler turns, and tool turns carrying ``tool`` names.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pandas as pd

SEED_DEFAULT = 42

# --------------------------------------------------------------------------
# Gazetteer. Stems are pairwise dissimilar by construction (distinct word
# roots) so that char-shingle Jaccard across *different* entities stays low;
# tests assert the margin (tests/test_corpus.py).
# --------------------------------------------------------------------------

_FIRST = [
    "Ada", "Boris", "Carmen", "Dmitri", "Elena", "Farid", "Greta", "Hiro",
    "Ines", "Jonas", "Kavya", "Liam", "Mona", "Nadia", "Oscar", "Priya",
    "Quentin", "Rosa", "Stefan", "Tara", "Umar", "Vera", "Wendel", "Ximena",
    "Yusuf", "Zelda", "Anouk", "Bram", "Cleo", "Dario",
]
_LAST = [
    "Lovelace", "Kuznetsov", "Delgado", "Morozov", "Vasquez", "Ghorbani",
    "Lindqvist", "Tanaka", "Ferreira", "Bergman", "Raghunath", "Whitfield",
    "Abebe", "Haddad", "Petrakis", "Iyer", "Marchand", "Echeverria",
    "Novak", "Blackwood", "Farouk", "Sokolova", "Ostrander", "Quintana",
    "Demir", "Ashworth", "Vandermeer", "Okafor", "Silvestri", "Drummond",
]
_ORG_STEM = [
    "Helios", "Vortexia", "Brightware", "Cobaltix", "Dunewave", "Emberlight",
    "Frostpeak", "Glimmerfield", "Hollowpine", "Ironvale", "Junipera",
    "Kestrelworks", "Lumenora", "Mistralware", "Nimbuscore", "Opaline",
    "Pinnacrest", "Quartzen", "Ravenhall", "Summitra", "Tidewater",
    "Umbraflow", "Violetta", "Wrenfield", "Xanthic", "Yellowbark",
    "Zephyrine", "Arborlogic", "Basaltic", "Cinderpath",
]
_ORG_SUFFIX = ["Labs", "Systems", "Analytics", "Dynamics", "Holdings"]
_TOOL = [
    "QueryForge", "Dataplane", "Graphweaver", "Streamlily", "Parqueteer",
    "Shufflebee", "Vectorino", "Hashgrove", "Windowpane", "Sketchpadly",
    "Broadcastify", "Partitionex", "Catalystide", "Tungstenly", "Arrowhawk",
    "Icebreaker", "Lineagely", "Checkmarker", "Skewtamer", "Bucketeer",
]
_PLACE = [
    "Armavelle", "Brundiska", "Cortavena", "Drovnik", "Eldermoor",
    "Fennwick", "Goravia", "Havrelund", "Ivoryport", "Jarnkoping",
    "Kelvastad", "Lumere", "Marivosa", "Nortvik", "Ollantara",
    "Pendlebrook", "Quarvessa", "Rostavia", "Sundmark", "Tervalon",
]

# The hot entity: object of ~50% of tool-typed object picks -> ~30% of all
# object mentions (skew defense target, SURVEY.md §2.B11).
HOT_TOOL = _TOOL[0]  # QueryForge


def _typo(word: str) -> str:
    """Deterministic typo: drop the 3rd character of the last word."""
    parts = word.split(" ")
    w = parts[-1]
    if len(w) > 4:
        parts[-1] = w[:2] + w[3:]
    return " ".join(parts)


@dataclass(frozen=True)
class Entity:
    key: str  # canonical entity key, e.g. "person:ada_lovelace"
    canonical: str
    etype: str
    aliases: tuple[str, ...]


def _uniq(aliases: tuple[str, ...]) -> tuple[str, ...]:
    return tuple(dict.fromkeys(aliases))


def build_gazetteer() -> list[Entity]:
    ents: list[Entity] = []
    for i in range(30):
        name = f"{_FIRST[i]} {_LAST[i]}"
        aliases = (
            name,
            name.lower(),
            f"{_FIRST[i][0]} {_LAST[i]}",  # first-initial, no dot (keeps sentences splittable)
            _typo(name),
        )
        ents.append(Entity(f"person:{i:02d}", name, "person", _uniq(aliases)))
    for i in range(30):
        name = f"{_ORG_STEM[i]} {_ORG_SUFFIX[i % len(_ORG_SUFFIX)]}"
        aliases = (name, name.lower(), _ORG_STEM[i], _typo(name))
        ents.append(Entity(f"org:{i:02d}", name, "org", _uniq(aliases)))
    for i in range(20):
        name = _TOOL[i]
        aliases = (name, name.lower(), _typo(name))
        ents.append(Entity(f"tool:{i:02d}", name, "tool", _uniq(aliases)))
    for i in range(20):
        name = _PLACE[i]
        aliases = (name, name.lower(), _typo(name))
        ents.append(Entity(f"place:{i:02d}", name, "place", _uniq(aliases)))
    return ents


def gazetteer_pdf() -> pd.DataFrame:
    """Gazetteer as a pandas frame (entity_key, canonical, etype, alias)."""
    rows = [
        (e.key, e.canonical, e.etype, a)
        for e in build_gazetteer()
        for a in e.aliases
    ]
    return pd.DataFrame(rows, columns=["entity_key", "canonical", "etype", "alias"])


# --------------------------------------------------------------------------
# Relation templates. Phrase strings double as the extraction grammar —
# oracle_extractor.py and operators/triples.py both key off PREDICATES.
# Filler / mention-only templates are guaranteed phrase-free.
# --------------------------------------------------------------------------

# pred -> (subj_type, obj_type, phrase)
PREDICATES: dict[str, tuple[str, str, str]] = {
    "works_at": ("person", "org", "works at"),
    "located_in": ("org", "place", "is located in"),
    "uses": ("person", "tool", "uses"),
    "reports_to": ("person", "person", "reports to"),
    "depends_on": ("tool", "tool", "depends on"),
    "created": ("person", "tool", "created"),
    "mentions": ("person", "org", "mentioned"),
    "part_of": ("org", "org", "is part of"),
    "succeeds": ("tool", "tool", "succeeds"),
    "asks_about": ("person", "tool", "asked about"),
}

MENTION_ONLY_TEMPLATES = [
    "Tell me about {E}.",
    "Any update on {E}?",
    "We should revisit {E} next week.",
]

FILLER = [
    "Thanks for the context.",
    "That sounds reasonable to me.",
    "Let me check the logs first.",
    "Here is a quick summary of the plan.",
    "Nothing else to add right now.",
    "The deployment finished without incident.",
]

TOOL_NAMES = ["search", "sql_runner", "browser", "calculator"]


def normalize_surface(s: str) -> str:
    """THE normalization contract shared by generator, oracle and pipeline:
    lowercase + collapse internal whitespace + strip."""
    return " ".join(s.lower().split())


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------

_EPOCH = datetime(2025, 1, 1)


def generate_corpus(
    n_convs: int = 200, seed: int = SEED_DEFAULT
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, gold_triples) as pandas DataFrames.

    transcripts: conv_id, turn_idx, role, text, tool, ts  (FIXTURES.md §B)
    gold_triples: conv_id, turn_idx, subj_key, pred, obj_key,
                  subj_surface, obj_surface, subj_canonical, obj_canonical
    """
    rng = random.Random(seed)
    ents = build_gazetteer()
    by_type: dict[str, list[Entity]] = {}
    for e in ents:
        by_type.setdefault(e.etype, []).append(e)
    hot = next(e for e in ents if e.canonical == HOT_TOOL)

    def pick_entity(etype: str, hot_ok: bool = True) -> Entity:
        if etype == "tool" and hot_ok and rng.random() < 0.5:
            return hot
        return rng.choice(by_type[etype])

    t_rows: list[tuple] = []
    g_rows: list[tuple] = []

    for ci in range(n_convs):
        conv_id = f"conv-{ci:06d}"
        n_turns = rng.randint(6, 14)
        ts = _EPOCH + timedelta(hours=ci)
        for ti in range(n_turns):
            ts = ts + timedelta(seconds=rng.randint(5, 120))
            is_tool_turn = ti > 0 and rng.random() < 0.15
            if is_tool_turn:
                tool = rng.choice(TOOL_NAMES)
                text = f"{tool} returned {rng.randint(0, 500)} rows in {rng.randint(1, 900)} ms."
                t_rows.append((conv_id, ti, "tool", text, tool, ts))
                continue
            role = "user" if ti % 2 == 0 else "assistant"
            sentences: list[str] = []
            n_sent = rng.randint(1, 3)
            for _ in range(n_sent):
                r = rng.random()
                if r < 0.50:  # relation sentence
                    pred = rng.choice(list(PREDICATES))
                    stype, otype, phrase = PREDICATES[pred]
                    subj = pick_entity(stype)
                    obj = pick_entity(otype)
                    while obj.key == subj.key:
                        obj = rng.choice(by_type[otype])
                    s_surf = rng.choice(subj.aliases)
                    o_surf = rng.choice(obj.aliases)
                    sentences.append(f"{s_surf} {phrase} {o_surf}.")
                    g_rows.append(
                        (conv_id, ti, subj.key, pred, obj.key,
                         s_surf, o_surf, subj.canonical, obj.canonical)
                    )
                elif r < 0.75:  # mention-only sentence
                    ent = pick_entity(rng.choice(["person", "org", "tool", "place"]))
                    tmpl = rng.choice(MENTION_ONLY_TEMPLATES)
                    sentences.append(tmpl.format(E=rng.choice(ent.aliases)))
                else:
                    sentences.append(rng.choice(FILLER))
            t_rows.append((conv_id, ti, role, " ".join(sentences), None, ts))

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    transcripts["ts"] = pd.to_datetime(transcripts["ts"]).astype("datetime64[us]")
    gold = pd.DataFrame(
        g_rows,
        columns=[
            "conv_id", "turn_idx", "subj_key", "pred", "obj_key",
            "subj_surface", "obj_surface", "subj_canonical", "obj_canonical",
        ],
    )
    gold["turn_idx"] = gold["turn_idx"].astype("int32")
    return transcripts, gold


def transcripts_spark(spark, n_convs: int = 200, seed: int = SEED_DEFAULT,
                      n_partitions: int | None = None):
    """Corpus as a Spark DataFrame with the authoritative schema, hash-
    repartitioned on conv_id (SURVEY.md §2.B3)."""
    from pyspark.sql import functions as F

    from .schemas import TRANSCRIPT_SCHEMA

    pdf, _ = generate_corpus(n_convs=n_convs, seed=seed)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    n = n_partitions or spark.sparkContext.defaultParallelism
    return df.repartition(n, F.xxhash64("conv_id"))
