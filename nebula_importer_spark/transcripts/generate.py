"""Deterministic synthetic transcript corpus (north-star input).

Input shape per BASELINE.json:input_hint:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)
Companions (FIXTURES.md §1): alias_dict(alias, entity_id),
same_as(entity_id, dup_id), golden_triples(conv_id, turn_idx, subj, pred, obj).

Two generators:

- ``gen_corpus_local``  — driver-side, seeded ``random.Random``; returns
  pandas frames INCLUDING ground-truth triples (canonical ids). Used by
  pytest correctness and the P/R harness. Rows are emitted in SHUFFLED order
  so the (conv_id, turn_idx) ordering window downstream is load-bearing.
- ``gen_transcripts_spark`` — pure Spark-arithmetic (spark.range + xxhash64
  indexing into array literals, zero Python rows) for bench-scale inputs;
  same templates, optional mega-thread skew. Scales to any row count without
  driver involvement — this is also the 10^12-turn story: the generator IS a
  distributed job.

Relation templates (the extraction spec both the engine and the independent
reference extractor implement):

    "<Subj> works at <Org>."    → works_at
    "<Subj> lives in <Place>."  → lives_in
    "<Subj> knows <Person>."    → knows
    "<Subj> uses <Tool>."       → uses
    "<Subj> founded <Org>."     → founded

Mentions are alias surface forms; ~TYPO_RATE of them carry a one-char
deletion typo (never present in the alias dict) so entity linking needs the
fuzzy (LSH) path, not just the broadcast exact join.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PREDICATES = ["works_at", "lives_in", "knows", "uses", "founded"]
TEMPLATES = {
    "works_at": "{s} works at {o}.",
    "lives_in": "{s} lives in {o}.",
    "knows": "{s} knows {o}.",
    "uses": "{s} uses {o}.",
    "founded": "{s} founded {o}.",
}
FILLERS = [
    "ok let me check the logs for that run",
    "the build finished without errors",
    "can you rerun the job with more partitions",
    "that looks right to me",
    "the shuffle stage is spilling again",
    "we should broadcast the small table",
    "thanks that fixed it",
    "the watermark lags behind by two minutes",
]
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "bash", "python", "browser"]

_FIRST = ["Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Heidi",
          "Ivan", "Judy", "Mallory", "Niaj", "Olivia", "Peggy", "Rupert",
          "Sybil", "Trent", "Victor", "Walter", "Yolanda"]
_LAST = ["Smith", "Jones", "Zhang", "Garcia", "Mueller", "Tanaka", "Okafor",
         "Silva", "Novak", "Haddad", "Kim", "Larsen", "Moreau", "Petrov",
         "Rossi"]
_ORG_A = ["Acme", "Globex", "Initech", "Umbrella", "Hooli", "Vandelay",
          "Wayne", "Stark", "Wonka", "Tyrell"]
_ORG_B = ["Corp", "Labs", "Industries", "Systems", "Group"]
_PLACE = ["Paris", "Berlin", "Tokyo", "Lagos", "Lima", "Oslo", "Madrid",
          "Seoul", "Cairo", "Quito", "Vienna", "Dublin", "Havana", "Nairobi"]
_TOOLNAMES = ["Spark", "Flink", "Trino", "DuckDB", "Kafka", "Iceberg",
              "Parquet", "Arrow", "Airflow", "Ray"]

TYPO_RATE = 0.10
DUP_ENTITY_RATE = 0.25


@dataclass
class Corpus:
    transcripts: pd.DataFrame
    alias_dict: pd.DataFrame  # (alias, entity_id)
    same_as: pd.DataFrame  # (entity_id, dup_id) equivalence pairs
    golden_triples: pd.DataFrame  # (conv_id, turn_idx, subj, pred, obj) canonical
    entities: dict[str, list[str]] = field(default_factory=dict)

    def to_spark(self, spark: SparkSession) -> dict[str, DataFrame]:
        t = spark.createDataFrame(self.transcripts)
        t = t.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        return {
            "transcripts": t,
            "alias_dict": spark.createDataFrame(self.alias_dict),
            "same_as": spark.createDataFrame(self.same_as),
            "golden_triples": spark.createDataFrame(self.golden_triples),
        }


# Alias surface forms contain NO periods: the sentence-final period is the
# only "." in generated text, which keeps the extraction grammar regular.
def _person_aliases(first: str, last: str) -> list[str]:
    return [f"{first} {last}", f"{first[0]} {last}", f"{first} {last[0]}"]


def _org_aliases(a: str, b: str) -> list[str]:
    return [f"{a} {b}", a, f"{a} {b[0]}"]


def _typo(rng: random.Random, s: str) -> str:
    """One-char deletion somewhere after the first char (keeps capitalization
    so extraction still fires; never equals a dictionary alias)."""
    if len(s) < 4:
        return s
    i = rng.randrange(1, len(s) - 1)
    return s[:i] + s[i + 1 :]


def gen_corpus_local(
    seed: int = 42,
    n_convs: int = 30,
    turns_per_conv: int = 20,
    mega_conv_turns: int = 200,
    relation_rate: float = 0.6,
) -> Corpus:
    """Small-scale corpus with ground truth. One mega-thread (conv_0) gets
    ``mega_conv_turns`` turns — the skew fixture (FIXTURES.md §1)."""
    rng = random.Random(seed)

    # --- entity universe with canonical ids, duplicates, aliases ----------
    people, orgs, places, tools = [], [], [], []
    alias_rows: list[tuple[str, str]] = []
    same_as_rows: list[tuple[str, str]] = []
    canonical_of: dict[str, str] = {}

    def _add_entity(eid: str, aliases: list[str], bucket: list[str]) -> None:
        ids = [eid]
        if rng.random() < DUP_ENTITY_RATE:
            dup = eid + "__dup"
            ids.append(dup)
            same_as_rows.append((eid, dup))
        for a_i, alias in enumerate(aliases):
            # duplicates own a share of the aliases → linking alone cannot
            # unify them; connected components must.
            alias_rows.append((alias, ids[a_i % len(ids)]))
        for i in ids:
            canonical_of[i] = eid
        bucket.append(eid)

    used = set()
    for f in _FIRST:
        for last in rng.sample(_LAST, 3):
            if (f, last) in used:
                continue
            used.add((f, last))
            eid = f"person:{f.lower()}_{last.lower()}"
            _add_entity(eid, _person_aliases(f, last), people)
    for a in _ORG_A:
        b = rng.choice(_ORG_B)
        _add_entity(f"org:{a.lower()}_{b.lower()}", _org_aliases(a, b), orgs)
    for p in _PLACE:
        _add_entity(f"place:{p.lower()}", [p, p.upper()], places)
    for t in _TOOLNAMES:
        _add_entity(f"tool:{t.lower()}", [t, t.lower()], tools)

    alias_to_eid = dict(alias_rows)
    aliases_of: dict[str, list[str]] = {}
    for alias, eid in alias_rows:
        aliases_of.setdefault(canonical_of[eid], []).append(alias)

    obj_pool = {"works_at": orgs, "lives_in": places, "knows": people,
                "uses": tools, "founded": orgs}

    # --- turns --------------------------------------------------------------
    t_rows, golden = [], []
    base_ts = datetime(2026, 1, 1)
    for c in range(n_convs):
        conv_id = f"conv_{c:05d}"
        n_turns = mega_conv_turns if c == 0 else turns_per_conv
        for i in range(n_turns):
            sentences, role = [], ROLES[rng.randrange(len(ROLES))]
            tool = TOOLS[rng.randrange(len(TOOLS))] if role == "tool" else None
            sentences.append(rng.choice(FILLERS))
            if rng.random() < relation_rate:
                for _ in range(rng.randrange(1, 3)):
                    pred = rng.choice(PREDICATES)
                    subj = rng.choice(people)
                    obj = rng.choice(obj_pool[pred])
                    if pred == "knows" and obj == subj:
                        continue
                    s_alias = rng.choice(aliases_of[subj])
                    o_alias = rng.choice(aliases_of[obj])
                    if rng.random() < TYPO_RATE:
                        s_alias = _typo(rng, s_alias)
                    if rng.random() < TYPO_RATE:
                        o_alias = _typo(rng, o_alias)
                    sentences.append(TEMPLATES[pred].format(s=s_alias, o=o_alias))
                    golden.append((conv_id, i, subj, pred, obj))
            t_rows.append(
                (
                    conv_id,
                    i,
                    role,
                    " ".join(sentences),
                    tool,
                    base_ts + timedelta(seconds=c * 100000 + i * 30),
                )
            )

    rng.shuffle(t_rows)  # on-disk order must NOT be turn order
    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return Corpus(
        transcripts=transcripts,
        alias_dict=pd.DataFrame(alias_rows, columns=["alias", "entity_id"]),
        same_as=pd.DataFrame(same_as_rows, columns=["entity_id", "dup_id"]),
        golden_triples=pd.DataFrame(
            sorted(set(golden)), columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
        ),
        entities={"people": people, "orgs": orgs, "places": places, "tools": tools},
    )


# ---------------------------------------------------------------------------
# Spark-arithmetic generator (bench scale): zero Python in the data path.
# ---------------------------------------------------------------------------


def gen_transcripts_spark(
    spark: SparkSession,
    n_turns: int = 1_000_000,
    n_convs: int = 10_000,
    mega_share: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Distributed deterministic transcript generator.

    Every 1-in-``mega_share`` turn lands in conv_00000 (the mega-thread); the
    rest spread uniformly. Text is built from the same templates with
    hash-indexed entity aliases — all JVM expressions, so generating 10^9
    rows is just a bigger range.
    """
    c = gen_corpus_local(seed=seed, n_convs=1, turns_per_conv=1)  # entity lists only
    subj_aliases = F.array(*[F.lit(a) for a, e in
                             c.alias_dict.itertuples(index=False)
                             if e.startswith("person:")][:100])
    org_aliases = F.array(*[F.lit(a) for a, e in
                            c.alias_dict.itertuples(index=False)
                            if e.startswith("org:")][:30])
    fillers = F.array(*[F.lit(s) for s in FILLERS])
    roles = F.array(*[F.lit(r) for r in ROLES])
    tools = F.array(*[F.lit(t) for t in TOOLS])

    def _pick(arr, n, salt):
        return F.element_at(arr, (F.pmod(F.xxhash64(F.col("id"), F.lit(salt + seed)), F.lit(n)) + 1).cast("int"))

    df = spark.range(n_turns)
    is_mega = F.pmod(F.col("id"), F.lit(mega_share)) == 0
    conv_num = F.when(is_mega, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n_convs - 1)) + 1
    )
    # turn_idx is arithmetic (no window needed at generation): mega turns are
    # id/mega_share; others use a hash that is unique enough per conv for
    # ordering purposes and made strictly unique by adding id.
    turn_idx = F.when(is_mega, (F.col("id") / mega_share).cast("int")).otherwise(
        F.col("id").cast("int")
    )
    rel = TEMPLATES["works_at"]
    pre, mid, post = rel.split("{s}")[0], " works at ", "."
    text = F.concat(
        _pick(fillers, len(FILLERS), 1),
        F.lit(" "),
        _pick(subj_aliases, 100, 2),
        F.lit(mid),
        _pick(org_aliases, 30, 3),
        F.lit(post),
    )
    return df.select(
        F.format_string("conv_%05d", conv_num).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        _pick(roles, len(ROLES), 4).alias("role"),
        text.alias("text"),
        _pick(tools, len(TOOLS), 5).alias("tool"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("id")).alias("ts"),
    )
