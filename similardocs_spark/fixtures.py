"""Deterministic synthetic fixtures per FIXTURES.md — no wall-clock dependence.

Generates the `transcripts` table (BASELINE.json input_hint shape:
conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp), the companion `docs_meta` (source/instance/update_date), the
reference query set (profile sentences from the reference's
SimilarDocsServiceTest.scala:82-98,230-233 re-expressed as bag-of-words), and
profile fixtures. "now" is PINNED (2026-01-02) so day-bucket tests are stable.
"""
from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import date, datetime, timedelta

PINNED_TODAY = date(2026, 1, 2)
PINNED_NOW = datetime(2026, 1, 2, 12, 0, 0)
END_DAYS_AGO = 7  # pinned iahx-lastModified offset (Conf.excludeDays)

ROLES = ("user", "assistant", "system", "tool")
TOOLS = (None, "search", "code", "browser")
SOURCES = ("MEDLINE", "LILACS", "LIS", "colecionaSUS")
INSTANCES = ("i1", "i2")

# EN/ES/PT-ish vocabulary incl. the reference test terms, accents, stopwords,
# short words, shared-prefix words, hyphen/underscore tokens.
VOCAB = (
    "dengue zika febre amarela mortalidade infantil saude brasil brazil humano "
    "acupuntura terapia digital e-health e-salud e-saude m-health chron colitis "
    "enfermedades infecciosas intestinales ulcerativa crianças nascidos vivos "
    "probabilidade conceito chamado países taxa ordenação unicef fundo nações "
    "unidas infância morrer idade calcular observada referida número período "
    "epidemiologia epidemia epidemico epidemiologico prevencao prevenção "
    "vacina vacinas vacinação vigilância sanitária hospital hospitais clinica "
    "the and for not este esta para com uma los las por del què año "
    "ab xy de la el em um é à ção ñu "
    "covid-19 sars-cov-2 hiv_aids tb-mdr influenza h1n1 malaria chagas "
    "salud pública atención primaria investigación ciencia tecnología "
    "política políticas sistema sistemas información informação dados "
    "análise analisis analysis analyse analyzed analyzing treatment treat "
    "tratamento tratamiento terapias terapeutico therapy"
).split()


@dataclass
class Turn:
    conv_id: str
    turn_idx: int
    role: str
    text: str
    tool: str | None
    ts: datetime


def make_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    max_turns: int = 12,
    spread_days: int = 1100,
) -> list[Turn]:
    """Seeded multi-turn transcripts spread over ~3 years of timestamps so the
    day-bucket ladder has members in several buckets."""
    rng = random.Random(seed)
    turns: list[Turn] = []
    for i in range(n_convs):
        conv_id = f"conv{i:08d}"
        n_turns = rng.randint(1, max_turns)
        # conversation anchor time: deterministic spread; stays >= END_DAYS_AGO old
        days_ago = END_DAYS_AGO + int(rng.random() ** 1.5 * spread_days)
        base_ts = PINNED_NOW - timedelta(days=days_ago, hours=rng.randint(0, 12))
        for t in range(n_turns):
            r = rng.random()
            if r < 0.02:
                text = ""  # empty text path
            elif r < 0.04:
                text = "   \t  "  # whitespace-only path
            elif r < 0.06:
                # >10,000-char text exercises the truncation path
                text = " ".join(rng.choices(VOCAB, k=2500))
            else:
                text = " ".join(rng.choices(VOCAB, k=rng.randint(3, 60)))
            turns.append(
                Turn(
                    conv_id=conv_id,
                    turn_idx=t,
                    role=ROLES[t % len(ROLES)],
                    text=text,
                    tool=rng.choice(TOOLS),
                    ts=base_ts + timedelta(minutes=5 * t),
                )
            )
    return turns


def docs_meta_for(turns: list[Turn]) -> dict[str, dict[str, str]]:
    """Per-conversation categorical metadata: source/instance hash-buckets of
    conv_id, update_date = yyyyMMdd of max(ts)."""
    by_conv: dict[str, list[Turn]] = {}
    for t in turns:
        by_conv.setdefault(t.conv_id, []).append(t)
    meta: dict[str, dict[str, str]] = {}
    for conv_id, ts in by_conv.items():
        h = _stable_hash(conv_id)
        meta[conv_id] = {
            "db": SOURCES[h % len(SOURCES)],
            "instance": INSTANCES[(h // 7) % len(INSTANCES)],
            "update_date": max(t.ts for t in ts).strftime("%Y%m%d"),
        }
    return meta


def _stable_hash(s: str) -> int:
    h = 2166136261
    for c in s.encode():
        h = ((h ^ c) * 16777619) & 0xFFFFFFFF
    return h


# Reference query set: profile sentences of SimilarDocsServiceTest.scala:82-98
# and :230-233, re-expressed as bag-of-words queries (north_star).
U5MR_SENTENCE = (
    "O Fundo das Nações Unidas para a infância UNICEF mantém uma ordenação dos "
    "países por taxa de mortalidade utilizando um conceito chamado Under 5 "
    "mortality rate ou U5MR definido pela OMS como a probabilidade de uma "
    "criança morrer até aos cinco anos de idade por mil crianças nascidas vivas."
)
U5MR_CONTENT = (
    "Mortalidade infantil consiste na morte de crianças no  primeiro ano de "
    "vida e é a base para calcular a taxa de mortalidade infantil, que consiste "
    "na mortalidade infantil observada durante um ano, referida ao número de "
    "nascidos vivos do mesmo período."
)

REFERENCE_QUERIES: dict[str, str] = {
    "profile_0": "humano",
    "profile_1": "zika dengue",
    "profile_2": "febre amarela",
    "profile_3": "mortalidade infantil",
    "profile_4": "saude brasil brazil",
    "profile_u5mr": U5MR_CONTENT,
    "profile_ehealth": "digital e-health e-salud e-saude m-health saude",
    "profile_acupuntura": "acupuntura terapia",
    "profile_intestinales": "chron colitis enfermedades infecciosas intestinales ulcerativa",
}

REFERENCE_PROFILES: list[dict] = [
    {"user": "Téster!@paho.org", "prof_name": "é profile 0", "prof_content": "humano"},
    {"user": "Téster!@paho.org", "prof_name": "é profile 1", "prof_content": "zika dengue"},
    {"user": "Téster!@paho.org", "prof_name": "é profile 2  ~$", "prof_content": "febre amarela"},
    {"user": "Téster!@paho.org", "prof_name": "é profile 3", "prof_content": "mortalidade infantil"},
    {"user": "Téster!@paho.org", "prof_name": "é profile 4", "prof_content": "saude brasil brazil"},
    {"user": "Téster!@paho.org", "prof_name": U5MR_SENTENCE, "prof_content": U5MR_CONTENT},
    {"user": "renato.murasaki@bireme.org", "prof_name": "e-health",
     "prof_content": "digital e-health e-salud e-saude m-health saude"},
    {"user": "renato.murasaki@bireme.org", "prof_name": "Acupuntura",
     "prof_content": "acupuntura terapia"},
    {"user": "renato.murasaki@bireme.org", "prof_name": "enfermedades intestinales",
     "prof_content": "chron colitis enfermedades infecciosas intestinales ulcerativa"},
]


def oracle_docs(turns: list[Turn]):
    """Group fixture turns into OracleDoc documents (docID = row_number over
    sorted conv_id — the engine's deterministic assignment)."""
    from .oracle.refsearch import OracleDoc

    by_conv: dict[str, list[Turn]] = {}
    for t in turns:
        by_conv.setdefault(t.conv_id, []).append(t)
    meta = docs_meta_for(turns)
    docs = []
    for doc_id, conv_id in enumerate(sorted(by_conv)):
        ts = sorted(by_conv[conv_id], key=lambda t: t.turn_idx)
        m = meta[conv_id]
        docs.append(
            OracleDoc(
                doc_id=doc_id,
                conv_id=conv_id,
                turn_texts=[t.text for t in ts],
                db=m["db"],
                instance=m["instance"],
                update_date=m["update_date"],
            )
        )
    return docs


def transcripts_df(spark, n_convs: int = 100, seed: int = 42):
    """Fixture transcripts as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rows = [
        (t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts)
        for t in make_transcripts(n_convs=n_convs, seed=seed)
    ]
    return spark.createDataFrame(rows, schema)
