"""Deterministic, distributed generator for the interleaved-docs corpus.

Produces the BASELINE input_hint shape:
    (doc_id: string, spans: array<struct<kind,text,media_ref,offset:int>>)
plus the embedded ground-truth KG (`gold_triples`) used as the P/R >= 0.95
oracle (BASELINE.json north_rule).

Scales by department count: each department contributes ~55 facts grouped
into ~12 docs, generated *inside* mapInPandas over ``spark.range(n_depts)``
— no driver-side loop, so the same code generates 10^2 or 10^8 docs; every
row is a pure function of (seed, dept index). The reference has no generator
(it loads pre-encoded SQLite files, /root/reference/parj.c:1662); this layer
replaces its external `rdf-exp` loader with a testable fixture.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from parj_spark.fixtures import ontology as O

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
GOLD_SCHEMA = "s_uri string, p_uri string, o_uri string, is_lit boolean"

_MEDIA_KINDS = ["image", "audio", "table"]


def _dept_facts(g: int, n_depts: int) -> list[tuple[str, str, str, bool, bool]]:
    """Ordered fact list for global dept ``g``: (s_local, p_uri, o, is_lit, o_is_class)."""
    u, d = divmod(g, O.DEPTS_PER_UNIV)
    n_univ = (n_depts + O.DEPTS_PER_UNIV - 1) // O.DEPTS_PER_UNIV
    univ = O.univ_local(u)
    dept = O.dept_local(u, d)
    facts: list[tuple[str, str, str, bool, bool]] = []

    if d == 0:  # university facts emitted once, by its first department
        facts.append((univ, O.RDF_TYPE, O.C_UNIVERSITY, False, True))
        facts.append((univ, O.P_NAME, O.name_literal(univ), True, False))

    facts.append((dept, O.RDF_TYPE, O.C_DEPARTMENT, False, True))
    facts.append((dept, O.P_SUB_ORG_OF, univ, False, False))

    group = O.ent_local(O.C_RESEARCH_GROUP, u, d, 0)
    facts.append((group, O.RDF_TYPE, O.C_RESEARCH_GROUP, False, True))
    facts.append((group, O.P_SUB_ORG_OF, dept, False, False))

    profs = [O.ent_local(O.C_FULL_PROFESSOR, u, d, i) for i in range(O.N_PROF)]
    for p in profs:
        facts.append((p, O.RDF_TYPE, O.C_FULL_PROFESSOR, False, True))
        facts.append((p, O.P_WORKS_FOR, dept, False, False))
        facts.append((p, O.P_NAME, O.name_literal(p), True, False))
        facts.append((p, O.P_EMAIL, O.email_literal(p), True, False))
        facts.append((p, O.P_TELEPHONE, O.telephone_literal(p), True, False))

    courses = [O.ent_local(O.C_COURSE, u, d, i) for i in range(O.N_COURSE)]
    for i, c in enumerate(courses):
        facts.append((c, O.RDF_TYPE, O.C_COURSE, False, True))
        facts.append((c, O.P_NAME, O.name_literal(c), True, False))
        facts.append((profs[i % O.N_PROF], O.P_TEACHER_OF, c, False, False))

    for i in range(O.N_UG):
        s = O.ent_local(O.C_UG_STUDENT, u, d, i)
        facts.append((s, O.RDF_TYPE, O.C_UG_STUDENT, False, True))
        facts.append((s, O.P_MEMBER_OF, dept, False, False))
        facts.append((s, O.P_ADVISOR, profs[i % O.N_PROF], False, False))
        facts.append((s, O.P_TAKES_COURSE, courses[i % O.N_COURSE], False, False))
        facts.append((s, O.P_NAME, O.name_literal(s), True, False))

    for i in range(O.N_GRAD):
        s = O.ent_local(O.C_GRAD_STUDENT, u, d, i)
        facts.append((s, O.RDF_TYPE, O.C_GRAD_STUDENT, False, True))
        facts.append((s, O.P_MEMBER_OF, dept, False, False))
        facts.append((s, O.P_ADVISOR, profs[(i + 1) % O.N_PROF], False, False))
        facts.append((s, O.P_TAKES_COURSE, courses[(i + 1) % O.N_COURSE], False, False))
        facts.append((s, O.P_DEGREE_FROM, O.univ_local((u + i + 1) % n_univ), False, False))
        facts.append((s, O.P_NAME, O.name_literal(s), True, False))

    return facts


_TEMPLATE_BY_PRED = {pred: (tid, fmt, lit) for tid, (pred, fmt, lit) in O.SENTENCES.items()}


def _pick_hop(rng: random.Random) -> int:
    r = rng.random()
    return 0 if r < 0.80 else (1 if r < 0.93 else 2)


def _render_fact(fact, rng: random.Random) -> str:
    s_local, p_uri, o, is_lit, o_is_class = fact
    _, fmt, _ = _TEMPLATE_BY_PRED[p_uri]
    s_surf = O.surface_for(s_local, _pick_hop(rng))
    if is_lit or o_is_class:
        o_surf = o
    else:
        o_surf = O.surface_for(o, _pick_hop(rng))
    return fmt.format(s=s_surf, o=o_surf)


def _dept_docs(g: int, n_depts: int, seed: int) -> list[dict]:
    rng = random.Random(seed * 1_000_003 + g)
    facts = _dept_facts(g, n_depts)
    docs: list[dict] = []
    i, j = 0, 0
    while i < len(facts):
        k = rng.randint(1, 8)
        chunk = list(facts[i : i + k])
        i += k
        if rng.random() < 0.20:  # duplicate mention of a fact from elsewhere in the dept
            chunk.append(rng.choice(facts))
        doc_id = f"doc_{g:07d}_{j:03d}"
        j += 1
        spans, offset, fig = [], 0, 0
        for fact in chunk:
            if rng.random() < 0.25:
                kind = rng.choice(_MEDIA_KINDS)
                ref = "media://" + hashlib.md5(f"{doc_id}:{fig}".encode()).hexdigest()
                cap = f"Figure {fig} of {doc_id}"
                spans.append({"kind": kind, "text": cap, "media_ref": ref, "offset": offset})
                offset += len(cap) + 1
                fig += 1
            text = _render_fact(fact, rng)
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            offset += len(text) + 1
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs


def documents_kg_df(
    spark: SparkSession, n_depts: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf["id"]:
                rows.extend(_dept_docs(int(g), n_depts, seed))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    n_part = num_partitions or max(1, min(n_depts, spark.sparkContext.defaultParallelism))
    return spark.range(n_depts, numPartitions=n_part).mapInPandas(gen, DOCS_SCHEMA)


def gold_triples_df(spark: SparkSession, n_depts: int) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf["id"]:
                for s_local, p_uri, o, is_lit, o_is_class in _dept_facts(int(g), n_depts):
                    if is_lit:
                        o_uri = o
                    elif o_is_class:
                        o_uri = O.class_uri(o)
                    else:
                        o_uri = O.entity_uri(o)
                    rows.append((O.entity_uri(s_local), p_uri, o_uri, is_lit))
            yield pd.DataFrame(rows, columns=["s_uri", "p_uri", "o_uri", "is_lit"])

    n_part = max(1, min(n_depts, spark.sparkContext.defaultParallelism))
    return spark.range(n_depts, numPartitions=n_part).mapInPandas(gen, GOLD_SCHEMA)


def gen_corpus(
    spark: SparkSession, n_depts: int, seed: int = 42, num_partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(documents_kg, gold_triples) at the given scale. tiny=8, small=160, bench=2000."""
    return (
        documents_kg_df(spark, n_depts, seed, num_partitions),
        gold_triples_df(spark, n_depts),
    )
