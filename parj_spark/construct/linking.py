"""Stage 2: entity linking — candidate generation + vectorized scoring.

Each distinct mention surface gets candidate canonical-ward forms with
scores; the best candidate per surface becomes a coreference edge for
union-find (stage 3). Scoring runs as a batched pandas transform over the
*distinct* surface set — at 100 TB the distinct-surface cardinality is the
entity vocabulary (millions), not the mention count (trillions), so the
Python-side work is bounded by vocabulary size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parj_spark.fixtures import ontology as O

CANDIDATES_SCHEMA = "surface string, candidate string, score double"


def mention_surfaces(mentions: DataFrame) -> DataFrame:
    """Distinct entity surfaces (subjects + entity-kind objects)."""
    s = mentions.select(F.col("s_surf").alias("surface"))
    o = mentions.filter(F.col("o_kind") == "entity").select(F.col("o_surf").alias("surface"))
    return s.union(o).distinct()


def candidate_links(surfaces: DataFrame) -> DataFrame:
    """surface -> (candidate, score); exact form + one-hop-normalized form."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            surf = pdf["surface"]
            prefix = surf.str.partition("_")[0]
            rest = surf.str.partition("_")[2]
            is_canon = prefix.isin(O.CANONICAL_PREFIXES)
            # exact candidate: canonical surfaces score 1.0, aliases 0.6
            exact = pd.DataFrame(
                {
                    "surface": surf,
                    "candidate": surf,
                    "score": is_canon.map({True: 1.0, False: 0.6}),
                }
            )
            # normalization chain candidates: each hop toward canonical,
            # score decaying 0.9, 0.85, ... (hop1 always beats hop2)
            parts = [exact]
            cur_prefix, score = prefix, 0.9
            while True:
                nxt = cur_prefix.map(O.NORMALIZE_HOP)
                has = nxt.notna()
                if not has.any():
                    break
                parts.append(
                    pd.DataFrame(
                        {
                            "surface": surf[has],
                            "candidate": nxt[has] + "_" + rest[has],
                            "score": score,
                        }
                    )
                )
                cur_prefix = nxt.where(has, cur_prefix)
                score -= 0.05
            yield pd.concat(parts, ignore_index=True)

    return surfaces.mapInPandas(gen, CANDIDATES_SCHEMA)


def best_links(candidates: DataFrame) -> DataFrame:
    """Argmax-score candidate per surface -> coref edges (surface, linked).

    Implemented as a max_by aggregation (single shuffle on surface), not a
    window sort — cheaper at scale.
    """
    return (
        candidates.groupBy("surface")
        .agg(F.max_by("candidate", F.struct("score", "candidate")).alias("linked"))
    )


def chain_canonical(surfaces: DataFrame) -> DataFrame:
    """(surface -> terminal of its normalization chain) — the closed-form
    canonicalization for surfaces whose alias chain is fully deterministic.

    Batch construction uses union-find over coref_edges (north-rule mandate,
    handles arbitrary merge evidence); this is the incremental-path shortcut
    for NEW surfaces arriving in a stream epoch, where re-running global
    union-find per micro-batch would be O(graph) work per epoch. Surfaces
    already present in the stored canon map keep their assignment (the map
    wins on join); only unseen ones take the chain terminal.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            surf = pdf["surface"]
            prefix = surf.str.partition("_")[0]
            rest = surf.str.partition("_")[2]
            while True:
                nxt = prefix.map(O.NORMALIZE_HOP)
                has = nxt.notna()
                if not has.any():
                    break
                prefix = nxt.where(has, prefix)
            yield pd.DataFrame(
                {"surface": surf, "terminal": prefix.where(rest == "", prefix + "_" + rest)}
            )

    return surfaces.mapInPandas(gen, "surface string, terminal string")


def coref_edges(surfaces: DataFrame) -> DataFrame:
    """Union-find edge set: consecutive normalization-chain pairs.

    Emits (alias_i -> alias_{i+1}) for the full chain of every observed
    surface, so the canonical form is always reachable even when an entity
    is only ever mentioned by a deep alias (two-hop fixture case).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cur = pdf["surface"]
            prefix = cur.str.partition("_")[0]
            rest = cur.str.partition("_")[2]
            parts = []
            while True:
                nxt_prefix = prefix.map(O.NORMALIZE_HOP)
                has = nxt_prefix.notna()
                if not has.any():
                    break
                nxt = nxt_prefix[has] + "_" + rest[has]
                parts.append(pd.DataFrame({"src": cur[has].values, "dst": nxt.values}))
                cur = nxt
                prefix = nxt_prefix[has]
                rest = rest[has]
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return surfaces.mapInPandas(gen, "src string, dst string").distinct()
