"""Stage 1: triple extraction from interleaved documents.

Batched mention detection over span batches via ``mapInPandas`` (Arrow), per
the BASELINE input_hint ("vectorized pandas/Arrow UDFs, no per-row Python").
The media spans are *not* shipped into Python: the text-only filter and the
column pruning happen Spark-side before the UDF, so at 100 TB the Arrow
transfer carries only (doc_id, pos, text).

Replaces the reference's external `rdf-exp` loader front-end
(/root/reference/.../ImportHandler.java:24-172, insert body commented out).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parj_spark.fixtures import ontology as O

MENTIONS_SCHEMA = (
    "doc_id string, pos int, p_uri string, s_surf string, o_surf string, o_kind string"
)

# template id -> (compiled regex, predicate uri, object kind)
def _compiled_templates():
    out = []
    for tid, pat in O.EXTRACT_PATTERNS.items():
        pred, _, is_lit = O.SENTENCES[tid]
        o_kind = "literal" if is_lit else ("class" if tid == "type" else "entity")
        out.append((tid, re.compile(pat), pred, o_kind))
    return out


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, text, media_ref, offset) — the flat span view."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "sp")
    ).select(
        "doc_id",
        "pos",
        F.col("sp.kind").alias("kind"),
        F.col("sp.text").alias("text"),
        F.col("sp.media_ref").alias("media_ref"),
        F.col("sp.offset").alias("offset"),
    )


def span_sequence(docs: DataFrame) -> DataFrame:
    """The per-row invariant surface: (doc_id, pos, kind, text, media_ref)."""
    return explode_spans(docs).select("doc_id", "pos", "kind", "text", "media_ref")


def extract_mentions(docs: DataFrame) -> DataFrame:
    """docs -> (doc_id, pos, p_uri, s_surf, o_surf, o_kind) raw mention triples."""
    text_spans = explode_spans(docs).filter(F.col("kind") == "text").select(
        "doc_id", "pos", "text"
    )

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        templates = _compiled_templates()
        for pdf in batches:
            if pdf.empty:
                continue
            remaining = pd.Series(True, index=pdf.index)
            parts = []
            for _tid, rx, pred, o_kind in templates:
                if not remaining.any():
                    break
                sub = pdf.loc[remaining]
                ext = sub["text"].str.extract(rx)  # vectorized; 2 capture groups
                hit = ext[0].notna()
                if hit.any():
                    hits = sub.loc[hit]
                    parts.append(
                        pd.DataFrame(
                            {
                                "doc_id": hits["doc_id"].values,
                                "pos": hits["pos"].values,
                                "p_uri": pred,
                                "s_surf": ext.loc[hit, 0].values,
                                "o_surf": ext.loc[hit, 1].values,
                                "o_kind": o_kind,
                            }
                        )
                    )
                    remaining.loc[hits.index] = False
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return text_spans.mapInPandas(detect, MENTIONS_SCHEMA)
