"""Structured Streaming surface: incremental ingest into the same KG tables.

The reference is batch/interactive only (SURVEY.md §2.8 — no streaming
concepts anywhere in PARJ); this module is the idiomatic Spark extension the
north rule's lakehouse story implies: new interleaved documents arrive as
files, are extracted incrementally, and appended to the triples tables via
``foreachBatch`` (exactly-once per epoch against an idempotent sink path),
while windowed/watermarked aggregations serve monitoring-style queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parj_spark.construct import extract
from parj_spark.fixtures.generator import DOCS_SCHEMA


def read_docs_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream of interleaved docs (parquet drops into ``path``)."""
    from pyspark.sql.types import _parse_datatype_string

    return (
        spark.readStream.schema(_parse_datatype_string(DOCS_SCHEMA))
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_mentions(docs_stream: DataFrame) -> DataFrame:
    """Incremental extraction: the same batched-regex stage, run per epoch."""
    return extract.extract_mentions(docs_stream)


def mentions_to_parquet(
    docs_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch sink: append per-epoch mention batches to one parquet
    table. Epoch id makes re-delivered batches idempotent (overwrite by
    epoch subdir)."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"epoch={epoch_id}")
            )
        )

    return (
        streaming_mentions(docs_stream)
        .writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def stateful_entity_counts(docs_stream: DataFrame):
    """Custom stateful streaming operator: running mention count per entity
    surface across micro-batches via ``applyInPandasWithState``.

    Demonstrates the arbitrary-state path (GroupState + Arrow batches) the
    built-in windowed aggregations can't express: the state is a running
    counter keyed by entity surface that survives across triggers and
    emits the updated total every time the entity is seen again.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mentions = streaming_mentions(docs_stream).select("s_surf")

    def update(key, batches, state: GroupState):
        n = sum(len(pdf) for pdf in batches)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"s_surf": [key[0]], "mentions": [total]})

    return mentions.groupBy("s_surf").applyInPandasWithState(
        update,
        outputStructType="s_surf string, mentions long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_span_counts(docs_stream: DataFrame) -> DataFrame:
    """Watermarked sliding-window aggregation over span kinds.

    Event time is synthesized from the span offset (the fixture corpus has
    no wall-clock column); in production this is the document ingest time.
    """
    spans = docs_stream.select(
        "doc_id", F.explode("spans").alias("sp")
    ).select(
        "doc_id",
        F.col("sp.kind").alias("kind"),
        (F.timestamp_seconds(F.col("sp.offset"))).alias("event_time"),
    )
    return (
        spans.withWatermark("event_time", "60 seconds")
        .groupBy(F.window("event_time", "30 seconds"), "kind")
        .agg(F.count("*").alias("n_spans"))
    )
