"""Streaming ingest for the training-data surface: continuous exact
dedup over a document stream — the "dedup on arrival" stage a corpus
pipeline runs in front of its batch near-dup passes, so replayed
crawler output and between-refresh duplicates never reach storage.

Built on Structured Streaming's dropDuplicatesWithinWatermark: state is
keyed by content hash (md5(text)), and the event-time watermark bounds
how long each hash is remembered — the explicit state/recall trade of
every production streaming dedup (a duplicate arriving later than the
watermark horizon is re-admitted; the batch `doc_exact_dedup` pass
behind it catches those). Without the watermark the state store grows
with distinct-documents-ever, which at crawl scale is unbounded.

The batch twin (`operators/text.py::doc_exact_dedup`) keeps min(doc_id)
per hash; the stream keeps the first arrival. On an in-order feed the
two agree — pinned by test_doc_stream_dedup_matches_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_STREAM_SCHEMA = ("doc_id long, text string, lang string, "
                     "source string, n_chars long, ingest_ts timestamp")


def stream_doc_dedup(docs: DataFrame,
                     watermark_delay: str = "10 minutes") -> DataFrame:
    """Exact-dedup a streaming documents frame on md5(text), remembering
    each hash for ``watermark_delay`` of event time past the max seen
    ``ingest_ts``. State per key is one row (hash, first-seen ts);
    eviction is the watermark, so steady-state size is
    arrival-rate x delay, independent of stream lifetime."""
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .withWatermark("ingest_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def run_doc_dedup_once(spark, input_dir: str, checkpoint_dir: str,
                       output_dir: str,
                       watermark_delay: str = "10 minutes",
                       metrics: list | None = None) -> DataFrame:
    """Drive the dedup over all currently-available input files
    (availableNow trigger) into a parquet sink. Re-invoking with the
    same checkpoint processes only new files with the hash state
    restored — a duplicate arriving in a later batch is dropped even
    across restarts (the state store, not the sink, carries the seen
    set). Returns the sink contents.

    ``metrics``: pass a list to receive the per-micro-batch ops rows
    (stream_batch_metrics shape — rows in, state rows/bytes, trigger
    ms). state_rows is the watermark-bounded hash-state size: the
    number the "memory is arrival-rate x delay, not stream lifetime"
    claim rests on (measured in SCALE.md, pinned by
    test_doc_stream_dedup_state_is_watermark_bounded)."""
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(input_dir)
    deduped = stream_doc_dedup(stream, watermark_delay)
    q = (deduped.writeStream.outputMode("append").format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if metrics is not None:
        from .stream_pipeline import stream_batch_metrics

        metrics.extend(stream_batch_metrics(q))
    return spark.read.parquet(output_dir)
