"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

The pattern a 100 TB training-data pipeline needs for image/audio/
video: the modality payload is an opaque BINARY column; a metadata
struct (modality, declared size, checksum) travels beside it; decode
and feature extraction run as pandas-batched Python over binary
Arrow buffers — the only layer that *must* be Python — and
everything before/after (filtering, grouping, joins, dedup by
checksum) stays native and prunable.

Because the test container has no image/audio codecs, the decode
step is a clearly-marked DETERMINISTIC STUB (`_stub_decode`): it
derives a fake "feature vector" from the payload bytes (length +
md5-prefix ints). The Spark-side plumbing — schema, binary
round-trip through Arrow, batch shapes, partitioning — is real and
oracle-checked, and `decode_image()` raises NotImplementedError to
mark where a codec (Pillow/ffmpeg) plugs in on a real cluster.

The synthetic payloads are built FROM the documents table (text
bytes as the 'blob'), so the oracle can reproduce them in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

N_FEATURES = 4


def decode_image(payload: bytes) -> object:
    """Real-codec hook: decode an image payload to pixels. Not
    available in this container — the pipeline uses _stub_decode."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "plug Pillow/torchvision here on a real cluster"
    )


def _stub_decode(payload: bytes) -> list[int]:
    """DETERMINISTIC STUB for feature extraction: 4 ints from the
    md5 of the payload (so the DuckDB oracle can recompute them).
    Stands in for decode→resize→embed; same shape, same dataflow."""
    import hashlib

    digest = hashlib.md5(payload).hexdigest()
    return [int(digest[i * 8 : (i + 1) * 8], 16) for i in range(N_FEATURES)]


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", StringType()),
        StructField("f0", LongType()),
        StructField("f1", LongType()),
        StructField("f2", LongType()),
        StructField("f3", LongType()),
    ]
)


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           'image' AS modality,
           CAST(length(text) AS INTEGER) AS n_bytes,
           md5(text) AS checksum,
           CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS f0,
           CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) AS f1,
           CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) AS f2,
           CAST(('0x' || substr(md5(text), 25, 8)) AS BIGINT) AS f3
    FROM documents ORDER BY doc_id
    """,
    tags=("multimodal", "binary", "pandas-udf"),
)
def multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction end-to-end: build the
    opaque binary column, ship it through Arrow to a mapInPandas
    extractor (stub codec), return typed features + checksum.

    Scale notes: payload bytes never leave the executor (no
    collect); batches are bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so a skewed blob
    column cannot blow executor memory; checksum is computed in the
    same pass for downstream exact-dedup of media."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                rows.append(
                    (
                        int(doc_id),
                        "image",
                        len(blob),
                        hashlib.md5(blob).hexdigest(),
                        *_stub_decode(blob),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FEATURE_SCHEMA.fields]
            )

    return d.mapInPandas(extract, _FEATURE_SCHEMA).orderBy("doc_id")


@register(
    "multimodal_dedup",
    oracle="""
    SELECT md5(text) AS checksum,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) > 1
    ORDER BY checksum
    """,
    tags=("multimodal", "dedup"),
)
def multimodal_dedup(spark, sf_dir):
    """Exact media dedup by payload checksum — the binary-column
    analogue of exact_dedup: hash-groupBy on md5(payload), one
    uniform shuffle; at 100 TB the checksum is computed once at
    ingest and stored as metadata so this never re-reads blobs."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return (
        d.groupBy(F.md5("payload").alias("checksum"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .where("n_copies > 1")
        .orderBy("checksum")
    )


@register(
    "multimodal_batch_shape",
    oracle="""
    SELECT 'image' AS modality,
           COUNT(*) AS n_payloads,
           CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
           CAST(MAX(length(text)) AS BIGINT) AS max_bytes,
           CAST(MIN(length(text)) AS BIGINT) AS min_bytes
    FROM documents
    """,
    tags=("multimodal", "stats"),
)
def multimodal_batch_shape(spark, sf_dir):
    """Payload-size census per modality — the planning query that
    sizes Arrow batches and partition counts before a heavy decode
    sweep (sum/max drive maxRecordsPerBatch and repartition)."""
    d = load_table(spark, sf_dir, "documents").select(
        F.lit("image").alias("modality"), F.encode("text", "UTF-8").alias("payload")
    )
    return d.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
        F.min(F.length("payload")).alias("min_bytes"),
    )


_FRAME_SIZE = 32  # bytes per synthetic "frame"
_FRAME_STRIDE = 3  # sample every 3rd frame

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             CAST(i AS INTEGER) AS frame_idx,
             CAST(CAST(ceil(length(text) / {_FRAME_SIZE}.0) AS BIGINT) AS INTEGER)
               AS n_frames,
             md5(substr(text, CAST(i AS BIGINT) * {_FRAME_SIZE} + 1, {_FRAME_SIZE}))
               AS frame_md5
      FROM read_parquet_documents_view_placeholder
    )
    SELECT * FROM frames WHERE frame_idx % {_FRAME_STRIDE} = 0
    ORDER BY doc_id, frame_idx
    """.replace(
        "read_parquet_documents_view_placeholder",
        f"""(SELECT doc_id, text FROM documents),
      LATERAL (SELECT unnest(range(0, CAST(ceil(length(text) / {_FRAME_SIZE}.0) AS BIGINT))) AS i) starts""",
    ),
    tags=("multimodal", "video", "pandas-udf"),
)
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling: the 1→MANY mapInPandas shape. The
    payload is treated as a frame sequence (fixed-size chunks);
    every {stride}-th frame is emitted as its own row with a frame
    checksum — decode→frame-split→sample for video corpora, with the
    codec stubbed exactly like multimodal_features.

    Scale notes: output fan-out happens executor-side inside the
    Arrow batch (no explode of a giant decoded array through the
    plan); each input batch yields ~batch×frames/stride rows, and
    downstream per-frame ops (dedup, embedding) shuffle on
    uniformly-hashed frame checksums."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                n_frames = math.ceil(len(blob) / _FRAME_SIZE)
                for idx in range(0, n_frames, _FRAME_STRIDE):
                    chunk = blob[idx * _FRAME_SIZE : (idx + 1) * _FRAME_SIZE]
                    rows.append(
                        (
                            int(doc_id),
                            idx,
                            n_frames,
                            hashlib.md5(chunk).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return d.mapInPandas(sample, _FRAME_SCHEMA).orderBy("doc_id", "frame_idx")
