"""Multimodal column plumbing (E36): opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched `mapInPandas`
operators.

The container has no image/audio libraries, so the actual decode is
STUBBED (`decode_media` raises NotImplementedError; `fake_features` is a
deterministic stand-in) — but everything Spark-side is real and tested:
the schema contract, the mapInPandas batch shape, partition-size control
for large payloads, and the struct metadata model.

100 TB notes: binary payloads dominate row width — keep
`spark.sql.files.maxPartitionBytes` small enough that a batch of decoded
frames fits executor memory, and store payloads in their own column
chunk (parquet does this natively) so metadata-only queries never read
the bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a media table from the documents fixture: payload = utf-8
    bytes of the text (stand-in for image/audio bytes), typed meta struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(F.col(text_col).cast("string"), 256).alias("checksum"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode entry point — stubbed: the decode libraries (PIL/
    libav/etc.) are not in this container. The mapInPandas wiring below is
    the production shape; swap `_decode_batch` for a real decoder."""

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this environment; use fake_features() for plumbing tests"
        )

    return df.mapInPandas(_decode_batch, FEATURE_SCHEMA)


def fake_features(df: DataFrame, n_features: int = 4) -> DataFrame:
    """Deterministic stand-in feature extractor over binary payloads.

    Arrow-batched mapInPandas: each batch arrives as a pandas DataFrame
    with the payload as bytes; features are integer-derived (exact in
    float64) so results are engine-reproducible for the oracle.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                    "features": [
                        [float((int(nb) * (j + 1) + int(fb)) % 256) for j in range(n_features)]
                        for nb, fb in zip(n, first)
                    ],
                }
            )
            yield out

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_us", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def frame_sample(df: DataFrame, fps_us: int = 40_000) -> DataFrame:
    """Fan each media row out into per-frame rows — the video
    frame-sampling shape: one input row becomes N output rows inside the
    same Arrow batch (mapInPandas is a flat-map, not a 1:1 map).

    The decoder is stubbed deterministically (n_frames derived from the
    payload size; frame hash from the content checksum + index) — the
    real part is the row-multiplying batch plumbing, the schema contract,
    and the per-frame timestamp assignment a real sampler needs. Batch
    memory scales with n_frames × row width: at 100 TB bound it with
    spark.sql.execution.arrow.maxRecordsPerBatch and keep payloads out of
    the output schema (only hashes/timestamps leave the executor)."""
    import hashlib

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                n_frames = int(len(payload)) % 4 + 1
                checksum = meta["checksum"]
                for i in range(n_frames):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_id"].append(i)
                    rows["n_frames"].append(n_frames)
                    rows["frame_us"].append(i * fps_us)
                    rows["frame_hash"].append(
                        hashlib.md5(f"{checksum}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(_sample, FRAME_SCHEMA)
