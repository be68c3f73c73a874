"""Multimodal column plumbing (E36): opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched `mapInPandas`
operators.

Decode coverage: REAL byte-level decoders exist for three formats that
need no external codec library — PCM16 WAV audio (stdlib `wave`,
decode_wav_features), netpbm P6 PPM images (header grammar + numpy,
decode_ppm_features), and the documented raw-RGB layout (decode_media).
Compressed codecs (JPEG/PNG/libav audio) are NOT in this container, so
their mime branches raise NotImplementedError loudly; `fake_features`
remains the deterministic stand-in used by schema/batching tests. The
Spark-side contract — schema, Arrow batch shape, partition-size control
for large payloads, struct metadata model — is identical for every
format and exercised end-to-end by the real decoders.

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


def _encode_media_batches(encode_row, mime: str, id_col: str = "doc_id"):
    """Batch-function factory behind every synthesizer (attach_*):
    per-row ``encode_row(doc_id) -> bytes`` wrapped into MEDIA_SCHEMA
    frames (payload + mime/n_bytes/sha256 meta). ONE definition shared
    by the standalone attach operators and the fused synth→decode
    pipelines below, so fusion cannot drift from the operators —
    composition of the identical batch functions (r15, guide §4.1; the
    q244 shared-helper rule generalized)."""
    import hashlib

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf[id_col]:
                payload = encode_row(int(doc_id))
                rows["doc_id"].append(int(doc_id))
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "mime": mime,
                        "n_bytes": len(payload),
                        "checksum": hashlib.sha256(payload).hexdigest(),
                    }
                )
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return _encode


def _synth_media(df: DataFrame, encode_row, mime: str, id_col: str) -> DataFrame:
    """The standalone synthesizer shape: parallelize (Python-side encode
    is the CPU stage), prune to the id column, one mapInPandas."""
    from .stage import parallelize_stage

    df = parallelize_stage(df)
    return df.select(F.col(id_col)).mapInPandas(
        _encode_media_batches(encode_row, mime, id_col), MEDIA_SCHEMA
    )


def fuse_synth_decode(
    df: DataFrame,
    encode_row,
    mime: str,
    decode_batches,
    schema: T.StructType,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fused synthesize→decode in ONE Python crossing (r15, guide §4.1
    — the q244 fusion generalized to the whole media-decode family).

    The chained form (attach_* → decode_*) runs TWO mapInPandas
    operators: every payload byte crosses Python→JVM after the encode
    and JVM→Python again before the decode, and each task runs two
    Python runners. Both stages are pure per-row functions over the
    same rows, so the fused operator composes the SAME batch functions
    (the encode factory above + the decode operator's module-level
    batch function) inside one mapInPandas: payloads are born and
    consumed in the same Python worker and never cross the boundary at
    all; only the decoded feature rows return to the JVM. Results are
    identical by construction — it is literal function composition of
    the operators' own batch functions."""
    from .stage import parallelize_stage

    df = parallelize_stage(df)
    enc = _encode_media_batches(encode_row, mime, id_col)

    def _fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return decode_batches(enc(batches))

    return df.select(F.col(id_col)).mapInPandas(_fused, schema)


def _maybe_fuse(
    df: DataFrame,
    decode_batches,
    schema: T.StructType,
    encode_row,
    mime: str,
    id_col: str,
) -> DataFrame:
    """Every decode operator's exit point: plain mapInPandas when fed an
    already-materialized media table (``encode_row=None``), or the fused
    single-crossing pipeline when the caller passes the synthesizer's
    per-row encode rule (see fuse_synth_decode)."""
    if encode_row is None:
        return df.mapInPandas(decode_batches, schema)
    return fuse_synth_decode(df, encode_row, mime, decode_batches, schema, id_col)


RAW_RGB_MIME = "image/x-raw-rgb"
_RAW_MAGIC = b"RAW1"  # 8-byte header: magic + width:u16be + height:u16be


def encode_raw_rgb(width: int, height: int, pixel_of_index) -> bytes:
    """Build a raw-RGB payload: 8-byte header + interleaved RGB bytes,
    pixel byte i = pixel_of_index(i). The synthetic codec used by the
    executable decode path (and by tests as the independent model)."""
    head = _RAW_MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big")
    return head + bytes(pixel_of_index(i) & 0xFF for i in range(width * height * 3))


def _raw_rgb_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """decode_media's batch function (module-level so the fused
    pipeline composes the identical code)."""
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {k.name: [] for k in FEATURE_SCHEMA.fields}
        for doc_id, payload, meta in zip(
            pdf["doc_id"], pdf["payload"], pdf["meta"]
        ):
            if meta["mime"] != RAW_RGB_MIME:
                raise NotImplementedError(
                    f"no decoder for {meta['mime']!r} in this "
                    "container (image/audio libs absent); raw-RGB is "
                    "the executable path"
                )
            buf = bytes(payload)
            if buf[:4] != _RAW_MAGIC:
                raise ValueError(f"bad raw-RGB magic in doc {doc_id}")
            w = int.from_bytes(buf[4:6], "big")
            h = int.from_bytes(buf[6:8], "big")
            px = np.frombuffer(buf, dtype=np.uint8, offset=8)
            if px.size != w * h * 3:
                raise ValueError(f"truncated raw-RGB in doc {doc_id}")
            sums = px.astype(np.float64).reshape(-1, 3).sum(axis=0)
            n_px = float(w * h)
            rows["doc_id"].append(int(doc_id))
            rows["n_bytes"].append(len(buf))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["features"].append([float(s) / n_px for s in sums])
        if rows["doc_id"]:
            yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error



def decode_media(
    df: DataFrame, encode_row=None, id_col: str = "doc_id"
) -> DataFrame:
    """Decode entry point, Arrow-batched mapInPandas (the production
    shape). EXECUTABLE for the documented raw-RGB format (numpy only —
    header parse, frombuffer, per-channel means as features); real
    codecs (JPEG/PNG/audio) raise NotImplementedError because their
    libraries are not in this container — swap the mime dispatch body
    for PIL/libav calls in production. Means are exact: integer sums in
    float64, one division. ``encode_row`` switches to the fused
    synthesize→decode single-crossing pipeline (fuse_synth_decode)."""
    return _maybe_fuse(
        df, _raw_rgb_feature_batches, FEATURE_SCHEMA, encode_row,
        RAW_RGB_MIME, id_col,
    )


def fake_features(df: DataFrame, n_features: int = 4) -> DataFrame:
    """Deterministic stand-in feature extractor over binary payloads.

    Arrow-batched mapInPandas: each batch arrives as a pandas DataFrame
    with the payload as bytes; features are integer-derived (exact in
    float64) so results are engine-reproducible for the oracle.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are skipped, not decoded: a missing media
            # blob yields no feature row (real pipelines dead-letter
            # these) — map(len) on None crashed the worker otherwise
            # (NULL-probe find, r10).
            pdf = pdf[pdf["payload"].notna()]
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
                if payload is None:
                    # Missing media: no frames (fake_features rule;
                    # NULL-probe find, r10).
                    continue
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
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return df.mapInPandas(_sample, FRAME_SCHEMA)


def encode_raw_rgb_row(doc_id: int) -> bytes:
    """attach_raw_rgb's per-row rule: width = 8 + id%5, height = 6,
    pixel byte i = (id + i) mod 256."""
    return encode_raw_rgb(8 + doc_id % 5, 6, lambda i: doc_id + i)


def attach_raw_rgb(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic raw-RGB fixture encoder: each row becomes a decodable
    media row (payload = raw-RGB bytes with pixel i = (id + i) mod 256,
    width = 8 + id mod 5, height = 6). The arithmetic pixel rule is what
    lets a SQL oracle reproduce the decoded statistics exactly."""
    return _synth_media(df, encode_raw_rgb_row, RAW_RGB_MIME, id_col)


# --- REAL codecs (stdlib/numpy only): WAV audio and PPM images ---------------

WAV_MIME = "audio/x-wav"
PPM_MIME = "image/x-portable-pixmap"

WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_zero_cross", T.LongType()),
    ]
)


def encode_wav_square(doc_id: int, sr: int = 8000) -> bytes:
    """Deterministic PCM16 mono WAV: a square wave with amplitude
    A = 1000 + (id%9)*500, half-period h = 4 + id%5 samples, and
    n = 800 + (id%7)*80 frames. Every feature the decoder must recover
    has a CLOSED FORM in doc_id (|sample| ≡ A ⇒ rms = A exactly; sign
    flips every h samples ⇒ zero crossings = (n-1)//h; duration_us =
    n·10⁶/sr) — which is what lets a SQL oracle check a REAL byte-level
    audio decode."""
    import io
    import struct
    import wave

    amp = 1000 + (doc_id % 9) * 500
    half = 4 + doc_id % 5
    n = 800 + (doc_id % 7) * 80
    samples = [amp if (i // half) % 2 == 0 else -amp for i in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def attach_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Rows → decodable WAV media rows (MEDIA_SCHEMA)."""
    return _synth_media(df, encode_wav_square, WAV_MIME, id_col)


def decode_wav_features(
    df: DataFrame, encode_row=None, id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decode (no stub): the stdlib `wave` parser reads each
    payload's RIFF header and PCM frames inside Arrow-batched
    mapInPandas; numpy computes peak / RMS / zero-crossing count — the
    standard VAD/loudness screening features an audio curation pipeline
    derives per clip. Exactness: samples are ±A ints, so A² sums and the
    final sqrt are exact in float64 (sqrt of a perfect square is
    correctly rounded to the integer) — the oracle states the features
    in closed form. At 100 TB clips decode where they land (pure map,
    payload column pruned for metadata-only queries); batch memory =
    frames × 2 bytes × rows-per-batch, bounded via
    arrow.maxRecordsPerBatch."""
    import io
    import wave

    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k.name: [] for k in WAV_FEATURE_SCHEMA.fields
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != WAV_MIME:
                    raise NotImplementedError(
                        f"no audio decoder for {meta['mime']!r}"
                    )
                # Malformed payloads are DEAD-LETTERED (skipped), never
                # raised — one truncated clip must not kill a 100 TB
                # job (same rule as NULL payloads). validate_media
                # accounts for them upstream (r12 quarantine).
                try:
                    with wave.open(io.BytesIO(bytes(payload))) as w:
                        sr = w.getframerate()
                        n = w.getnframes()
                        if w.getsampwidth() != 2 or w.getnchannels() != 1:
                            raise ValueError(
                                f"doc {doc_id}: only PCM16 mono supported, "
                                f"got width={w.getsampwidth()} "
                                f"ch={w.getnchannels()}"
                            )
                        frames = w.readframes(n)
                        if len(frames) < n * 2:
                            raise EOFError(f"doc {doc_id}: truncated data")
                        x = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                except (Exception,) as exc:  # noqa: BLE001 — dead-letter path
                    if isinstance(exc, NotImplementedError):
                        raise
                    continue
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(n)
                rows["duration_us"].append(n * 1_000_000 // sr)
                rows["peak"].append(int(np.abs(x).max()) if n else 0)
                rows["rms"].append(
                    float(np.sqrt(np.mean(np.square(x.astype(np.float64)))))
                    if n
                    else 0.0
                )
                rows["n_zero_cross"].append(
                    int(np.sum(x[:-1] * x[1:] < 0)) if n > 1 else 0
                )
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return _maybe_fuse(
        df, _decode, WAV_FEATURE_SCHEMA, encode_row, WAV_MIME, id_col
    )


def encode_ppm(doc_id: int) -> bytes:
    """Deterministic P6 PPM (the netpbm standard): w = 16 + id%8,
    h = 8 + id%5, solid (id%256, id·7%256, id·13%256) fill with a white
    main diagonal — per-channel means have the closed form
    (c·(w·h−d) + 255·d) / (w·h), d = min(w,h)."""
    w, h = 16 + doc_id % 8, 8 + doc_id % 5
    r, g, b = doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if x == y:
                px += b"\xff\xff\xff"
            else:
                px += bytes((r, g, b))
    return f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(px)


def attach_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Rows → decodable PPM media rows (MEDIA_SCHEMA)."""
    return _synth_media(df, encode_ppm, PPM_MIME, id_col)


def decode_ppm_features(
    df: DataFrame, encode_row=None, id_col: str = "doc_id"
) -> DataFrame:
    """REAL image decode of a REAL standard format (netpbm P6): header
    grammar parse + numpy frombuffer/reshape + per-channel means —
    byte-level image decoding with no external codec library. JPEG/PNG
    swap into the same mime dispatch when PIL/libvips are present; the
    schema contract, batch shape, and feature math stay identical.
    Integer pixel sums are exact in float64, so the closed-form SQL
    oracle matches bit-for-bit."""
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != PPM_MIME:
                    raise NotImplementedError(
                        f"no image decoder for {meta['mime']!r}"
                    )
                # Dead-letter malformed images (r12 quarantine rule):
                # one bad blob must not kill the job.
                try:
                    buf = bytes(payload)
                    magic, dims, maxval_rest = buf.split(b"\n", 2)
                    if magic != b"P6":
                        raise ValueError(f"bad PPM magic in doc {doc_id}")
                    w, h = (int(v) for v in dims.split())
                    maxval, raw = maxval_rest.split(b"\n", 1)
                    if int(maxval) != 255:
                        raise ValueError("only 8-bit PPM supported")
                    px = np.frombuffer(raw, dtype=np.uint8)
                    if px.size != w * h * 3:
                        raise ValueError(f"truncated PPM in doc {doc_id}")
                except (Exception,):  # noqa: BLE001 — dead-letter path
                    continue
                sums = px.astype(np.float64).reshape(-1, 3).sum(axis=0)
                n_px = float(w * h)
                rows["doc_id"].append(int(doc_id))
                rows["n_bytes"].append(len(buf))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["features"].append([float(s) / n_px for s in sums])
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return _maybe_fuse(
        df, _decode, FEATURE_SCHEMA, encode_row, PPM_MIME, id_col
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def encode_banded_ppm(doc_id: int) -> bytes:
    """attach_banded_ppm's per-row rule: 16×8 P6 PPM, white 2-row band
    at row 2·(id%4) over a solid (id%200, id·7%256, id·13%256) fill."""
    w, h = 16, 8
    r, g, b = doc_id % 200, (doc_id * 7) % 256, (doc_id * 13) % 256
    band = 2 * (doc_id % 4)
    px = bytearray()
    for y in range(h):
        px += (
            b"\xff\xff\xff" * w
            if y in (band, band + 1)
            else bytes((r, g, b)) * w
        )
    return f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(px)


def attach_banded_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Rows → 16×8 P6 PPM media rows with a white 2-row band at row
    2·(id%4) over a per-doc solid fill (id%200, id·7%256, id·13%256).

    The band POSITION is the visual structure; the fill is per-doc
    noise. Because fill gray < 255 always holds, an average-hash's
    threshold keeps exactly the band cells — so images with the same
    band position are visual near-duplicates with DIFFERENT bytes,
    the ground truth the perceptual-hash query verifies against."""
    return _synth_media(df, encode_banded_ppm, PPM_MIME, id_col)


def ahash_ppm(
    df: DataFrame, encode_row=None, id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual average-hash (aHash) over decoded P6 PPM payloads:
    grayscale → 8×8 block-mean downsample → threshold each cell against
    the mean of cell means → 64-bit hash (16 hex chars). Byte-different
    images with the same coarse structure (brightness-shifted fills,
    recompressions) collapse to one hash; hash equality buckets are the
    candidate groups of an image dedup pipeline — the pixel-domain
    analogue of SimHash's one-projection near-dup (operators/simhash.py).
    Pure numpy inside Arrow-batched mapInPandas; at 100 TB this is a
    payload-pruning map followed by a hash groupBy, the cheapest dedup
    shape there is."""
    import hashlib

    import numpy as np

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in AHASH_SCHEMA.fields}
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != PPM_MIME:
                    raise NotImplementedError(
                        f"no image decoder for {meta['mime']!r}"
                    )
                buf = bytes(payload)
                magic, dims, maxval_rest = buf.split(b"\n", 2)
                if magic != b"P6":
                    raise ValueError(f"bad PPM magic in doc {doc_id}")
                w, h = (int(v) for v in dims.split())
                _maxval, raw = maxval_rest.split(b"\n", 1)
                px = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3)
                gray = px.astype(np.float64).reshape(h, w, 3).mean(axis=2)
                # 8×8 block means with integer cell boundaries
                # floor(i·dim/8) — exact for any dim ≥ 8, no resampling
                # library needed.
                ys = [h * i // 8 for i in range(9)]
                xs = [w * i // 8 for i in range(9)]
                cells = np.array(
                    [
                        [
                            gray[ys[r]: ys[r + 1], xs[c]: xs[c + 1]].mean()
                            for c in range(8)
                        ]
                        for r in range(8)
                    ]
                )
                bits = (cells > cells.mean()).flatten()
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                rows["doc_id"].append(int(doc_id))
                rows["ahash"].append(f"{val:016x}")
                rows["payload_md5"].append(hashlib.md5(buf).hexdigest())
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return _maybe_fuse(df, _hash, AHASH_SCHEMA, encode_row, PPM_MIME, id_col)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("dominant_bin", T.LongType()),
        T.StructField("dominant_hz", T.DoubleType()),
        T.StructField("peak", T.LongType()),
    ]
)


def encode_wav_tone(doc_id: int, sr: int = 8000, n: int = 512) -> bytes:
    """Deterministic PCM16 mono WAV: a pure cosine at EXACT FFT bin
    k = 3 + id%17 with amplitude A = 8000 + (id%5)*1000 over n=512
    frames. Because the frequency sits exactly on a bin of the length-n
    DFT, there is no spectral leakage: the rFFT magnitude peaks at bin
    k regardless of int16 quantization (noise power spreads microscopic
    energy across all bins), and cos(0)=1 makes peak == A exactly —
    the closed forms the SQL oracle states."""
    import io
    import math
    import struct
    import wave

    k = 3 + doc_id % 17
    amp = 8000 + (doc_id % 5) * 1000
    samples = [
        int(round(amp * math.cos(2 * math.pi * k * i / n))) for i in range(n)
    ]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def attach_tone_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Rows → decodable pure-tone WAV media rows (MEDIA_SCHEMA)."""
    return _synth_media(df, encode_wav_tone, WAV_MIME, id_col)


def decode_spectral(
    df: DataFrame, encode_row=None, id_col: str = "doc_id"
) -> DataFrame:
    """REAL frequency-domain decode: RIFF-parse each payload and run a
    numpy rFFT inside Arrow-batched mapInPandas, reporting the dominant
    non-DC bin and its frequency — the pitch/bandwidth screening step
    of an audio curation pipeline (and the repo's demonstration that
    heavy numerical kernels belong in vectorized Arrow batches, not
    per-row Python). dominant_hz = bin·sr/n is exact in float64 for
    sr=8000, n=512 (15.625 is a binary fraction). At 100 TB clips
    transform where they land — pure map, no shuffle."""
    import io
    import wave

    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k.name: [] for k in SPECTRAL_SCHEMA.fields
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != WAV_MIME:
                    raise NotImplementedError(
                        f"no audio decoder for {meta['mime']!r}"
                    )
                # Dead-letter malformed clips (r12 quarantine rule).
                try:
                    with wave.open(io.BytesIO(bytes(payload))) as w:
                        sr = w.getframerate()
                        n = w.getnframes()
                        frames = w.readframes(n)
                        if len(frames) < n * 2:
                            raise EOFError(f"doc {doc_id}: truncated data")
                        x = np.frombuffer(frames, dtype="<i2").astype(
                            np.float64
                        )
                except (Exception,) as exc:  # noqa: BLE001 — dead-letter path
                    if isinstance(exc, NotImplementedError):
                        raise
                    continue
                mag = np.abs(np.fft.rfft(x))
                dom = int(np.argmax(mag[1:]) + 1) if n > 1 else 0
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(n)
                rows["dominant_bin"].append(dom)
                rows["dominant_hz"].append(dom * sr / n)
                rows["peak"].append(int(np.abs(x).max()) if n else 0)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return _maybe_fuse(
        df, _decode, SPECTRAL_SCHEMA, encode_row, WAV_MIME, id_col
    )


# --- corruption quarantine (round 12) ----------------------------------------
#
# A 100 TB media corpus ALWAYS contains truncated and garbage blobs; a
# decoder that raises on the first one kills the whole job. The
# production shape is validate-then-decode: `validate_media` classifies
# every payload structurally (cheap header parse + byte accounting,
# pure map, no shuffle), the decode operators DEAD-LETTER what still
# slips through (skip, never crash — same rule as NULL payloads), and
# the pipeline reconciles counts between the two.

QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        # ok | header | payload | unsupported
        T.StructField("status", T.StringType()),
    ]
)


def validate_media(df: DataFrame) -> DataFrame:
    """Structural triage of WAV payloads, Arrow-batched:

    - ``header``: the RIFF/fmt chunk grammar does not parse (bad magic,
      truncated header) — nothing downstream can use the blob;
    - ``payload``: the header parses but the data chunk holds fewer
      bytes than the declared frame count (a truncated upload) —
      metadata is salvageable, samples are not;
    - ``unsupported``: structurally sound but not PCM16 mono — the
      decode operators reject exactly that format (ADVICE r12: triage
      previously called these 'ok' while decode dead-lettered them, so
      the two stages' counts could not reconcile);
    - ``ok``: structurally sound AND decodable (PCM16 mono).

    Classification is deterministic (grammar + byte arithmetic), so a
    corpus with rule-injected corruption has a closed-form oracle."""
    import io
    import wave

    def _validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k.name: [] for k in QUARANTINE_SCHEMA.fields
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != WAV_MIME:
                    raise NotImplementedError(
                        f"no validator for {meta['mime']!r}"
                    )
                raw = bytes(payload) if payload is not None else b""
                rows["doc_id"].append(int(doc_id))
                rows["n_bytes"].append(len(raw))
                rows["status"].append(_triage_wav_raw(raw))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return df.mapInPandas(_validate, QUARANTINE_SCHEMA)


def _triage_wav_raw(raw: bytes) -> str:
    """validate_media's per-payload classification rule (one place, so
    the fused triage pipeline below cannot drift from the operator)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(raw)) as w:
            n = w.getnframes()
            sampwidth = w.getsampwidth()
            channels = w.getnchannels()
            got = len(w.readframes(n))
        if got < n * sampwidth * channels:
            return "payload"
        if sampwidth != 2 or channels != 1:
            return "unsupported"
        return "ok"
    except Exception:
        return "header"


def _corrupt_wav_raw(doc_id: int, raw: bytes) -> bytes:
    """corrupt_tone_wavs' per-payload rule (shared with the fused
    pipeline): doc_id % 4 → 0 intact, 1 magic-flip, 2 data halved,
    3 truncated to 6 bytes."""
    k = int(doc_id) % 4
    if k == 1:
        return b"JUNK" + raw[4:]
    if k == 2:
        return raw[: 44 + (len(raw) - 44) // 2]
    if k == 3:
        return raw[:6]
    return raw


def tone_corruption_triage(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synthesize → corrupt → triage in ONE Python crossing
    (r14, guide §4.1): the q244 pipeline previously chained three
    mapInPandas operators (attach_tone_wav → corrupt_tone_wavs →
    validate_media), so every payload byte crossed the JVM↔Python
    boundary three times and each task ran three Python runners. The
    logic is three pure per-row functions, so one batch loop applies
    them in sequence and only the (doc_id, n_bytes, status) triage rows
    ever return to the JVM — the payload never crosses at all. Uses the
    SAME per-row rules as the standalone operators (shared helpers
    above), so the classification is identical by construction."""
    from .stage import parallelize_stage

    df = parallelize_stage(df)  # Python-side encode is the CPU stage

    def _fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k.name: [] for k in QUARANTINE_SCHEMA.fields
            }
            for doc_id in pdf[id_col]:
                raw = _corrupt_wav_raw(
                    int(doc_id), encode_wav_tone(int(doc_id))
                )
                rows["doc_id"].append(int(doc_id))
                rows["n_bytes"].append(len(raw))
                rows["status"].append(_triage_wav_raw(raw))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return df.select(F.col(id_col)).mapInPandas(_fused, QUARANTINE_SCHEMA)


def corrupt_tone_wavs(df: DataFrame) -> DataFrame:
    """Deterministic corruption injector for quarantine tests/queries:
    by doc_id % 4 — 0 intact, 1 magic bytes replaced (header-dead),
    2 data chunk cut in half (payload-dead), 3 truncated to 6 bytes
    (header-dead). The classes map 1:1 onto validate_media statuses,
    giving q244 its closed-form oracle. The canonical stdlib WAV
    header is 44 bytes, so [:44 + rest//2] keeps the header intact."""

    def _corrupt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _corrupt_wav_raw(int(doc_id), bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield out

    return df.mapInPandas(_corrupt, MEDIA_SCHEMA)


THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),  # re-encoded P6 size
        T.StructField("n_white", T.LongType()),  # diagonal pixels kept
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def resize_ppm_thumbnail(
    df: DataFrame, size: int = 8, encode_row=None, id_col: str = "doc_id"
) -> DataFrame:
    """REAL image resize: P6 decode → nearest-neighbor resample to
    size×size (numpy fancy indexing, no codec library) → P6 re-encode →
    feature row from the RE-ENCODED bytes. The thumbnail/preview step of
    a multimodal ingest pipeline, with the NN convention pinned exactly
    (src_y = i·h div size, src_x = j·w div size) so the closed-form
    oracle can reproduce per-channel means from the generator's
    geometry. Malformed payloads dead-letter (the q244 quarantine rule);
    at 100 TB the resample is pure map-side Arrow-batch work — no
    shuffle, output rows are a fixed 3·size² bytes each regardless of
    input resolution (the property that makes thumbnail tables
    broadcast-friendly downstream)."""
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k.name: [] for k in THUMBNAIL_SCHEMA.fields
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["mime"] != PPM_MIME:
                    raise NotImplementedError(
                        f"no image decoder for {meta['mime']!r}"
                    )
                try:
                    buf = bytes(payload)
                    magic, dims, maxval_rest = buf.split(b"\n", 2)
                    if magic != b"P6":
                        raise ValueError(f"bad PPM magic in doc {doc_id}")
                    w, h = (int(v) for v in dims.split())
                    maxval, raw = maxval_rest.split(b"\n", 1)
                    if int(maxval) != 255:
                        raise ValueError("only 8-bit PPM supported")
                    px = np.frombuffer(raw, dtype=np.uint8)
                    if px.size != w * h * 3:
                        raise ValueError(f"truncated PPM in doc {doc_id}")
                except (Exception,):  # noqa: BLE001 — dead-letter path
                    continue
                img = px.reshape(h, w, 3)
                ys = (np.arange(size) * h) // size
                xs = (np.arange(size) * w) // size
                thumb = img[ys][:, xs]  # nearest-neighbor resample
                out = (
                    f"P6\n{size} {size}\n255\n".encode("ascii")
                    + thumb.tobytes()
                )
                white = int(
                    (thumb == 255).all(axis=2).sum()
                )
                means = thumb.astype(np.float64).reshape(-1, 3).mean(axis=0)
                rows["doc_id"].append(int(doc_id))
                rows["out_w"].append(size)
                rows["out_h"].append(size)
                rows["n_bytes"].append(len(out))
                rows["n_white"].append(white)
                rows["mean_r"].append(float(means[0]))
                rows["mean_g"].append(float(means[1]))
                rows["mean_b"].append(float(means[2]))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)  # empty dict-frame is untyped -> Arrow error

    return _maybe_fuse(
        df, _resize, THUMBNAIL_SCHEMA, encode_row, PPM_MIME, id_col
    )
