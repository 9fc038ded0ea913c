"""Multimodal column plumbing (SURVEY.md §2.11).

Images / audio / video ride through the engine as opaque ``binary`` columns
with typed metadata structs — every relational operator (filter, join,
partition, dedup) works on the metadata while the payload stays untouched
bytes. Decode / feature-extraction runs as Arrow-batched ``mapInPandas``
stages: the Spark-side contract (schema, batch shape, partitioning) is real
and tested; the actual codec call is stubbed behind ``DECODERS`` because
image/audio libraries aren't in this container — swap the stub for
PIL/torchaudio/ffmpeg in production and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of a multimodal asset row: payload + typed metadata.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),       # image | audio | video
    StructField("content", BinaryType()),        # opaque payload
    StructField("media_format", StringType()),   # e.g. png, wav, mp4
])

META_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),
    StructField("media_format", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("width", IntegerType()),         # image/video; None otherwise
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),   # audio/video; None otherwise
])


def _decode_stub(modality: str, fmt: str, payload: bytes) -> dict:
    """Deterministic fake decoder. Real deployments replace this with
    PIL.Image.open / soundfile / pyav; the surrounding Spark plumbing
    (schemas, batching, partitioning) is identical either way."""
    h = hashlib.sha256(payload or b"").digest()
    if modality == "image":
        return {"width": 16 + h[0] % 64, "height": 16 + h[1] % 64,
                "duration_ms": None}
    if modality in ("audio", "video"):
        return {"width": (16 + h[0] % 64) if modality == "video" else None,
                "height": (16 + h[1] % 64) if modality == "video" else None,
                "duration_ms": 1000 + int.from_bytes(h[2:4], "big") % 60000}
    raise NotImplementedError(f"unknown modality: {modality}")


DECODERS = {"image": _decode_stub, "audio": _decode_stub, "video": _decode_stub}


def extract_metadata(assets: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched metadata extraction over the binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the UDF
    emits the typed metadata frame. No shuffle — this is a narrow map stage
    that parallelizes per input partition, the right shape for decoding
    billions of assets.

    The default UDF is deliberately **self-contained** (stdlib imports
    inside, no references to this module): cloudpickle then ships it by
    value, so Spark's Python workers don't need this package on their
    PYTHONPATH — the driver harness imports `__spark_entry__` by file path,
    and nothing guarantees workers can import us. A custom `decoder`
    callable may be passed, with the same self-containment caveat.
    """
    cols = [f.name for f in META_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _decode(modality, fmt, payload):
            h = _hashlib.sha256(payload or b"").digest()
            if modality == "image":
                return {"width": 16 + h[0] % 64, "height": 16 + h[1] % 64,
                        "duration_ms": None}
            if modality in ("audio", "video"):
                return {
                    "width": (16 + h[0] % 64) if modality == "video" else None,
                    "height": (16 + h[1] % 64) if modality == "video" else None,
                    "duration_ms": 1000 + int.from_bytes(h[2:4], "big") % 60000,
                }
            raise NotImplementedError(f"unknown modality: {modality}")

        dec = decoder or _decode
        for pdf in batches:
            meta = []
            # column-wise zip, not iterrows — ~5x less per-row overhead in
            # the decode loop that dominates at billions of assets
            for aid, mod, fmt, content in zip(
                    pdf["asset_id"], pdf["modality"],
                    pdf["media_format"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                d = dec(mod, fmt, payload)
                meta.append({
                    "asset_id": aid,
                    "modality": mod,
                    "media_format": fmt,
                    "n_bytes": len(payload),
                    "sha256": _hashlib.sha256(payload).hexdigest(),
                    **d,
                })
            yield _pd.DataFrame(meta, columns=cols)

    return assets.mapInPandas(run, schema=META_SCHEMA)


def exact_dedup_assets(assets: DataFrame) -> DataFrame:
    """Byte-identical asset dedup: group on the payload hash (computed
    JVM-side — sha2 over binary is a built-in, the 8-byte-ish key shuffles
    instead of the payload)."""
    return (
        assets.withColumn("content_hash", F.sha2("content", 256))
        .groupBy("content_hash")
        .agg(F.min("asset_id").alias("keeper_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


def frame_sample_stub(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes each video asset into
    (asset_id, frame_idx, frame_ts_ms) rows using the stub-decoded duration.
    The real frame extraction (bytes per frame) is the stubbed step; the
    row-multiplying plan — metadata decode → sequence → explode — is the
    production shape."""
    meta = extract_metadata(assets.filter(F.col("modality") == "video"))
    return (
        meta.select(
            "asset_id",
            F.posexplode(
                F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
            ).alias("frame_idx", "step"),
        )
        .select("asset_id", "frame_idx",
                (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
    )


def zscore_per_group(df: DataFrame, group_col: str, value_col: str,
                     id_col: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score standardization — the
    plain (stateless) grouped-pandas surface, complementing mapInPandas
    (extract_metadata) and applyInPandasWithState (streaming/stateful).

    Chosen because per-group normalization is the canonical 'needs the
    whole group as one pandas frame' operation (feature scaling before
    embedding training). Self-contained UDF, same worker-PYTHONPATH
    rationale as extract_metadata.
    """
    from pyspark.sql.types import (
        DoubleType as _D,
    )
    from pyspark.sql.types import (
        StructField as _SF,
    )
    from pyspark.sql.types import (
        StructType as _ST,
    )

    out_schema = _ST([
        df.schema[id_col],
        df.schema[group_col],
        _SF("zscore", _D()),
    ])
    idc, grpc, valc = id_col, group_col, value_col

    def standardize(pdf):
        import pandas as _pd
        m = pdf[valc].mean()
        s = pdf[valc].std(ddof=1)
        z = (pdf[valc] - m) / s if s and s > 0 else pdf[valc] * 0.0
        return _pd.DataFrame({idc: pdf[idc], grpc: pdf[grpc], "zscore": z})

    return df.groupBy(group_col).applyInPandas(standardize, schema=out_schema)


RESIZED_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),
    StructField("media_format", StringType()),
    StructField("content", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def resize_stub(assets: DataFrame, max_dim: int = 32) -> DataFrame:
    """Image resize as a payload-TRANSFORMING mapInPandas stage — the
    binary-in/binary-out shape extract_metadata (metadata-only output)
    doesn't exercise. Aspect ratio preserved with integer math; the pixel
    resample itself is the stubbed step (real deployments put
    PIL.Image.resize here), faked deterministically by truncating the
    payload proportionally to the area change so output bytes are a pure
    function of input. Narrow stage, no shuffle: per-partition Arrow
    batches in, transformed batches out."""
    mx = max_dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        out_cols = ["asset_id", "modality", "media_format", "content",
                    "width", "height"]
        for pdf in batches:
            rows = []
            for aid, mod, fmt, content in zip(
                    pdf["asset_id"], pdf["modality"],
                    pdf["media_format"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                h = _hashlib.sha256(payload).digest()
                w, ht = 16 + h[0] % 64, 16 + h[1] % 64
                scale = min(1.0, mx / max(w, ht))
                nw, nh = max(1, int(w * scale)), max(1, int(ht * scale))
                keep = max(1, int(len(payload) * (nw * nh) / (w * ht))) \
                    if payload else 0
                rows.append({"asset_id": aid, "modality": mod,
                             "media_format": fmt,
                             "content": payload[:keep],
                             "width": nw, "height": nh})
            yield _pd.DataFrame(rows, columns=out_cols)

    return (assets.filter(F.col("modality") == "image")
            .mapInPandas(run, schema=RESIZED_SCHEMA))


def embed_stub(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: every asset → a unit-norm float vector derived
    deterministically from its payload bytes (sha256 stream → centered
    bytes → L2 normalize). The stubbed step is the model forward pass
    (CLIP/wav2vec in production); the Spark shape — Arrow-batched
    mapInPandas emitting array<float> — is exactly what feeds the
    similarity/ANN operators (operators/similarity.py), closing the
    multimodal → embedding → dedup/search loop."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType([
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    d = dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math as _math

        import pandas as _pd

        for pdf in batches:
            rows = []
            for aid, mod, content in zip(
                    pdf["asset_id"], pdf["modality"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                raw = _hashlib.sha256(payload).digest()
                while len(raw) < d:
                    raw += _hashlib.sha256(raw).digest()
                v = [raw[i] - 127.5 for i in range(d)]
                n = _math.sqrt(sum(x * x for x in v)) or 1.0
                rows.append({"asset_id": aid, "modality": mod,
                             "embedding": [x / n for x in v]})
            yield _pd.DataFrame(rows,
                                columns=["asset_id", "modality", "embedding"])

    return assets.mapInPandas(run, schema=out_schema)
