"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): treat image/audio/video as
``binary`` columns with a metadata struct, processed by Arrow-batched
``mapInPandas`` — the Spark-side pattern for decode / feature-extract /
resize / frame-sample at scale (each task streams record batches, so
payload memory is bounded by batch size, not partition size; at 100 TB
you tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` down for
large blobs).

The actual media decode is STUBBED (no image/audio libs in this
container): ``decode_media`` raises NotImplementedError by design, and
``binary_features`` computes a deterministic md5-derived fake feature
vector so the full pipeline — schema, partitioning, UDF signature,
Arrow batch shape — is real and oracle-checkable end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import fanout_partitions as _fanout_partitions

FEATURE_DIM = 4

FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes long, payload_md5 string, feat array<double>"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fabricate the multimodal shape from a text table: payload =
    utf-8 bytes, metadata struct (mime, n_bytes). With real media the
    payload would come off object storage via a binaryFile scan."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias(
                "n_bytes"
            ),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """Decode stub: real deployments plug PIL/ffmpeg/soundfile here."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present "
        "in this environment; plug a decoder into binary_features(decode=...)"
    )


def binary_features(df: DataFrame, decode=None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Default ``decode`` is the deterministic fake: feature j = (j-th md5
    nibble of the payload) / 15.0 — exact in double, reproducible by
    the DuckDB oracle. Pass a real decoder to replace it; the Spark
    plumbing (batch iteration, schema, output shape) is identical.
    """

    def fake_decode(payload: bytes, mime: str) -> list[float]:
        digest = hashlib.md5(payload).hexdigest()
        return [int(digest[j], 16) / 15.0 for j in range(FEATURE_DIM)]

    extract = decode or fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            mimes = [m["mime"] for m in pdf["meta"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": mimes,
                    "n_bytes": [len(p) for p in payloads],
                    "payload_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "feat": [extract(bytes(p), m) for p, m in zip(payloads, mimes)],
                }
            )

    # one file-split in, per-payload Python work out: spread rows so
    # every core runs an Arrow-batched worker instead of one
    return df.repartition(_fanout_partitions(df), F.col("doc_id")).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_md5 string, frame_bytes long"


def frame_sample(
    df: DataFrame, width: int = 64, stride: int = 256, extract=None
) -> DataFrame:
    """Fixed-rate frame sampling over binary payloads — the video
    frame-grab / audio windowing shape: each payload fans out into
    its full-width frames at ``stride`` intervals (a 1:N mapInPandas,
    so output batches are streamed, not held per-partition).

    Default ``extract`` fingerprints each frame (md5 of the byte
    slice) — deterministic and oracle-checkable; a real deployment
    plugs a decoder emitting pixel/PCM features per frame with the
    identical Spark plumbing."""

    def fake_extract(frame: bytes) -> str:
        return hashlib.md5(frame).hexdigest()

    fp = extract or fake_extract

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sigs: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for j, start in enumerate(range(0, len(data) - width + 1, stride)):
                    ids.append(doc_id)
                    idxs.append(j)
                    sigs.append(fp(data[start : start + width]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_md5": sigs,
                    "frame_bytes": [width] * len(ids),
                }
            )

    return df.repartition(_fanout_partitions(df), F.col("doc_id")).mapInPandas(
        run, schema=FRAMES_SCHEMA
    )
