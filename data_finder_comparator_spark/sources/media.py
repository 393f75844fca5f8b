"""Real-media folder ingestion: ``binaryFile`` scan → the engine's
multimodal shape.

The multimodal operators (`operators/multimodal.py`) process opaque
binary payloads + a typed metadata struct; their docstrings note that
with real media "the payload would come off object storage via a
binaryFile scan". This module IS that connector: a folder of media
files becomes the standard ``(doc_id, path, payload, meta{mime,
n_bytes})`` frame with one distributed ``binaryFile`` scan — mime
derived from the extension JVM-side, ``doc_id`` a deterministic
xxhash64 of the path (stable across re-scans of the same layout), no
Python in the scan. ``media_decode`` then runs the stdlib container
parsers (RIFF/WAVE PCM, P6 PPM — see ``decode_media``) over the REAL
file bytes per Arrow batch.

At 100 TB: binaryFile is a plain distributed source (each file one
row, spark.sql.files.maxPartitionBytes batching small files per task);
payload memory is bounded by Arrow batch size in the decode stage, and
the scan carries only the requested columns (binaryFile supports
``pathGlobFilter`` pruning at listing time).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # decode-stage batches only; see media_decode
    import pandas as pd

# pandas is deliberately NOT imported at module level: this module is
# on the import path of every Python data-source worker (sources/
# __init__ → media → lakehouse_source unpickling), and a module-level
# pandas pulls ~7 s of pandas+numpy import into each COLD worker fork
# (create_data_source / plan_data_source_read / stream runner) that
# never touches media. The only runtime use is inside media_decode's
# mapInPandas closure, where the Arrow-eval worker has pandas loaded
# anyway (measured r18: lakehouse_source import 8.8 s → ~1 s).

# extension → mime for the formats a training pipeline meets; unknown
# extensions map to application/octet-stream (the payload still flows —
# refusing here would make a folder with one stray file unreadable;
# the DECODE stage is where unsupported mimes refuse loudly)
_EXT_MIME = {
    "bmp": "image/bmp",
    "flac": "audio/flac",
    "gif": "image/gif",
    "jpeg": "image/jpeg",
    "jpg": "image/jpeg",
    "mkv": "video/x-matroska",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "ogg": "audio/ogg",
    "png": "image/png",
    "ppm": "image/x-portable-pixmap",
    "wav": "audio/wav",
    "webm": "video/webm",
}

MEDIA_SCHEMA = (
    "doc_id long, path string, payload binary, "
    "meta struct<mime string, n_bytes long>"
)

DECODED_SCHEMA = (
    "doc_id long, path string, mime string, kind string, "
    "n_bytes long, decoded string"
)


def _to_media_shape(df: DataFrame) -> DataFrame:
    """Project a ``binaryFile`` frame (batch or streaming — the source
    schema is identical) into the engine's multimodal shape. Every
    expression is JVM-side; ``doc_id`` is ``xxhash64(path)`` —
    deterministic and collision-checked by the caller if paths are
    adversarial (2^64 space)."""
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(_EXT_MIME.items()) for x in kv]
    )
    return df.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.col("path"),
        F.col("content").alias("payload"),
        F.struct(
            F.coalesce(
                # try_element_at: NULL (not an ANSI key error) for an
                # unknown extension, so the coalesce falls through
                F.try_element_at(mapping, ext),
                F.lit("application/octet-stream"),
            ).alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def read_media_folder(
    spark: SparkSession,
    folder: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """One distributed ``binaryFile`` scan over *folder* in the
    multimodal shape. ``glob`` prunes at LISTING time
    (``pathGlobFilter`` — e.g. ``"*.wav"``), so excluded files are
    never opened. ``recursive`` turns on ``recursiveFileLookup`` for
    the nested layouts real corpora use (``images/2024/01/...``) —
    the glob still applies to the leaf file names."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return _to_media_shape(reader.load(folder))


def stream_media_folder(
    spark: SparkSession,
    folder: str,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
    recursive: bool = False,
) -> DataFrame:
    """The STREAMING twin of ``read_media_folder`` — continuously
    arriving media (a crawler drop folder, an upload bucket) through
    Structured Streaming's file source with the same ``binaryFile``
    format, same listing-time glob pruning, and the same output shape,
    so ``media_decode`` composes unchanged on the streaming frame.

    The file source's checkpoint tracks processed files, so each file
    is decoded EXACTLY ONCE across restarts — the property a drop
    folder needs (re-listing must not re-decode yesterday's corpus).
    ``max_files_per_trigger`` is the standard backpressure bound: at
    100 TB a first catch-up run would otherwise plan every historical
    file into one enormous micro-batch."""
    # the streaming file source requires an explicit schema; binaryFile's
    # is FIXED by the format, so declaring it loses nothing
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return _to_media_shape(reader.load(folder))


def media_decode(df: DataFrame, on_unsupported: str = "error") -> DataFrame:
    """Decode REAL container bytes through ``decode_media`` per Arrow
    batch: each row's payload is parsed under its ``meta.mime``
    (RIFF/WAVE PCM and P6 PPM have stdlib parsers; codec formats
    refuse via ``NotImplementedError`` — the documented loud
    boundary). Output is ``(doc_id, path, mime, kind, n_bytes,
    decoded)`` — path and the connector's byte count ride along so a
    downstream consumer (or a driver row projecting per-file fields)
    needs no join back to the scan, which would re-list and re-read
    the folder (r17 review) — with ``decoded`` the sorted-keys JSON of
    the decoder's dict, so wav and ppm rows share one stable schema.

    ``on_unsupported``: ``"error"`` (default) propagates the decoder's
    refusal — a folder with an undecodable file fails loudly;
    ``"skip"`` is the explicit opt-in for mixed folders, dropping
    undecodable rows (never silent: it must be asked for). Null
    payload/meta rows drop, as in every multimodal entry point."""
    if on_unsupported not in ("error", "skip"):
        raise ValueError(f"on_unsupported must be error|skip, got {on_unsupported!r}")
    from ..operators.multimodal import decode_media

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # worker-side; already loaded by Arrow eval

        cols = ("doc_id", "path", "mime", "kind", "n_bytes", "decoded")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for doc_id, path, payload, meta in zip(
                pdf["doc_id"], pdf["path"], pdf["payload"], pdf["meta"]
            ):
                if payload is None or meta is None:
                    continue
                if isinstance(meta, dict):
                    mime, n_bytes = meta["mime"], meta["n_bytes"]
                else:
                    mime, n_bytes = meta.mime, meta.n_bytes
                try:
                    d = decode_media(bytes(payload), mime)
                except NotImplementedError:
                    if on_unsupported == "skip":
                        continue
                    raise
                rows["doc_id"].append(doc_id)
                rows["path"].append(path)
                rows["mime"].append(mime)
                rows["kind"].append(d.get("kind"))
                rows["n_bytes"].append(n_bytes)
                rows["decoded"].append(json.dumps(d, sort_keys=True))
            yield pd.DataFrame(rows)

    # NO fan-out repartition here, unlike the operators/multimodal.py
    # entry points: those fabricate payloads from few-partition text
    # frames and must spread the work, but a binaryFile scan is already
    # file-parallel (maxPartitionBytes batches small files per task) —
    # repartitioning would shuffle every media byte for nothing
    # (r16 review)
    return df.mapInPandas(run, schema=DECODED_SCHEMA)
