"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): treat image/audio/video as
``binary`` columns with a metadata struct, processed by Arrow-batched
``mapInPandas`` — the Spark-side pattern for decode / feature-extract /
resize / frame-sample at scale (each task streams record batches, so
payload memory is bounded by batch size, not partition size; at 100 TB
you tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` down for
large blobs).

``decode_media`` REALLY decodes the two container formats parseable
with the stdlib alone — RIFF/WAVE PCM audio and binary PPM (P6)
images — returning the header metadata plus decoded-content fields.
Codec formats that need real media libraries (JPEG, MP3, H.264, ...)
still raise NotImplementedError: plugging PIL/ffmpeg/soundfile into the
same ``decode=`` hook is the production path. ``binary_features``
keeps its deterministic md5-derived fake feature vector as the default
so the full pipeline — schema, partitioning, UDF signature, Arrow
batch shape — stays oracle-checkable end to end.
"""

from __future__ import annotations

import hashlib
import struct
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


WAV_SAMPLE_RATE = 8000


def synth_wav_payload(
    data: bytes, sample_rate: int = WAV_SAMPLE_RATE, channels: int = 1
) -> bytes:
    """Build a canonical 16-bit PCM RIFF/WAVE file whose sample data is
    ``data`` truncated to whole samples (so n_samples = len(data) // 2,
    restatable in SQL as octet_length // 2). Used to fabricate real,
    spec-valid audio payloads from text tables for decode tests/queries;
    cross-checked against the stdlib ``wave`` reader in unit tests."""
    pcm = data[: len(data) // 2 * 2]
    block_align = channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return header + pcm


def _decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container: walk the chunk list (no fixed
    offsets — fmt/data may come in any order with other chunks between),
    decode the fmt fields, and read the first PCM sample. Spec: the
    public RIFF/WAVE format (also implemented by the stdlib ``wave``
    module, which the unit tests cross-check against)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        if off + 8 + size > len(payload):
            # a truncated payload (or lying chunk size) would otherwise
            # yield a silently short body slice — under-counted samples
            # with no error, and shifted offsets for later chunks
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declares {size} bytes, "
                f"{len(payload) - off - 8} remain"
            )
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # PCM fmt chunk is exactly 16 bytes
                raise ValueError(
                    f"malformed WAVE: fmt chunk is {len(body)} bytes, "
                    "PCM needs 16"
                )
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAVE (format {audio_format})")
    if block_align == 0 or rate == 0:
        # corrupt-but-well-formed fmt values: the clean malformed-WAVE
        # error, not a ZeroDivisionError out of the arithmetic below
        raise ValueError(
            f"malformed WAVE: block_align={block_align}, "
            f"sample_rate={rate} (both must be nonzero)"
        )
    n_samples = len(data) // block_align
    first = (
        struct.unpack_from("<h", data, 0)[0]
        if bits == 16 and len(data) >= 2
        else (data[0] if data else 0)
    )
    return {
        "kind": "audio",
        "n_channels": channels,
        "sample_rate_hz": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_s": n_samples / rate,
        "first_sample": first,
    }


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header: (width, height, maxval, raster offset). The
    offset lets consumers slice the raster FORWARD — a negative slice
    from the payload end would shift every pixel when spec-tolerated
    trailing bytes follow the raster (r13 review finding)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if not 0 < maxval <= 255:
        # maxval > 255 means TWO bytes per sample (16-bit netpbm) —
        # decoding it as one would silently halve every pixel; refuse
        # loudly like the WAV parser does for non-PCM codecs
        raise NotImplementedError(
            f"P6 maxval {maxval}: only 1-byte samples (maxval 1..255) "
            "are supported"
        )
    return width, height, maxval, pos


def _decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) image: ASCII header (magic, width,
    height, maxval, with #-comments allowed) followed by raw RGB
    triplets — the netpbm spec."""
    width, height, maxval, pos = _ppm_header(payload)
    raster = payload[pos : pos + width * height * 3]
    if len(raster) < width * height * 3:
        raise ValueError("truncated PPM raster")
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "maxval": maxval,
        "n_pixels": width * height,
        "first_px": (raster[0], raster[1], raster[2]) if raster else (0, 0, 0),
    }


def synth_bmp_payload(doc_id: int, width: int, height: int) -> bytes:
    """Build a spec-valid uncompressed 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR raster, rows padded to 4 bytes)
    whose pixel bytes follow the same deterministic value function as
    ``synth_ppm_payload`` — (doc_id + x*7 + y*13 + c*29) % 256 with c
    over (B, G, R) in STORED order, y the STORED (bottom-up) row."""
    import numpy as np

    row_bytes = (width * 3 + 3) // 4 * 4
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (
        doc_id + x[None, :, None] * 7 + y[:, None, None] * 13 + c[None, None, :] * 29
    ) % 256
    raster = np.zeros((height, row_bytes), dtype=np.uint8)
    raster[:, : width * 3] = px.astype(np.uint8).reshape(height, width * 3)
    body = raster.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + body


def _decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER
    (the universal 40-byte DIB header), returning dimensions, depth,
    and the first STORED pixel's (B, G, R). Top-down images (negative
    height) normalize to positive dims with the orientation reported.
    Compressed variants (BI_RLE/BI_BITFIELDS...) and palette depths
    refuse loudly, like non-PCM WAVE — real deployments plug PIL in."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression {comp} / {bpp} bpp needs codec libraries; "
            "only uncompressed 24/32-bit parses here"
        )
    top_down = h < 0
    height = -h if top_down else h
    # malformed dims / offsets must refuse loudly, not alias: negative
    # width would yield negative n_pixels, and a pix_off pointing back
    # into the headers would report header bytes as first_px_bgr
    # (r17 ADVICE)
    if w <= 0 or height <= 0:
        raise ValueError(f"invalid BMP dimensions {w}x{height}")
    if pix_off < 14 + hdr_size:
        raise ValueError(
            f"BMP pixel offset {pix_off} points inside the headers "
            f"(first valid {14 + hdr_size})"
        )
    n = bpp // 8
    if pix_off + n > len(payload):
        raise ValueError("truncated BMP raster")
    first = payload[pix_off : pix_off + n]
    return {
        "kind": "image",
        "width": w,
        "height": height,
        "bits_per_pixel": bpp,
        "top_down": top_down,
        "n_pixels": w * height,
        "first_px_bgr": (first[0], first[1], first[2]),
    }


_DECODERS = {
    "audio/wav": _decode_wav,
    "audio/x-wav": _decode_wav,
    "image/bmp": _decode_bmp,
    "image/x-portable-pixmap": _decode_ppm,
}


def decode_media(payload: bytes, mime: str) -> dict:
    """Decode a binary media payload to typed metadata + first decoded
    content values. Real (stdlib-parseable) formats: RIFF/WAVE PCM and
    P6 PPM. Codec formats still raise — real deployments plug
    PIL/ffmpeg/soundfile into ``binary_features(decode=...)`` with this
    exact signature."""
    dec = _DECODERS.get(mime)
    if dec is None:
        raise NotImplementedError(
            f"media decode for {mime!r} requires codec libraries not present "
            "in this environment; plug a decoder into binary_features(decode=...)"
        )
    return dec(payload)


def binary_features(df: DataFrame, decode=None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Default ``decode`` is the deterministic fake: feature j = (j-th md5
    nibble of the payload) / 15.0 — exact in double, reproducible by
    the DuckDB oracle. Pass a real decoder to replace it; the Spark
    plumbing (batch iteration, schema, output shape) is identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a null payload OR null meta struct (null source cells)
            # must drop the row, not TypeError the task — one bad row
            # would kill the whole job (meta guard: r13 ADVICE #3)
            pdf = pdf[pdf["payload"].notna() & pdf["meta"].notna()]
            if pdf.empty:
                # yielding an empty frame would hand Arrow an untyped
                # object column where the schema wants list<double>
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            mimes = [m["mime"] for m in pdf["meta"]]
            digests = [hashlib.md5(p).hexdigest() for p in payloads]
            if decode is None:
                # default fake features come from the SAME digest as
                # payload_md5 — hash each payload once, not twice
                feats = [
                    [int(d[j], 16) / 15.0 for j in range(FEATURE_DIM)]
                    for d in digests
                ]
            else:
                feats = [decode(p, m) for p, m in zip(payloads, mimes)]
            yield pd.DataFrame(
                {
                    "doc_id": list(pdf["doc_id"]),
                    "mime": mimes,
                    "n_bytes": [len(p) for p in payloads],
                    "payload_md5": digests,
                    "feat": feats,
                }
            )

    # one file-split in, per-payload Python work out: spread rows so
    # every core runs an Arrow-batched worker instead of one
    return df.repartition(_fanout_partitions(df), F.col("doc_id")).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


WAV_DECODE_SCHEMA = (
    "doc_id long, n_channels long, sample_rate_hz long, bits_per_sample long, "
    "n_samples long, duration_s double, first_sample long"
)


def wav_decode_features(df: DataFrame) -> DataFrame:
    """Real container decode through the standard multimodal plumbing:
    each row's binary payload is wrapped as a spec-valid RIFF/WAVE PCM
    file (``synth_wav_payload`` — the testdata ships no media, so the
    audio is fabricated from the payload bytes) and then DECODED by the
    chunk-walking WAV parser, per Arrow batch inside mapInPandas. The
    emitted fields all come out of the decoded container — fmt-chunk
    metadata plus the first PCM sample (int16 LE) — so a parser bug
    breaks oracle parity, not just a unit test."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_channels", "sample_rate_hz", "bits_per_sample",
                "n_samples", "duration_s", "first_sample",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # null source cell: drop, not crash
                    continue
                data = bytes(payload)
                if len(data) < 2:  # no whole sample to carry
                    continue
                meta = decode_media(synth_wav_payload(data), "audio/wav")
                rows["doc_id"].append(doc_id)
                rows["n_channels"].append(meta["n_channels"])
                rows["sample_rate_hz"].append(meta["sample_rate_hz"])
                rows["bits_per_sample"].append(meta["bits_per_sample"])
                rows["n_samples"].append(meta["n_samples"])
                rows["duration_s"].append(meta["duration_s"])
                rows["first_sample"].append(meta["first_sample"])
            yield pd.DataFrame(rows)

    return df.repartition(_fanout_partitions(df), F.col("doc_id")).mapInPandas(
        run, schema=WAV_DECODE_SCHEMA
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
                if payload is None:  # null source cell: drop, not crash
                    continue
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


RESAMPLE_SCHEMA = (
    "doc_id long, n_in long, n_out long, rate_in long, rate_out long, "
    "out_first long, out_last long, out_md5 string"
)


def pcm_resample_features(
    df: DataFrame, rate_in: int = WAV_SAMPLE_RATE, rate_out: int = 16000
) -> DataFrame:
    """Deterministic PCM resampling — the sample-rate standardization
    pass an audio training pipeline runs on every clip (everything to
    16 kHz mono before featurization). Linear interpolation over the
    int16 stream, vectorized with numpy inside ``mapInPandas`` (Arrow
    batches, fan-out repartition — the same plumbing as the decoders):
    output grid j * rate_in/rate_out for j in [0, n_out), with
    n_out = floor((n_in-1) * rate_out / rate_in) + 1 so the grid never
    extrapolates past the last input sample. Values are rounded
    half-to-even (np.rint) and clamped to int16 — every step
    deterministic, so the emitted md5 of the resampled byte stream is a
    portable fingerprint (golden-tested against a pure-Python
    reference; no SQL oracle — interpolation is not reasonably
    SQL-expressible, the alignment-walk precedent).

    As with ``wav_decode_features`` the testdata ships no real audio,
    so the PCM stream is fabricated from the payload bytes (int16 LE),
    exactly the byte-interpretation ``synth_wav_payload`` embeds."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_in", "n_out", "rate_in", "rate_out",
                "out_first", "out_last", "out_md5",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # null source cell: drop, not crash
                    continue
                data = bytes(payload)
                n_in = len(data) // 2
                if n_in < 2:  # nothing to interpolate between
                    continue
                x = np.frombuffer(data[: n_in * 2], dtype="<i2").astype(np.float64)
                n_out = (n_in - 1) * rate_out // rate_in + 1
                pos = np.arange(n_out, dtype=np.float64) * rate_in / rate_out
                y = np.interp(pos, np.arange(n_in, dtype=np.float64), x)
                yi = np.clip(np.rint(y), -32768, 32767).astype("<i2")
                rows["doc_id"].append(doc_id)
                rows["n_in"].append(n_in)
                rows["n_out"].append(int(n_out))
                rows["rate_in"].append(rate_in)
                rows["rate_out"].append(rate_out)
                rows["out_first"].append(int(yi[0]))
                rows["out_last"].append(int(yi[-1]))
                rows["out_md5"].append(hashlib.md5(yi.tobytes()).hexdigest())
            yield pd.DataFrame(rows)

    return df.repartition(_fanout_partitions(df), F.col("doc_id")).mapInPandas(
        run, schema=RESAMPLE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id long, in_w long, in_h long, out_w long, out_h long,"
    " n_pixel_bytes long, pixel_sum long, resized_md5 string"
)


def synth_ppm_payload(doc_id: int, width: int, height: int) -> bytes:
    """Build a spec-valid P6 PPM whose pixel bytes are the
    deterministic function (doc_id + x*7 + y*13 + c*29) % 256 — real
    container bytes through the Arrow boundary, with a value function a
    SQL oracle can restate per coordinate (the image analogue of
    ``synth_wav_payload``'s byte-reinterpretation trick)."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    # raster order: rows of RGB triplets -> index (y*W + x)*3 + c
    px = (doc_id + x[None, :, None] * 7 + y[:, None, None] * 13 + c[None, None, :] * 29) % 256
    return (f"P6\n{width} {height}\n255\n").encode() + px.astype(np.uint8).tobytes()


def attach_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fabricate a per-doc P6 payload with doc-dependent dimensions
    in_w = 16 + id % 7, in_h = 12 + id % 5 (both SQL-restatable), as a
    real binary column built inside ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        synth_ppm_payload(i, 16 + i % 7, 12 + i % 5) for i in ids
                    ],
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def ppm_resize_features(df: DataFrame, out_w: int = 8, out_h: int = 6) -> DataFrame:
    """Deterministic nearest-neighbor image resize — the thumbnail /
    fixed-resolution standardization pass a vision training pipeline
    runs on every image (everything to out_w x out_h before patch
    embedding). Source pixel for output (x, y) is
    (sx, sy) = (x*in_w // out_w, y*in_h // out_h) — pure integer
    arithmetic, so the resized pixel SUM restates exactly in SQL over a
    generated coordinate grid, while the emitted md5 of the resized
    raster fingerprints the actual bytes (golden-tested against a
    pure-Python reference; the md5 itself is not SQL-expressible — the
    alignment-walk precedent). The parse + resize is vectorized numpy
    inside ``mapInPandas`` over real P6 container bytes: same Arrow
    batch shape, fan-out repartition, and schema discipline as the
    decoders, which is exactly the plumbing a real image library plugs
    into (swap the nearest-neighbor kernel for PIL/opencv per
    deployment; the container walk and batch contract stay).

    Completes the multimodal verb set: decode (`wav_decode_features` /
    `_decode_ppm`), feature-extract (`binary_features`), frame-sample
    (`frame_sample`), audio resample (`pcm_resample_features`), image
    resize (here).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "in_w", "in_h", "out_w", "out_h",
                "n_pixel_bytes", "pixel_sum", "resized_md5",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # null source cell: drop, not crash
                    continue
                data = bytes(payload)
                in_w, in_h, _maxval, off = _ppm_header(data)
                # forward slice from the header end: a negative slice
                # from the payload end shifts every pixel when
                # spec-tolerated trailing bytes follow the raster, and
                # grabs the whole payload for a 0-pixel image
                raster = data[off : off + in_w * in_h * 3]
                if len(raster) < in_w * in_h * 3:
                    raise ValueError("truncated PPM raster")
                px = np.frombuffer(raster, dtype=np.uint8).reshape(in_h, in_w, 3)
                sx = (np.arange(out_w, dtype=np.int64) * in_w) // out_w
                sy = (np.arange(out_h, dtype=np.int64) * in_h) // out_h
                resized = px[sy][:, sx]  # (out_h, out_w, 3) nearest-neighbor
                rows["doc_id"].append(doc_id)
                rows["in_w"].append(in_w)
                rows["in_h"].append(in_h)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["n_pixel_bytes"].append(int(resized.size))
                rows["pixel_sum"].append(int(resized.astype(np.int64).sum()))
                rows["resized_md5"].append(hashlib.md5(resized.tobytes()).hexdigest())
            yield pd.DataFrame(rows)

    return df.repartition(_fanout_partitions(df), F.col("doc_id")).mapInPandas(
        run, schema=RESIZE_SCHEMA
    )
