"""Multimodal column operators (E3, E6, E10–E12).

Re-expresses the reference image ETL (read OME-TIFF → select channel +
middle-Z 2-D plane → write PNG; reference
``scripts/test_aics_cluster.py:89-101``) as a distributed pipeline over
``binaryFile`` rows:

    scan (binary, path, length) → decode (mapInPandas, Arrow batches)
    → plane-select (slice on the flattened tensor) → per-row sink.

Design rules for 100 TB of media:

- bytes stay opaque ``BinaryType`` cells; decode happens ON EXECUTORS
  inside ``mapInPandas`` — image bytes never pass through the driver;
- tensors travel as flattened ``array<int>`` + a ``shape`` column
  (STCZYX), because Spark cells are 1-D; slicing is index arithmetic
  on the flat layout;
- partitioning: ``binaryFile`` splits by file; media files are
  naturally row-sized units, so parallelism == file count (repartition
  upstream when files >> cores).

Codecs are PLUGGABLE: :func:`decode_images` accepts any
``bytes -> (shape, channel_names, ndarray)`` callable, and the default
:func:`decode_image` dispatches FAKEIMG to the built-in test codec and
real formats to the best importable imaging library (aicsimageio, then
PIL — neither exists in this container, in which case real bytes raise
``NotImplementedError``). The Spark-side plumbing — schema, batching,
slicing, sink — is identical for every codec and fully tested.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic prefix of the deterministic fake image format used by tests:
#:   b"FAKEIMG1" + 6x uint16 big-endian dims (S,T,C,Z,Y,X) + uint8 payload
FAKE_MAGIC = b"FAKEIMG1"

DECODED_SCHEMA = (
    "path string, shape array<int>, channel_names array<string>, pixels array<int>"
)


def encode_fake_image(
    arr: np.ndarray, channel_names: Optional[list[str]] = None
) -> bytes:
    """Serialize a uint8 STCZYX ndarray into the FAKEIMG test format."""
    if arr.ndim != 6:
        raise ValueError("expected STCZYX (6-D) array")
    header = FAKE_MAGIC + struct.pack(">6H", *arr.shape)
    names = ",".join(channel_names or [f"c{i}" for i in range(arr.shape[2])]).encode()
    return header + struct.pack(">H", len(names)) + names + arr.astype(np.uint8).tobytes()


#: A codec adapter: bytes -> (STCZYX shape, channel names, ndarray).
Decoder = Callable[[bytes], tuple[tuple[int, ...], list[str], np.ndarray]]


def _real_codec_adapter() -> Optional[Decoder]:
    """Best-available real-format decoder, or None when no imaging
    library is importable (this container has none). Mirrors the
    reference's production decode (aicsimageio OME-TIFF,
    ``scripts/test_aics_cluster.py:91-96``): aicsimageio yields the
    native STCZYX axes; PIL falls back to a 2-D (Y, X) plane lifted
    into STCZYX with a single channel."""
    try:
        from aicsimageio import AICSImage  # noqa: F401  (absent here)

        def _aics(content: bytes):
            import io

            img = AICSImage(io.BytesIO(content))
            arr = img.get_image_data("STCZYX")
            names = [str(c) for c in (img.channel_names or [])] or [
                f"c{i}" for i in range(arr.shape[2])
            ]
            return tuple(arr.shape), names, arr

        return _aics
    except ImportError:
        pass
    try:
        from PIL import Image  # noqa: F401  (absent here)

        def _pil(content: bytes):
            import io

            arr = np.asarray(Image.open(io.BytesIO(content)).convert("L"))
            stczyx = arr[np.newaxis, np.newaxis, np.newaxis, np.newaxis, :, :]
            return tuple(stczyx.shape), ["c0"], stczyx

        return _pil
    except ImportError:
        pass
    return None


def decode_image(content: bytes) -> tuple[tuple[int, ...], list[str], np.ndarray]:
    """Decode one image: FAKEIMG via the built-in test codec, anything
    else via the best importable real-format adapter (aicsimageio,
    then PIL). Raises ``NotImplementedError`` only when the bytes are
    a real format AND no imaging library exists in the environment."""
    if content[:8] == FAKE_MAGIC:
        shape = struct.unpack(">6H", content[8:20])
        (nlen,) = struct.unpack(">H", content[20:22])
        names = content[22 : 22 + nlen].decode().split(",")
        pixels = np.frombuffer(
            content[22 + nlen :], dtype=np.uint8, count=int(np.prod(shape))
        )
        return shape, names, pixels.reshape(shape)
    real = _real_codec_adapter()
    if real is not None:
        return real(content)
    raise NotImplementedError(
        "real image codecs (OME-TIFF/PNG/...) are unavailable in this "
        "environment; only the FAKEIMG test format decodes. Install "
        "aicsimageio or PIL, or pass decode_images(..., decoder=...)"
    )


def decode_images(binary_df: DataFrame, decoder: Optional[Decoder] = None) -> DataFrame:
    """binaryFile rows -> (path, shape, channel_names, pixels) via
    Arrow-batched mapInPandas (E10).

    ``decoder`` injects a codec — any callable
    ``bytes -> (shape, channel_names, ndarray)`` — so real imaging
    libraries plug into the SAME distributed path as the test format
    (decode on executors, flat int32 pixels + shape column out).
    Default: :func:`decode_image` (FAKEIMG + best importable real
    codec). The callable is serialized to executors; keep it
    import-light (import the imaging lib inside the function body)."""
    decode_one = decoder or decode_image

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "shape": [], "channel_names": [], "pixels": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                shape, names, arr = decode_one(bytes(content))
                out["path"].append(path)
                out["shape"].append(list(shape))
                out["channel_names"].append(names)
                out["pixels"].append(np.asarray(arr).ravel().astype(np.int32))
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(
        decode_batch, schema=DECODED_SCHEMA
    )


def select_plane(
    decoded: DataFrame, channel_name: str = None, s: int = 0, t: int = 0
) -> DataFrame:
    """Select (S=s, T=t, C=channel, Z=middle) -> 2-D YX plane, as the
    reference does (``test_aics_cluster.py:94-96``), with pure column
    arithmetic on the flattened tensor — no second decode pass (E11)."""
    sh = F.col("shape")
    dim = {n: F.element_at(sh, i + 1).cast("long") for i, n in enumerate("STCZYX")}
    c_idx = (
        F.array_position(F.col("channel_names"), channel_name) - 1
        if channel_name
        else F.lit(0)
    )
    z_idx = F.floor(dim["Z"] / 2)
    plane_len = dim["Y"] * dim["X"]
    offset = (
        ((F.lit(s) * dim["T"] + F.lit(t)) * dim["C"] + c_idx) * dim["Z"] + z_idx
    ) * plane_len
    return decoded.select(
        "path",
        F.element_at(sh, 5).alias("height"),
        F.element_at(sh, 6).alias("width"),
        F.slice(
            F.col("pixels"), (offset + 1).cast("int"), plane_len.cast("int")
        ).alias("plane"),
    )


def sample_frames(decoded: DataFrame, every_n: int = 1, s: int = 0) -> DataFrame:
    """Video-style frame sampling (E11 for the time axis): emit every
    Nth T-frame as its own row, each frame the full (C,Z,Y,X) block at
    that timestep. Pure column arithmetic on the flat STCZYX layout —
    sequence+explode generates the sampled timesteps and slice cuts the
    block, so the whole op stays in whole-stage codegen; the decoded
    bytes are never re-decoded or copied through Python. At 100 TB the
    explode is the parallelism win: one input video fans out to
    per-frame rows that downstream feature extraction processes
    independently."""
    sh = F.col("shape")
    dim = {n: F.element_at(sh, i + 1).cast("long") for i, n in enumerate("STCZYX")}
    block = dim["C"] * dim["Z"] * dim["Y"] * dim["X"]
    ts = F.sequence(F.lit(0).cast("long"), dim["T"] - 1, F.lit(every_n).cast("long"))
    offset = (F.lit(s) * dim["T"] + F.col("t")) * block
    return (
        decoded.select("path", "shape", "pixels", F.explode(ts).alias("t"))
        .select(
            "path",
            F.col("t").cast("int").alias("t"),
            F.slice(
                F.col("pixels"), (offset + 1).cast("int"), block.cast("int")
            ).alias("frame"),
        )
    )


def resize_plane_nn(
    planes: DataFrame, factor: int, plane_col: str = "plane"
) -> DataFrame:
    """Nearest-neighbor downsample of a 2-D plane by an integer factor
    (the resize step of the media pipeline), as index arithmetic over
    the flat row-major plane: out(r, c) = in(r*factor, c*factor).
    Built-in transform/element_at only — no UDF, no Python."""
    h = F.col("height").cast("long")
    w = F.col("width").cast("long")
    out_h = F.floor(h / factor)
    out_w = F.floor(w / factor)
    idx = F.sequence(F.lit(0).cast("long"), out_h * out_w - 1)
    picked = F.transform(
        idx,
        lambda i: F.element_at(
            F.col(plane_col),
            (
                F.floor(i / out_w) * factor * w + (i % out_w) * factor + 1
            ).cast("int"),
        ),
    )
    # Output columns get temp names first: aliasing `width` in the same
    # select would LATERALLY capture the `width` reference inside the
    # transform lambda (Spark resolves lateral column aliases before
    # input columns), silently resizing against the output width.
    return planes.select(
        "path",
        out_h.cast("int").alias("__out_h"),
        out_w.cast("int").alias("__out_w"),
        picked.alias("plane"),
    ).withColumnsRenamed({"__out_h": "height", "__out_w": "width"})


def channel_features(decoded: DataFrame) -> DataFrame:
    """Per-channel feature extraction (the stats step of the media
    pipeline): one row per (image, channel) with the channel's pixel
    sum and mean, computed by slicing the channel block out of the
    flat STCZYX layout and folding it JVM-side (sequence+explode over
    channel indices, slice + aggregate over the block) — no second
    decode, no Python. Integer pixel sums keep the result exact; the
    mean is one division at the end."""
    sh = F.col("shape")
    dim = {n: F.element_at(sh, i + 1).cast("long") for i, n in enumerate("STCZYX")}
    block = dim["Z"] * dim["Y"] * dim["X"]
    cidx = F.explode(F.sequence(F.lit(0).cast("long"), dim["C"] - 1)).alias("c")
    offset = F.col("c") * block  # s=0, t=0 volume
    px_sum = F.aggregate(
        F.slice(F.col("pixels"), (offset + 1).cast("int"), block.cast("int")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        decoded.select("path", "shape", "pixels", "channel_names", cidx)
        .select(
            "path",
            F.element_at(F.col("channel_names"), (F.col("c") + 1).cast("int")).alias(
                "channel"
            ),
            px_sum.alias("sum_px"),
            (px_sum.cast("double") / block).alias("mean_px"),
        )
    )


def write_planes(
    planes: DataFrame, out_dir: str, encoder: Optional[Callable] = None
) -> int:
    """Per-row file sink (E6): writes each plane from the executors
    (reference writes one PNG per row). PNG encoding itself is stubbed
    to raw bytes unless an ``encoder(plane_bytes, h, w) -> bytes`` is
    supplied."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def sink(rows):
        for row in rows:
            data = bytes(bytearray(v % 256 for v in row["plane"]))
            if encoder is not None:
                data = encoder(data, row["height"], row["width"])
            name = os.path.basename(row["path"]) + ".plane.bin"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(data)

    planes.foreachPartition(sink)
    return len([None])


def binary_meta(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Typed metadata over opaque binary cells: size, sha256, magic
    prefix — the cheap pre-decode pruning pass (E10)."""
    b = F.col(bin_col)
    return df.select(
        *df.columns,
        F.length(b).alias("byte_len"),
        F.sha2(b, 256).alias("sha256_hex"),
        F.lower(F.hex(F.substring(b, 1, 8))).alias("magic_hex"),
    )


#: magic prefix of the deterministic fake audio format:
#:   b"FAKEAUD1" + uint32 BE n_samples + uint8 sample bytes
#:   (decoded sample value = byte - 100, a signed 8-bit-ish PCM).
FAKE_AUDIO_MAGIC = b"FAKEAUD1"

AUDIO_SCHEMA = "path string, n_samples int, samples array<int>"


def encode_fake_audio(samples: np.ndarray) -> bytes:
    """Serialize int samples (range [-100, 155]) into FAKEAUD bytes."""
    arr = np.asarray(samples).astype(np.int32) + 100
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("samples out of FAKEAUD range")
    return (
        FAKE_AUDIO_MAGIC
        + struct.pack(">I", len(arr))
        + arr.astype(np.uint8).tobytes()
    )


def decode_audio(content: bytes) -> np.ndarray:
    """Decode FAKEAUD bytes to centered int32 samples. Real audio
    codecs (wav/flac/mp3 via soundfile/librosa — absent here) plug in
    through the ``decoder`` argument of :func:`decode_audios`, exactly
    like the image codec adapter."""
    if content[:8] != FAKE_AUDIO_MAGIC:
        raise NotImplementedError(
            "real audio codecs are unavailable in this environment; only "
            "FAKEAUD decodes. Pass decode_audios(..., decoder=...)"
        )
    (n,) = struct.unpack(">I", content[8:12])
    return np.frombuffer(content[12 : 12 + n], dtype=np.uint8).astype(np.int32) - 100


def decode_audios(binary_df: DataFrame, decoder=None) -> DataFrame:
    """binaryFile rows -> (path, n_samples, samples) via Arrow-batched
    mapInPandas — the audio twin of :func:`decode_images`: bytes decode
    ON EXECUTORS, the signal travels as a flat array<int> column."""
    decode_one = decoder or decode_audio

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "n_samples": [], "samples": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                arr = decode_one(bytes(content))
                out["path"].append(path)
                out["n_samples"].append(len(arr))
                out["samples"].append(arr.astype(np.int32))
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(
        decode_batch, schema=AUDIO_SCHEMA
    )


def frame_audio(decoded: DataFrame, frame_len: int, hop: int) -> DataFrame:
    """Split each signal into hop-spaced frames (the STFT-style framing
    every audio featurizer starts with): one row per frame, cut by
    sequence+explode+slice column arithmetic — no re-decode, no Python
    in the framing path. Frames that would run past the end are
    dropped (count = floor((n - frame_len) / hop) + 1)."""
    n = F.col("n_samples").cast("long")
    n_frames = F.floor((n - frame_len) / hop) + 1
    fr = F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias(
        "frame_idx"
    )
    return decoded.select("path", "samples", fr).select(
        "path",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.slice(
            F.col("samples"),
            (F.col("frame_idx") * hop + 1).cast("int"),
            frame_len,
        ).alias("frame"),
    )


def audio_frame_features(framed: DataFrame, frame_len: int) -> DataFrame:
    """Per-frame signal features: RMS energy, peak amplitude, and
    zero-crossing count — the classic VAD/silence-trim triple. Integer
    sums keep the energy exact until one final sqrt; everything is
    JVM higher-order folds (E60 for the audio axis)."""
    sq_sum = F.aggregate(
        F.transform(F.col("frame"), lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    zc = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(frame_len - 1)),
            lambda p: F.element_at(F.col("frame"), p) * F.element_at(F.col("frame"), p + 1) < 0,
        )
    )
    return framed.select(
        "path",
        "frame_idx",
        F.sqrt(sq_sum.cast("double") / F.lit(float(frame_len))).alias("energy_rms"),
        F.array_max("frame").alias("peak"),
        zc.cast("bigint").alias("zero_crossings"),
    )
