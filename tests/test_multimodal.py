"""Multimodal pipeline test: the reference image ETL re-expressed on
Spark (binaryFile scan -> mapInPandas decode -> plane select -> per-row
sink), over generated FAKEIMG files.

Mirrors reference ``scripts/test_aics_cluster.py:89-101``: read image,
select the 'structure' channel and the middle Z slice as a 2-D YX
plane, write one output file per row.
"""

import os

import numpy as np
import pytest

from aics_dask_utils_spark.operators.multimodal import (
    decode_image,
    decode_images,
    encode_fake_image,
    select_plane,
    write_planes,
)
from aics_dask_utils_spark.sources import read_binary_files

SHAPE = (1, 1, 3, 5, 8, 6)  # STCZYX
CHANNELS = ["dna", "structure", "membrane"]


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fake_images")
    rng = np.random.RandomState(42)
    for i in range(10):
        arr = rng.randint(0, 255, size=SHAPE, dtype=np.uint8)
        (d / f"img_{i}.fake").write_bytes(encode_fake_image(arr, CHANNELS))
    return str(d)


def test_binary_scan_and_decode(spark, image_dir):
    binary = read_binary_files(spark, image_dir, glob="*.fake")
    assert binary.count() == 10
    decoded = decode_images(binary)
    rows = decoded.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["shape"] == list(SHAPE)
        assert r["channel_names"] == CHANNELS
        assert len(r["pixels"]) == int(np.prod(SHAPE))


def test_plane_selection_matches_numpy(spark, image_dir):
    binary = read_binary_files(spark, image_dir, glob="*.fake")
    planes = select_plane(decode_images(binary), channel_name="structure").collect()
    assert len(planes) == 10
    by_path = {os.path.basename(r["path"]): r for r in planes}
    for fname, row in by_path.items():
        content = open(os.path.join(image_dir, fname), "rb").read()
        shape, names, arr = decode_image(content)
        c = names.index("structure")
        expected = arr[0, 0, c, shape[3] // 2]  # middle Z, YX plane
        assert row["height"] == shape[4] and row["width"] == shape[5]
        assert np.array_equal(
            np.array(row["plane"], dtype=np.uint8).reshape(shape[4], shape[5]),
            expected,
        )


def test_per_row_sink(spark, image_dir, tmp_path):
    out = str(tmp_path / "planes")
    binary = read_binary_files(spark, image_dir, glob="*.fake")
    planes = select_plane(decode_images(binary), channel_name="structure")
    write_planes(planes, out)
    written = sorted(os.listdir(out))
    assert len(written) == 10
    plane_bytes = SHAPE[4] * SHAPE[5]
    for f in written:
        assert os.path.getsize(os.path.join(out, f)) == plane_bytes


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_injected_decoder_routes_through_same_pipeline(spark, tmp_path):
    """A 'real' codec plugs in as a plain callable and flows through the
    identical mapInPandas decode -> plane-select path as FAKEIMG —
    the reference's aicsimageio decode shape
    (scripts/test_aics_cluster.py:89-101) with the codec injected."""
    import struct as _struct

    # A fake "real" format: b"RAWF" + >2H (Y, X) + uint8 Y*X payload.
    d = tmp_path / "raw_images"
    d.mkdir()
    rng = np.random.RandomState(7)
    arrs = {}
    for i in range(4):
        arr = rng.randint(0, 255, size=(4, 5), dtype=np.uint8)
        (d / f"img_{i}.rawf").write_bytes(
            b"RAWF" + _struct.pack(">2H", *arr.shape) + arr.tobytes()
        )
        arrs[f"img_{i}.rawf"] = arr

    def rawf_decoder(content: bytes):
        assert content[:4] == b"RAWF", "injected decoder got wrong bytes"
        y, x = _struct.unpack(">2H", content[4:8])
        plane = np.frombuffer(content[8:], dtype=np.uint8, count=y * x)
        return (1, 1, 1, 1, y, x), ["c0"], plane.reshape(1, 1, 1, 1, y, x)

    binary = read_binary_files(spark, str(d), glob="*.rawf")
    decoded = decode_images(binary, decoder=rawf_decoder)
    planes = select_plane(decoded, channel_name="c0").collect()
    assert len(planes) == 4
    for r in planes:
        expected = arrs[os.path.basename(r["path"])]
        assert (r["height"], r["width"]) == expected.shape
        assert np.array_equal(
            np.array(r["plane"], dtype=np.uint8).reshape(expected.shape), expected
        )


def test_resize_nn_picks_strided_pixels(spark):
    """Regression: the resize lambda must index with the INPUT width.

    Aliasing the output column as `width` in the same select used to
    lateral-capture the `width` reference inside the transform lambda
    (Spark resolves lateral column aliases before input columns),
    silently striding by the output width instead of the input's.
    """
    from aics_dask_utils_spark.operators.multimodal import resize_plane_nn

    df = spark.createDataFrame(
        [("p", 4, 4, list(range(16)))],
        "path string, height int, width int, plane array<int>",
    )
    row = resize_plane_nn(df, 2).collect()[0]
    assert (row["height"], row["width"]) == (2, 2)
    assert row["plane"] == [0, 2, 8, 10]  # in(0,0), in(0,2), in(2,0), in(2,2)


def test_frame_sample_cuts_time_blocks(spark):
    from aics_dask_utils_spark.operators.multimodal import sample_frames

    # STCZYX (1,4,1,1,2,2): 4 frames of 4 px each, pixels 0..15.
    df = spark.createDataFrame(
        [("v", [1, 4, 1, 1, 2, 2], list(range(16)))],
        "path string, shape array<int>, pixels array<int>",
    )
    rows = {r["t"]: r["frame"] for r in sample_frames(df, every_n=2).collect()}
    assert rows == {0: [0, 1, 2, 3], 2: [8, 9, 10, 11]}


def test_audio_roundtrip_overlapping_frames(spark):
    import numpy as np

    from aics_dask_utils_spark.operators.multimodal import (
        audio_frame_features,
        decode_audios,
        encode_fake_audio,
        frame_audio,
    )

    sig = np.array([10, -10, 10, -10, 0, 0, 5, 5, -5, -5], dtype=np.int32)
    df = spark.createDataFrame(
        [("a", bytearray(encode_fake_audio(sig)))], "path string, content binary"
    )
    decoded = decode_audios(df)
    assert decoded.collect()[0]["samples"] == sig.tolist()
    # frame_len=4, hop=2: floor((10-4)/2)+1 = 4 frames
    framed = frame_audio(decoded, frame_len=4, hop=2)
    frames = {r["frame_idx"]: r["frame"] for r in framed.collect()}
    assert frames == {
        0: [10, -10, 10, -10],
        1: [10, -10, 0, 0],
        2: [0, 0, 5, 5],
        3: [5, 5, -5, -5],
    }
    feats = {
        r["frame_idx"]: r for r in audio_frame_features(framed, 4).collect()
    }
    assert feats[0]["zero_crossings"] == 3
    assert feats[0]["energy_rms"] == 10.0
    assert feats[3]["peak"] == 5
    assert feats[3]["zero_crossings"] == 1


def test_audio_decoder_injection(spark):
    import numpy as np

    from aics_dask_utils_spark.operators.multimodal import decode_audios

    def fake_wav_decoder(content: bytes) -> np.ndarray:
        # stands in for soundfile.read: any bytes -> samples
        return np.frombuffer(content, dtype=np.uint8).astype(np.int32)

    df = spark.createDataFrame(
        [("w", bytearray(b"\x01\x02\x03"))], "path string, content binary"
    )
    row = decode_audios(df, decoder=fake_wav_decoder).collect()[0]
    assert row["samples"] == [1, 2, 3] and row["n_samples"] == 3
