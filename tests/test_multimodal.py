"""Multimodal plumbing tests: schemas, batch shapes, determinism."""

from __future__ import annotations

import pytest

from sig_etl_spark.llm import multimodal as M


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytes(range(200)), 10, 20, None, None, "png"),
        (2, "image", b"\xff" * 64, 8, 8, None, None, "jpg"),
        (3, "audio", b"\x01\x02\x03\x04" * 100, None, None, 16000, 2500, "wav"),
        (4, "video", bytes(range(256)) * 4, 640, 480, None, 3500, "mp4"),
        (5, "video", b"\x00", 640, 480, None, 0, "mp4"),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_feature_extraction_schema_and_determinism(spark, media):
    out = M.extract_features(M.partition_media(media, 4))
    assert out.schema == M.FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 5
    assert rows[1].n_bytes == 200
    assert len(rows[1].features) == M.FEATURE_DIM
    # histogram of 0..199 over 16 bins of width 16: first bins full
    assert abs(rows[1].features[0] - 16 / 200) < 1e-6
    # determinism: second run identical
    again = {r.media_id: r.features for r in M.extract_features(media).collect()}
    assert again[1] == rows[1].features


def test_resize_images_contract(spark, media):
    out = M.resize_images(media, 4, 3).collect()
    assert {r.media_id for r in out} == {1, 2}  # only images
    for r in out:
        assert len(bytes(r.content)) == 12
        assert (r.width, r.height) == (4, 3)


def test_sample_frames_explosion(spark, media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {4, 5}
    assert len(by_id[4]) == 3  # 3500ms at 1fps -> 3 frames
    assert [r.ts_ms for r in sorted(by_id[4], key=lambda r: r.frame_idx)] == [0, 1000, 2000]
    assert len(by_id[5]) == 1  # zero-duration still yields one frame
    for r in frames:
        assert len(bytes(r.frame)) >= 1


def test_real_codec_is_clearly_stubbed():
    if not M._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            M.decode_real(b"not an image")

# --- real PPM codec -------------------------------------------------------

def test_ppm_roundtrip_and_header_grammar():
    import numpy as np

    from sig_etl_spark.llm.multimodal import decode_ppm, encode_ppm

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_ppm(encode_ppm(px)) == px).all()

    # comment lines and arbitrary whitespace inside the header are legal
    raw = px.tobytes()
    weird = b"P6 # magic\n# a comment line\n 3\t2 # dims\n255\n" + raw
    assert (decode_ppm(weird) == px).all()


def test_ppm_decode_rejects_garbage():
    import numpy as np
    import pytest

    from sig_etl_spark.llm.multimodal import decode_ppm, decode_real, encode_ppm

    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"PNG...")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")  # raster too short
    with pytest.raises(ValueError, match="16-bit"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    # decode_real routes P6 to the stdlib decoder even without PIL
    px = np.zeros((1, 2, 3), dtype=np.uint8)
    assert decode_real(encode_ppm(px)).shape == (1, 2, 3)
    # and stays an HONEST gate for compressed formats when PIL is absent
    from sig_etl_spark.llm import multimodal as M

    if not M._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_real(b"\x89PNG\r\n\x1a\n")


def test_decode_image_stats_real_decode(spark):
    import numpy as np

    from sig_etl_spark.llm.multimodal import decode_image_stats, encode_ppm

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[..., 0] = 10  # R
    px[..., 1] = 20  # G
    px[..., 2] = 30  # B
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px)))], "media_id long, content binary"
    )
    row = decode_image_stats(df).collect()[0]
    assert (row.width, row.height) == (2, 2)
    assert (row.sum_r, row.sum_g, row.sum_b) == (40, 80, 120)
