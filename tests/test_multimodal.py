"""Multimodal operator plumbing: real decode/feature/resize over the fake
codec; audio/video stubs raise with their schema contract intact."""

import numpy as np
import pytest

from distributed_web_crawler_spark.fixtures import corpus as C
from distributed_web_crawler_spark.operators import multimodal as M


def test_image_features_match_generator(spark, corpus_1k):
    spec, path = corpus_1k
    df = spark.read.parquet(path).filter("image_id in ('img00000005','img00000010')")
    feats = {r["image_id"]: r for r in M.image_features(df).collect()}
    for i in (5, 10):
        row = C.make_row(i, spec)
        dec, _ = C.decode_image(row["bytes"])
        got = feats[C.image_id(i)]
        assert (got["w"], got["h"]) == (row["w"], row["h"])
        assert got["phash"] == row["phash"]
        assert abs(got["mean_r"] - dec[:, :, 0].mean()) < 1e-9
        assert 0 <= got["luma"] <= 255


def test_resize_roundtrip(spark, corpus_1k):
    spec, path = corpus_1k
    df = spark.read.parquet(path).limit(8)
    out = M.resize_images(df, 24, 24).collect()
    assert len(out) == 8
    for r in out:
        arr, fmt = C.decode_image(bytes(r["bytes"]))
        assert arr.shape == (24, 24, 3) and fmt == "png"


def test_resize_deterministic(spark, corpus_1k):
    _, path = corpus_1k
    df = spark.read.parquet(path).filter("image_id = 'img00000007'")
    a = M.resize_images(df, 16, 16).collect()[0]
    b = M.resize_images(df, 16, 16).collect()[0]
    assert bytes(a["bytes"]) == bytes(b["bytes"])


@pytest.mark.parametrize("op,idcol", [(M.audio_features, "clip_id"), (M.sample_video_frames, "video_id")])
def test_stubs_raise_with_contract(spark, op, idcol):
    df = spark.createDataFrame([("x1", bytearray(b"\x00\x01"))], f"{idcol} string, bytes binary")
    out = op(df)
    # schema contract is visible without execution
    assert idcol in out.columns and "bytes" in df.columns
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)
