"""Multimodal operators: image decode/feature/resize over the fake codec,
audio features over REAL stdlib-decoded RIFF/WAVE PCM, and frame sampling
over the FVID container — all values checked against the deterministic
generators; unknown compressed formats still fail with a clear gate."""

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


def test_audio_features_match_generator(spark):
    import pandas as pd

    spec = C.CorpusSpec(n=100)
    rows = [C.make_audio_row(i, spec) for i in range(12)]
    df = spark.createDataFrame(pd.DataFrame(rows)[["clip_id", "bytes"]])
    got = {r["clip_id"]: r for r in M.audio_features(df).collect()}
    assert len(got) == 12
    for row in rows:
        s = C.audio_samples(int(row["clip_id"][4:]), spec)
        x = s.astype(np.float64) / 32768.0
        g = got[row["clip_id"]]
        assert g["sample_rate"] == C.AUDIO_RATE and g["n_channels"] == 1
        assert abs(g["duration_s"] - len(s) / C.AUDIO_RATE) < 1e-12
        assert abs(g["rms"] - float(np.sqrt(np.mean(x**2)))) < 1e-12
        assert abs(g["peak"] - float(np.abs(x).max())) < 1e-12
        assert 0.05 < g["rms"] < 0.8  # real signal, not silence/clipping


def test_sample_video_frames_match_generator(spark):
    import pandas as pd

    spec = C.CorpusSpec(n=100)
    rows = [C.make_video_row(i, spec) for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows)[["video_id", "bytes"]])
    out = M.sample_video_frames(df, every_n=10).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r)
    for row in rows:
        i = int(row["video_id"][3:])
        n = C.n_frames_of(i, spec)
        got = sorted(by_vid[row["video_id"]], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(0, n, 10))
        assert all(r["n_frames"] == n for r in got)
        for r in got:  # sampled payloads decode to the EXACT generator frame
            arr, fmt = C.decode_image(bytes(r["bytes"]))
            assert fmt == "png" and (arr == C.video_frame(i, r["frame_idx"], spec)).all()


def test_sampled_frames_feed_image_features(spark):
    """Composition: sampler output is directly consumable by the image
    pipeline (frame blob == fake-codec image payload)."""
    import pandas as pd

    spec = C.CorpusSpec(n=100)
    df = spark.createDataFrame(pd.DataFrame([C.make_video_row(3, spec)])[["video_id", "bytes"]])
    frames = M.sample_video_frames(df, every_n=25).selectExpr(
        "concat(video_id, '#', frame_idx) AS image_id", "bytes"
    )
    feats = M.image_features(frames).collect()
    assert len(feats) >= 2
    w, h = C.dims_of(3)
    assert all((r["w"], r["h"]) == (w, h) for r in feats)


@pytest.mark.parametrize("op,idcol", [(M.audio_features, "clip_id"), (M.sample_video_frames, "video_id")])
def test_unknown_formats_fail_with_clear_gate(spark, op, idcol):
    """Compressed real-world formats need libraries this container lacks;
    the dispatch must raise the informative gate, not garbage output."""
    df = spark.createDataFrame([("x1", bytearray(b"\x00\x01\x02\x03"))], f"{idcol} string, bytes binary")
    with pytest.raises(Exception) as ei:
        op(df).collect()
    msg = str(ei.value)
    assert "NotImplementedError" in msg or "not an FVID" in msg or "ValueError" in msg


def test_phash_neardup_recall_and_verify(spark):
    """Banded phash pairing (Manku blocks): recall vs the brute-force
    all-pairs oracle is total for hamming <= n_bands-1 (pigeonhole), the
    verify stage admits no pair beyond the threshold, and a banded
    CANDIDATE beyond the threshold (planted at hamming 4) is rejected."""
    import itertools

    import pandas as pd

    from distributed_web_crawler_spark.operators.multimodal import phash_neardup_pairs

    # hand-built hash family around a base value: controlled hamming dists
    base = 0x0123456789ABCDEF
    rows = {
        "a": base,
        "b": base ^ 0b1,                      # hamming 1
        "c": base ^ 0b111,                    # hamming 3 (vs a)
        "d": base ^ (1 | 1 << 17 | 1 << 33 | 1 << 49),  # 4 bits, one per band: shares NO band with a
        "e": base ^ 0b1111,                   # hamming 4, all in band 0 -> banded candidate, must be rejected
        "f": 0x7EDCBA9876543210,              # far away
    }
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": list(rows), "phash": list(rows.values())})
    )
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in phash_neardup_pairs(df, max_hamming=3, n_bands=4).collect()
    }
    ham = lambda x, y: bin((x ^ y) & (2**64 - 1)).count("1")  # noqa: E731
    want = {
        tuple(sorted((i, j))): ham(rows[i], rows[j])
        for i, j in itertools.combinations(rows, 2)
        if ham(rows[i], rows[j]) <= 3
    }
    assert got == want  # total recall within the guarantee, nothing extra
    assert ("a", "e") not in got and ("d", "a") not in got


def test_phash_neardup_persists_shared_projection(spark):
    """The (id, phash) projection is a shared ancestor of four plan
    branches; phash_neardup_pairs must persist it ONCE (decode pipelines
    would otherwise re-run ~4x) and hand the releasable handle to the
    caller via `persisted`."""
    from distributed_web_crawler_spark.operators.multimodal import phash_neardup_pairs

    df = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 0x0F0F)], "image_id string, phash long"
    )
    handles = []
    out = phash_neardup_pairs(df, max_hamming=3, n_bands=4, persisted=handles)
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in out.collect()}
    assert pairs == {("a", "b"): 1}
    assert len(handles) == 1 and handles[0].is_cached
    for h in handles:
        h.unpersist()
    assert not handles[0].is_cached
