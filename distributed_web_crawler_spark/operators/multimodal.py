"""Multimodal payload operators (task brief): images/audio/video as opaque
binary columns with typed metadata, processed in Arrow-batched pandas
stages. Every operator EXECUTES for real here: images via the
deterministic fake codec, audio via stdlib-decoded RIFF/WAVE PCM, video
via the FVID fake container (fixtures/corpus.py) — only compressed
real-world formats (JPEG-via-PIL, MP3-via-soundfile, MP4-via-PyAV)
dispatch behind import-tries, since those libraries are absent from this
container.

Scale notes: every operator selects ONLY the columns it needs before the
pandas stage so the binary column never rides through unrelated shuffles;
feature outputs are narrow numeric columns safe to shuffle/aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..fixtures import corpus as C
from ..functions.images import decode_any

FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_r double, mean_g double, mean_b double, "
    "luma double, phash bigint"
)


def image_features(corpus: DataFrame) -> DataFrame:
    """Decode + feature-extract: per-image mean channel values, luma, and
    perceptual hash. Input needs (image_id, bytes)."""

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr = decode_any(bytes(data))
                means = arr.reshape(-1, 3).mean(axis=0)
                luma = float(0.2126 * means[0] + 0.7152 * means[1] + 0.0722 * means[2])
                rows.append(
                    {
                        "image_id": iid,
                        "w": arr.shape[1],
                        "h": arr.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "luma": luma,
                        "phash": C.phash64(arr),
                    }
                )
            yield pd.DataFrame(rows)

    return corpus.select("image_id", "bytes").mapInPandas(feats, schema=FEATURES_SCHEMA)


def phash_neardup_pairs(
    imgs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "image_id",
    persisted: list | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance — the
    block-permutation scheme of Manku/Jain/Das Sarma (WWW'07, simhash dedup
    at Google scale) specialized to 64-bit phashes: split the hash into
    `n_bands` contiguous blocks; any pair within Hamming distance
    n_bands-1 must agree EXACTLY on at least one block (pigeonhole), so
    candidates are one equi-join per band on the block value and only
    (id, band, key) rides the candidate shuffle — never pixels, never
    all-pairs. Exact verify joins the two phashes back by id and filters
    bit_count(xor) <= max_hamming (must be <= n_bands-1 for the guarantee).
    Input needs (id_col, phash:long); output (a_id, b_id, hamming).

    100-TB shape: band buckets hold ~N/2^(64/n_bands) ids; the verify join
    is bounded by what banding blocked together (same shape as
    similarity.embedding_neardup_pairs and dedup.minhash_lsh_pairs).

    The (id, phash) projection is a shared ancestor of FOUR plan branches
    (band sides a/b + the two verify join-backs); when `imgs` is the
    mapInPandas decode+DCT pipeline of image_features, re-deriving it per
    branch would re-decode every image ~4×. Persist it once; pass
    `persisted` (same contract as dedup.jaccard_verified_pairs /
    politeness.schedule) to take ownership of releasing the handle,
    else it is pinned for the session."""
    assert max_hamming <= n_bands - 1, "guarantee needs max_hamming <= n_bands-1"
    width = 64 // n_bands
    mask = (1 << width) - 1
    ph = imgs.select(F.col(id_col), F.col("phash")).persist()
    if persisted is not None:
        persisted.append(ph)
    bands = ph.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.join(ph.select(F.col(id_col).alias("a_id"), F.col("phash").alias("pa")), "a_id")
        .join(ph.select(F.col(id_col).alias("b_id"), F.col("phash").alias("pb")), "b_id")
        .withColumn("hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int"


def resize_images(corpus: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor batch resize, re-encoded with the lossless fake
    codec. Real-bytes inputs require PIL (decode_any raises a clear
    NotImplementedError otherwise)."""

    def rs(batches):
        import numpy as np
        import pandas as pd

        yi = None
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr = decode_any(bytes(data))
                h, w, _ = arr.shape
                yi = (np.arange(target_h) * h // target_h).astype(np.intp)
                xi = (np.arange(target_w) * w // target_w).astype(np.intp)
                out = arr[np.ix_(yi, xi)]
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": C.encode_image(out, "png"),
                        "w": target_w,
                        "h": target_h,
                    }
                )
            yield pd.DataFrame(rows)

    return corpus.select("image_id", "bytes").mapInPandas(rs, schema=RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "clip_id string, duration_s double, sample_rate int, n_channels int, rms double, peak double"
)
FRAME_SAMPLE_SCHEMA = "video_id string, frame_idx int, n_frames int, bytes binary"


def audio_features(clips: DataFrame) -> DataFrame:
    """Audio decode + feature extraction: duration, sample rate, channel
    count, RMS and peak amplitude (normalized to [-1, 1]). RIFF/WAVE PCM is
    decoded natively via the stdlib `wave` module (fixtures/corpus.py
    encode_wav); compressed formats (MP3/OGG/FLAC) dispatch to soundfile
    behind an import-try, mirroring decode_any's PIL gate. Input needs
    (clip_id, bytes)."""

    def af(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for cid, data in zip(pdf["clip_id"], pdf["bytes"]):
                data = bytes(data)
                if data[:4] == b"RIFF":
                    samples, rate = C.decode_wav(data)
                else:
                    try:  # pragma: no cover - soundfile absent here
                        import io

                        import soundfile as sf

                        s, rate = sf.read(io.BytesIO(data), dtype="int16")
                        samples = s.reshape(len(s), -1)
                    except ImportError:
                        raise NotImplementedError(
                            "compressed audio needs soundfile (not installed); "
                            "RIFF/WAVE PCM decodes natively"
                        )
                x = samples.astype(np.float64) / 32768.0
                rows.append(
                    {
                        "clip_id": cid,
                        "duration_s": samples.shape[0] / rate,
                        "sample_rate": rate,
                        "n_channels": samples.shape[1],
                        "rms": float(np.sqrt(np.mean(np.square(x)))),
                        "peak": float(np.abs(x).max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "duration_s", "sample_rate", "n_channels", "rms", "peak"],
            )

    return clips.select("clip_id", "bytes").mapInPandas(af, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling: one output row per every_n-th frame, payload encoded
    with the lossless fake image codec (decodable by decode_any /
    image_features downstream). FVID containers are walked WITHOUT decoding
    skipped frames (length-prefixed seek, fixtures/corpus.py
    iter_video_frame_blobs); real MP4/MKV dispatch to PyAV behind an
    import-try. Input needs (video_id, bytes)."""

    def vf(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                data = bytes(data)
                if data[:4] == C.VIDEO_MAGIC:
                    blobs = list(C.iter_video_frame_blobs(data))
                    for k, blob in blobs:
                        if k % every_n == 0:
                            rows.append(
                                {
                                    "video_id": vid,
                                    "frame_idx": k,
                                    "n_frames": len(blobs),
                                    "bytes": blob,
                                }
                            )
                else:
                    try:  # pragma: no cover - PyAV absent here
                        import io

                        import av
                    except ImportError:
                        raise NotImplementedError(
                            "real container formats need PyAV/ffmpeg (not "
                            "installed); FVID containers decode natively"
                        )
                    with av.open(io.BytesIO(data)) as container:  # pragma: no cover
                        frames = [
                            f.to_ndarray(format="rgb24")
                            for f in container.decode(video=0)
                        ]
                    for k in range(0, len(frames), every_n):  # pragma: no cover
                        rows.append(
                            {
                                "video_id": vid,
                                "frame_idx": k,
                                "n_frames": len(frames),
                                "bytes": C.encode_image(frames[k], "png"),
                            }
                        )
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "n_frames", "bytes"])

    return videos.select("video_id", "bytes").mapInPandas(vf, schema=FRAME_SAMPLE_SCHEMA)
