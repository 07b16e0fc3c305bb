"""Multimodal payload operators (task brief): images/audio/video as opaque
binary columns with typed metadata, processed in Arrow-batched pandas
stages. The Spark-side plumbing — schemas, batch shapes, column pruning —
is real and tested; codecs this container lacks (libjpeg/PIL, ffmpeg) are
stubbed behind import-tries / NotImplementedError with the deterministic
fake codec (fixtures/corpus.py) as the test vehicle.

Scale notes: every operator selects ONLY the columns it needs before the
pandas stage so the binary column never rides through unrelated shuffles;
feature outputs are narrow numeric columns safe to shuffle/aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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


AUDIO_FEATURES_SCHEMA = "clip_id string, duration_s double, rms double"
FRAME_SAMPLE_SCHEMA = "video_id string, frame_idx int, bytes binary"


def audio_features(clips: DataFrame) -> DataFrame:
    """STUB: audio decode needs a codec library absent from this container.
    The plumbing (schema, column pruning, Arrow batching) is real; the
    decode call raises until soundfile/librosa is installed."""

    def af(batches):
        for pdf in batches:
            raise NotImplementedError(
                "audio decode requires soundfile/librosa (not installed); "
                "schema contract: " + AUDIO_FEATURES_SCHEMA
            )
            yield pdf  # pragma: no cover

    return clips.select("clip_id", "bytes").mapInPandas(af, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling needs ffmpeg/PyAV (not installed). Raises
    on execution; the operator contract (one output row per sampled frame,
    binary frame payload) is schema-checked in tests."""

    def vf(batches):
        for pdf in batches:
            raise NotImplementedError(
                "video frame sampling requires PyAV/ffmpeg (not installed); "
                "schema contract: " + FRAME_SAMPLE_SCHEMA
            )
            yield pdf  # pragma: no cover

    return videos.select("video_id", "bytes").mapInPandas(vf, schema=FRAME_SAMPLE_SCHEMA)
