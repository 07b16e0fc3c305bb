"""Image payload decode + verification (north-rule X8, input_hint).

Batch decode of the corpus' binary column in Arrow-fed pandas stages —
never row-at-a-time Python, and the `bytes` column is column-pruned out of
every other stage (SURVEY.md §7 risk (e)).

The container has no PIL/libjpeg, so the wire format is the deterministic
fake codec from fixtures/corpus.py (zlib-lossless "png", step-4-quantized
"jpeg" at PSNR≈46 dB). A real-codec path is gated behind an import-try:
if PIL appears, `decode_any` dispatches on magic bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..fixtures import corpus as C

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_any(data: bytes):
    """Decode a payload to (h,w,3) uint8. Fake-codec magics are handled
    natively; real PNG/JPEG magics require PIL."""
    magic = data[:4]
    if magic in (b"FPNG", b"FJPG"):
        return C.decode_image(data)[0]
    if not HAVE_PIL:
        raise NotImplementedError(
            "real PNG/JPEG payloads need PIL, which is not installed; "
            "fixtures use the deterministic fake codec"
        )
    import io

    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


VERIFY_SCHEMA = (
    "url string, psnr double, phash_ok boolean, caption_ok boolean, pixels_ok boolean"
)


def verify_payloads(fetched: DataFrame, spec: C.CorpusSpec) -> DataFrame:
    """Per-row payload invariants vs the corpus generator (input_hint):
    decoded pixels exact for PNG / PSNR≥40 dB for JPEG, phash equality,
    caption equality. Input needs (url, bytes, fmt, caption, phash)."""

    def verify(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("url", "psnr", "phash_ok", "caption_ok", "pixels_ok")}
            for url, data, fmt, caption, phash in zip(
                pdf["url"], pdf["bytes"], pdf["fmt"], pdf["caption"], pdf["phash"]
            ):
                i = C.index_of_url(url)
                dec = decode_any(bytes(data))
                raw = C.raw_pixels(i, spec)
                p = C.psnr(raw, dec)
                out["url"].append(url)
                out["psnr"].append(min(p, 99.0))
                out["phash_ok"].append(C.phash64(dec) == phash)
                out["caption_ok"].append(caption == C.caption_of(i, spec))
                out["pixels_ok"].append(
                    bool((dec == raw).all()) if fmt == "png" else p >= 40.0
                )
            yield pd.DataFrame(out)

    cols = ["url", "bytes", "fmt", "caption", "phash"]
    return fetched.select(*cols).mapInPandas(verify, schema=VERIFY_SCHEMA)
