"""Corpus fixture invariants (FIXTURES.md §1): deterministic generation,
codec round-trip, PSNR path for lossy rows, phash stability, link-rule
quirk rates, and the Spark generator matching the pure-Python rules."""

import numpy as np
import pytest

from distributed_web_crawler_spark.fixtures import corpus as C

SPEC = C.CorpusSpec(n=1000)


def test_determinism():
    a, b = C.make_row(7, SPEC), C.make_row(7, SPEC)
    assert a == b
    assert C.out_links(7, SPEC) == C.out_links(7, SPEC)


def test_url_roundtrip():
    for i in (0, 3, 17, 999):
        u = C.url_of(i, SPEC)
        assert C.index_of_url(u) == i
        assert C.host_of_url(u) == C.host_name(C.host_of(i, SPEC))


def test_mega_host_skew():
    assert all(C.host_of(i, SPEC) == 0 for i in range(0, 1000, 10))


def test_codec_png_lossless_jpeg_psnr():
    n_jpeg = 0
    for i in range(0, 60):
        raw = C.raw_pixels(i, SPEC)
        fmt = C.fmt_of(i)
        dec, fmt2 = C.decode_image(C.encode_image(raw, fmt))
        assert fmt2 == fmt and dec.shape == raw.shape
        if fmt == "png":
            assert (dec == raw).all()
        else:
            n_jpeg += 1
            p = C.psnr(raw, dec)
            assert 40.0 <= p < 60.0, p
    assert n_jpeg == 20  # every i % 3 == 0


def test_phash_invariant_exact_after_decode():
    # phash stored at generation = phash of DECODED pixels ⇒ invariant exact
    for i in range(0, 30):
        row = C.make_row(i, SPEC)
        dec, _ = C.decode_image(row["bytes"])
        assert C.phash64(dec) == row["phash"]


def test_link_rule_properties():
    n_over = n_err = n_links = 0
    for i in range(SPEC.n):
        links = C.out_links(i, SPEC)
        assert len(set(links)) == len(links)  # U1 per-page dedup
        assert all(0 <= t < SPEC.n for t in links)  # F2 validity
        n_links += len(links)
        n_over += C.is_oversized(i, SPEC)
        n_err += C.is_fetch_error(i, SPEC)
    assert 5 <= n_over <= 60  # ~1/50
    assert 2 <= n_err <= 35  # ~1/97
    assert n_links > SPEC.n  # connected enough to crawl


@pytest.mark.parametrize("i", [1, 5, 22])
def test_caption_shape(i):
    c = C.caption_of(i, SPEC)
    assert c.startswith(f"caption of img{i:08d}: ")
    assert len(c.split(": ")[1].split(" ")) == 8


def test_spark_generator_matches_python(spark, corpus_1k):
    spec, path = corpus_1k
    df = spark.read.parquet(path)
    assert df.count() == spec.n
    rows = {r["image_id"]: r for r in df.filter("image_id in ('img00000003','img00000042')").collect()}
    for i in (3, 42):
        expect = C.make_row(i, spec)
        got = rows[C.image_id(i)]
        assert got["caption"] == expect["caption"]
        assert got["phash"] == expect["phash"]
        assert bytes(got["bytes"]) == expect["bytes"]
        assert (got["w"], got["h"], got["fmt"], got["bucket"]) == (
            expect["w"], expect["h"], expect["fmt"], expect["bucket"],
        )


def test_corpus_partitioned_by_bucket(spark, corpus_1k):
    import os

    _, path = corpus_1k
    assert any(name.startswith("bucket=") for name in os.listdir(path))


def test_out_links_batch_parity():
    """Batched link rule (extract hot path) == scalar rule, including
    extraction ORDER per parent, on a range that exercises every quirk
    (oversized, fetch-error, dangling, per-page dup)."""
    spec = C.CorpusSpec(n=4000)
    idx = np.arange(4000, dtype=np.int64)
    pp, tt = C.out_links_batch(idx, spec)
    exp = [(i, t) for i in range(4000) for t in C.out_links(i, spec)]
    assert list(zip(idx[pp].tolist(), tt.tolist())) == exp
    assert len(exp) > 10000  # the range is non-trivial


def test_host_of_batch_parity():
    spec = C.CorpusSpec(n=4000)
    idx = np.arange(0, 4000, 7, dtype=np.int64)
    got = C.host_of_batch(idx, spec)
    assert [int(h) for h in got] == [C.host_of(int(i), spec) for i in idx]
