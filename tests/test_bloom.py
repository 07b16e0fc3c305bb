"""Bloom filter unit tests: no false negatives ever (never lose a URL),
bounded false positives, blob round-trip."""

import numpy as np

from distributed_web_crawler_spark.functions import bloom as B


def test_no_false_negatives():
    p = B.BloomParams(n_bits=1 << 14, n_hashes=5)
    f = B.empty_filter(p)
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**62), 2**62, size=500, dtype=np.int64)
    B.add_hashes(f, keys, p)
    assert B.contains(f, keys, p).all()


def test_false_positive_rate_bounded():
    p = B.BloomParams(n_bits=1 << 16, n_hashes=7)
    f = B.empty_filter(p)
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    other = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    B.add_hashes(f, keys, p)
    fp = B.contains(f, np.setdiff1d(other, keys), p).mean()
    assert fp < 0.01, fp


def test_blob_roundtrip(tmp_path):
    p = B.BloomParams(n_bits=1 << 10, n_hashes=3)
    f = B.empty_filter(p)
    B.add_hashes(f, np.array([1, -5, 123456789], dtype=np.int64), p)
    path = str(tmp_path / "blooms" / "b.bin")
    B.write_blob(path, f)
    g = B.load_blob(path, p)
    assert (f == g).all()
    assert B.contains(g, np.array([1, -5, 123456789], dtype=np.int64), p).all()


def test_empty_inputs():
    p = B.BloomParams(n_bits=1 << 10, n_hashes=3)
    f = B.empty_filter(p)
    assert B.contains(f, np.array([], dtype=np.int64), p).shape == (0,)
    assert not B.contains(f, np.array([99], dtype=np.int64), p).any()
