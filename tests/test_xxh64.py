"""Bit-parity of the pure-Python XXH64 with Spark's F.xxhash64 — the oracle
and the engine must agree on every hash-derived decision (FIXTURES.md)."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.functions.xxh64 import xxh64, xxh64_signed


def test_known_spark_values():
    # values observed from Spark 4.1 F.xxhash64 (seed 42)
    assert xxh64_signed("") == -7444071767201028348
    assert xxh64_signed("a") == -8582455328737087284
    assert xxh64_signed("42:host:17") == 5625138908319316071


def test_parity_with_spark(spark):
    vals = (
        ["", "a", "ab", "abc", "abcd", "42:host:17", "http://h0001.test/p/123"]
        + ["x" * n for n in (7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 100)]
        + [f"42:lnk:{i}:{k}" for i in (0, 7, 999999) for k in range(3)]
    )
    df = spark.createDataFrame([(v,) for v in vals], ["s"]).select("s", F.xxhash64("s").alias("h"))
    got = {r["s"]: r["h"] for r in df.collect()}
    for v in vals:
        assert xxh64_signed(v) == got[v], v


def test_unsigned_signed_consistency():
    for v in ["q", "42:deg:5", "zz" * 40]:
        u, s = xxh64(v), xxh64_signed(v)
        assert u % (1 << 64) == s % (1 << 64)


def test_u8mat_parity_all_length_classes():
    """Vectorized row-wise XXH64 is bit-identical to the scalar reference
    on every chunk-path class (empty, tail-only, 4-byte, 8-byte, 32-byte
    stripes and mixes)."""
    import random

    import numpy as np

    from distributed_web_crawler_spark.functions.xxh64 import xxh64_u8mat

    rng = random.Random(7)
    for L in (0, 1, 3, 4, 7, 8, 12, 15, 16, 31, 32, 33, 40, 63, 64, 65, 100):
        keys = [bytes(rng.randrange(256) for _ in range(L)) for _ in range(13)]
        mat = (
            np.frombuffer(b"".join(keys), np.uint8).reshape(13, L)
            if L
            else np.zeros((13, 0), np.uint8)
        )
        got = xxh64_u8mat(mat)
        exp = np.array([xxh64(k) for k in keys], np.uint64)
        assert (got == exp).all(), L
