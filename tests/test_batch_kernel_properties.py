"""Property-based parity for the round-5 batch kernels: the vectorized
XXH64 and the batched link rule must agree with their scalar references on
ARBITRARY inputs, not just the fixture's happy paths (hypothesis drives
the search; failures shrink to minimal counterexamples)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from distributed_web_crawler_spark.fixtures import corpus as C
from distributed_web_crawler_spark.functions.xxh64 import xxh64, xxh64_u8mat


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=100),  # row byte length
    st.integers(min_value=1, max_value=9),  # row count
    st.randoms(use_true_random=False),
)
def test_xxh64_u8mat_matches_scalar_on_arbitrary_bytes(length, rows, rnd):
    keys = [bytes(rnd.randrange(256) for _ in range(length)) for _ in range(rows)]
    mat = (
        np.frombuffer(b"".join(keys), np.uint8).reshape(rows, length)
        if length
        else np.zeros((rows, 0), np.uint8)
    )
    got = xxh64_u8mat(mat)
    assert [int(h) for h in got] == [xxh64(k) for k in keys]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**8 - 1), min_size=0, max_size=64),
    st.integers(min_value=1, max_value=10**7),
)
def test_out_links_batch_matches_scalar_on_arbitrary_indices(idx_list, n):
    """Any index set (dupes, any magnitude/digit count) against any corpus
    size: batched (parent, target) pairs equal the scalar rule's, in
    extraction order. Indices may exceed spec.n — the rule itself never
    range-checks its input (callers do), so parity must hold there too."""
    spec = C.CorpusSpec(n=n)
    idx = np.asarray(idx_list, np.int64)
    pp, tt = C.out_links_batch(idx, spec)
    got = list(zip(idx[pp].tolist(), tt.tolist()))
    exp = [(i, t) for i in idx_list for t in C.out_links(i, spec)]
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**8 - 1), min_size=1, max_size=64),
    st.integers(min_value=1, max_value=10**7),
)
def test_host_of_batch_matches_scalar(idx_list, n):
    spec = C.CorpusSpec(n=n)
    got = C.host_of_batch(np.asarray(idx_list, np.int64), spec)
    assert [int(h) for h in got] == [C.host_of(i, spec) for i in idx_list]


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), min_size=0, max_size=400))
def test_cdc_chunk_batch_matches_scalar_reference(text):
    """The numpy CDC chunker equals the pure-Python reference on arbitrary
    ascii text (normalization strips the rest to [a-z0-9]), and chunks
    tile the normalized text exactly."""
    import re

    from distributed_web_crawler_spark.operators import dedup as D

    got = D.cdc_chunk_batch(text)
    assert got == D.cdc_chunk_ref(text)
    tn = re.sub(r"[^a-z0-9]", "", text.lower())
    assert "".join(got) == (tn if len(tn) >= D.CDC_K else "")
    assert all(c for c in got)  # never an empty chunk
