"""Similarity search over embedding columns (training-data pipeline):
brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane SimHash) variant as the scale path.

Bulk embedding math (scoring, bucket/cell assignment, band keys) runs in
Arrow-batched numpy matmuls — Spark's higher-order functions evaluate
interpreted per element and never enter whole-stage codegen, so BLAS
batches beat them at every input size; single-dot verify expressions stay
JVM-side (`zip_with` + `aggregate`). Every pre-sign/pre-argmax dot is
rounded to 6 dp so engines with different float summation orders bucket,
assign, and rank identically. At 100 TB the brute-force path is one
broadcast of the query vector and a single scan; the LSH path buckets
vectors by deterministic hyperplane signs so a query probes only its
bucket (plus Hamming-adjacent buckets for recall).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _round6_half_away(x):
    """6-dp HALF-AWAY-FROM-ZERO rounding of a numpy array — the rounding
    mode of Spark's round() and DuckDB's round() (np.round is half-to-even,
    which diverges on exact .5 ties at the 6th decimal, e.g. values that
    are small dyadic rationals). Keeps every numpy kernel's tie behavior
    aligned with both SQL engines; summation-association noise remains the
    (measure-zero-at-6-dp) residual risk, as documented per kernel."""
    import numpy as np

    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_scores(embeddings: DataFrame, query_vec: Sequence[float]) -> DataFrame:
    """(vec_id, cos) for every vector — ONE Arrow-batched numpy matvec per
    batch. This is the embedding-math scale path: Spark's higher-order
    functions (zip_with/aggregate) never enter whole-stage codegen and
    evaluate interpreted per element, and an inlined 64-double query
    literal re-costs Catalyst codegen on every fresh plan; a BLAS matvec
    does the same dots orders of magnitude faster at any input size."""
    import numpy as np

    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            cos = (E @ q) / (np.sqrt((E * E).sum(axis=1)) * qn)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cos": cos})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema="vec_id long, cos double"
    )


def cosine_topk(embeddings: DataFrame, query_vec: Sequence[float], k: int = 10) -> DataFrame:
    """Exact brute-force top-k by cosine to the query vector.
    Output: (rank int, vec_id, sim_bucket) — rank is the robust compare key;
    sim is bucketed to 2 decimals so float-association noise cannot flip it.
    The sort key is cos ROUNDED TO 6 DP (ties broken by vec_id): engines
    summing in different orders (BLAS pairwise vs sequential SQL) agree on
    the rounded value, so ranks stay bit-comparable across engines."""
    scored = cosine_scores(embeddings, query_vec)
    key = F.round(F.col("cos"), 6)
    # distributed top-k: orderBy().limit(k) compiles to TakeOrderedAndProject
    # (per-partition heaps + a k-row driver merge) — a global Window here
    # would drag the ENTIRE scored table through one partition to rank it.
    # rank attaches after the limit, when only k rows remain.
    top = scored.orderBy(key.desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.round(F.col("cos"), 6).desc(), F.col("vec_id").asc())
    return top.select(
        F.row_number().over(w).alias("rank"), "vec_id", F.round("cos", 2).alias("sim_bucket")
    )


def hyperplane(dim: int, plane: int) -> List[float]:
    """Deterministic pseudo-random ±1 hyperplane from the portable md5-60
    hash — no RNG state, computable identically anywhere (the oracle SQL
    inlines these very values as literals)."""
    import hashlib

    out = []
    for c in range(dim):
        h = int(hashlib.md5(f"plane:{plane}:{c}".encode()).hexdigest()[:15], 16)
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def lsh_bucket(embeddings: DataFrame, dim: int, n_planes: int = 8) -> DataFrame:
    """Sign-LSH bucket id per vector: bit p = round(v · hyperplane_p, 6) > 0
    (rounded pre-sign so every engine buckets identically regardless of its
    float summation order)."""
    bucket = None
    for p in range(n_planes):
        h = F.array(*[F.lit(x) for x in hyperplane(dim, p)])
        bit = F.when(F.round(_dot(F.col("embedding"), h), 6) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.withColumn("bucket", bucket.cast("int"))


def probe_masks(n_planes: int, n_flip: int) -> List[int]:
    """XOR masks of every bucket within Hamming distance n_flip (multi-probe
    LSH): mask 0 plus all ≤n_flip-bit combinations. Scan fraction ≈
    sum_{i≤n_flip} C(n_planes, i) / 2^n_planes of brute force."""
    from itertools import combinations

    masks = [0]
    for f in range(1, n_flip + 1):
        masks += [sum(1 << p for p in c) for c in combinations(range(n_planes), f)]
    return masks


def query_bucket(query_vec: Sequence[float], dim: int, n_planes: int) -> int:
    qb = 0
    for p in range(n_planes):
        hp = hyperplane(dim, p)
        # 6-dp rounding before the sign, like every bucket path: engines
        # that sum in different orders must agree on the bucket bit
        if round(sum(float(a) * b for a, b in zip(query_vec, hp)), 6) > 0:
            qb |= 1 << p
    return qb


def ann_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_flip: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine rank restricted to the query's LSH
    bucket PLUS every bucket within Hamming distance `n_flip` (multi-probe).
    Recall is controlled by two knobs: bucket width (n_planes, fewer planes
    = wider buckets) and probe radius (n_flip, more flips = more buckets) —
    a near neighbor is missed only if it differs from the query on MORE
    than n_flip plane signs."""
    qb = query_bucket(query_vec, dim, n_planes)
    probe = frozenset(qb ^ m for m in probe_masks(n_planes, n_flip))
    survivors = _bucket_restrict(embeddings, dim, n_planes, probe)
    return cosine_topk(survivors, query_vec, k)


def _bucket_restrict(embeddings: DataFrame, dim: int, n_planes: int, probe) -> DataFrame:
    """Rows whose sign-LSH bucket is in `probe`, computed as one numpy
    sign-matmul per Arrow batch with the embedding passed through for the
    downstream exact scorer. At 100 TB the bucket is PRECOMPUTED as the
    vector table's partition key (partition pruning replaces this map);
    the fixture tables are unpartitioned, so the query assigns inline —
    either way only probe-bucket rows reach the scoring stage."""
    import numpy as np

    pm = np.array([hyperplane(dim, p) for p in range(n_planes)]).T  # (dim, P)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    schema = embeddings.select("vec_id", "embedding").schema

    def filt(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            buckets = (_round6_half_away(E @ pm) > 0).astype(np.int64) @ weights
            keep = np.fromiter((int(b) in probe for b in buckets), bool, len(buckets))
            yield pdf[keep]

    return embeddings.select("vec_id", "embedding").mapInPandas(filt, schema=schema)


def write_bucket_partitioned(
    embeddings: DataFrame, path: str, dim: int, n_planes: int = 8
) -> None:
    """Materialize the 100-TB ANN layout: the sign-LSH bucket as the
    vector table's PARTITION KEY. Buckets are assigned by the same
    6-dp-rounded double arithmetic as every query-side bucket path
    (lsh_bucket / query_bucket), so a probe set computed from the query
    selects exactly the right partition directories. One file per bucket:
    repartition BY the partition column before partitionBy, else every
    input partition writes a file per bucket (memory: tiny-file trap).

    Buckets are assigned by the SAME Arrow-batched numpy sign-matmul as
    _bucket_restrict (identical 6-dp-rounded double arithmetic) — the
    lsh_bucket expression form would inline 8 × 64-double literal dot
    products and pay seconds of Catalyst codegen per plan, dwarfing the
    actual data work (same pitfall as band_keys' docstring)."""
    import numpy as np

    pm = np.array([hyperplane(dim, p) for p in range(n_planes)]).T  # (dim, P)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            pdf = pdf.copy()
            pdf["embedding"] = E.tolist()
            pdf["bucket"] = ((_round6_half_away(E @ pm) > 0).astype(np.int64) @ weights).astype(np.int32)
            yield pdf

    df = embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, embedding array<double>, bucket int"
    )
    # keep the layout write PARALLEL: with repartition(col) alone, a tiny
    # bucket shuffle gets AQE-coalesced to ONE task that opens the 2^planes
    # per-bucket parquet writers serially — pure committer latency (~5 s
    # for 2 k rows). Pinning an explicit partition COUNT opts the exchange
    # out of AQE coalescing (user-specified repartitions are never
    # coalesced) without touching any session-global conf, which a
    # concurrent job would otherwise observe mid-flight. One writer task
    # per shuffle partition is also the only shape at 10^10 vectors.
    n_writers = embeddings.sparkSession.sparkContext.defaultParallelism
    df.repartition(n_writers, F.col("bucket")).write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(path)


def ann_topk_partitioned(
    spark,
    path: str,
    query_vec: Sequence[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_flip: int = 1,
) -> DataFrame:
    """ann_topk over a bucket-PARTITIONED vector table — the probe-set
    restriction becomes a PARTITION FILTER the scan prunes on: no per-row
    bucket recompute, no bytes read outside the probe directories. This is
    the plan-audited realization of _bucket_restrict's 100-TB claim
    (tests/test_ann_partitioned.py asserts the pruned file set); results
    are identical to ann_topk on the unpartitioned table (same oracle)."""
    qb = query_bucket(query_vec, dim, n_planes)
    probe = sorted({qb ^ m for m in probe_masks(n_planes, n_flip)})
    survivors = spark.read.parquet(path).filter(F.col("bucket").isin(probe))
    return cosine_topk(survivors, query_vec, k)


def _band_key_matrix(E, dim: int, n_bands: int, band_planes: int):
    """(n, n_bands) int64 band keys for an (n, dim) float64 matrix — THE
    one definition of the banded sign-LSH key arithmetic (6-dp half-away
    rounding before the sign, bit-weight packing per band), shared by
    band_keys and embedding_dedup_pairs so the two can never drift from
    each other or from the oracle's inlined hyperplane literals."""
    import numpy as np

    n_planes = n_bands * band_planes
    pm = np.array([hyperplane(dim, p) for p in range(n_planes)]).T  # (dim, P)
    weights = 1 << np.arange(band_planes, dtype=np.int64)
    bits = (_round6_half_away(E @ pm) > 0).astype(np.int64)  # (n, P)
    return bits.reshape(len(E), n_bands, band_planes) @ weights  # (n, B)


def band_keys(embeddings: DataFrame, dim: int, n_bands: int, band_planes: int) -> DataFrame:
    """(vec_id, band, key) rows — key = sign bits of the band's hyperplane
    dots, rounded to 6 dp before the sign so every engine (whatever its
    float summation order) buckets identically. ONE Arrow-batched numpy
    matmul against the (n_bands·band_planes, dim) plane matrix: the
    expression-tree version (24 zip_with/aggregate dots over inlined
    64-double literals) cost seconds of Catalyst codegen per plan — more
    than the actual data work at any scale, and pure overhead at this one."""

    def bk(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            keys = _band_key_matrix(E, dim, n_bands, band_planes)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(E)),
                    "key": keys.reshape(-1).astype(np.int32),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        bk, schema="vec_id long, band int, key int"
    )


def embedding_dedup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bands: int = 4,
    band_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, BANDED sign-LSH (MinHash-LSH style):
    each vector gets n_bands keys of band_planes sign bits each; a pair is
    reported iff it shares ANY band key AND its exact cosine rounds to
    ≥ threshold at 2 dp.

    r9 restructure (guide §8 "decide with small rows, move heavy rows
    once" + §4.2 batch-native math). The old plan self-joined the
    (vec_id, band, key) frame — materializing EVERY within-bucket pair
    (Σ C(bucket,2) ≈ B·N²/2^r rows) through a join + distinct + two
    embedding joins + an interpreted per-pair zip_with/aggregate cosine:
    34 s at sf1.0, growing quadratically. Now each (band, key) bucket is
    verified LOCALLY: the embedding rides the band shuffle once
    (B·N rows — linear, vs the old quadratic candidate exchange), one
    BLAS gram matrix per bucket scores all within-bucket pairs, a
    conservative margin (threshold − 0.006, i.e. strictly below the
    2-dp round-up boundary at threshold − 0.005) prefilters, and ONLY
    survivors (a handful) are emitted — re-scored with the exact
    LEFT-FOLD dot/norm arithmetic of the previous JVM expression
    (_seq_dot), so surviving cos doubles are bit-identical to the old
    plan and to the oracle. Cross-band duplicates collapse in a final
    distinct over the rounded output (a survivor's left-fold cos is
    deterministic, so duplicates are exact). The matmul-vs-left-fold
    association delta (~1e-15) is orders below the 1e-3 margin, so the
    prefilter can neither drop nor add a survivor.

    Scale shape: banding still bounds the compare set (bucket ≈
    N/2^band_planes, recall 1-(1-p^r)^B); the only wide exchange carries
    B·N (id, key, vector) rows — strictly fewer bytes than the old
    candidate-pair shuffle whenever buckets hold ≥ ~3 vectors, and the
    quadratic surface is now bucket-local compute (SemDeDup-style
    within-cell verification), never a shuffle."""
    import numpy as np

    margin = float(threshold) - 0.006

    def bk_with_vec(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            keys = _band_key_matrix(E, dim, n_bands, band_planes)
            rows = E.tolist()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(E)),
                    "key": keys.reshape(-1).astype(np.int32),
                    "embedding": [r for r in rows for _ in range(n_bands)],
                }
            )

    bke = embeddings.select("vec_id", "embedding").mapInPandas(
        bk_with_vec,
        schema="vec_id long, band int, key int, embedding array<double>",
    )

    def verify(pdf):
        import pandas as pd

        cols = ["a_id", "b_id", "cos"]
        empty = pd.DataFrame(
            {
                "a_id": pd.Series(dtype="int64"),
                "b_id": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])[order]
        nrm = np.sqrt((E * E).sum(axis=1))
        import math

        out = []
        m = len(ids)
        # BLOCKED gram scoring: a degenerate mega-bucket (e.g. tens of
        # thousands of exact duplicates landing in one (band, key) every
        # band — precisely what a dedup corpus contains) must not allocate
        # an m×m gram matrix in one Python worker; row blocks bound the
        # transient to O(block·m) while the compute stays one BLAS matmul
        # per block. 2048·m doubles ≈ 16 KB per bucket row — modest even
        # at m ~ 10⁶, where m² would be terabytes.
        block = 2048
        col = np.arange(m)
        for s in range(0, m - 1, block):
            e = min(s + block, m)
            Cb = (E[s:e] @ E.T) / np.outer(nrm[s:e], nrm)  # (e-s, m)
            hit_r, hit_c = np.nonzero(
                (Cb >= margin) & (col[None, :] > np.arange(s, e)[:, None])
            )
            for i, j in zip(hit_r + s, hit_c):
                if ids[i] == ids[j]:
                    continue  # old plan's strict a_id < b_id: no self-pairs
                a, b = E[i], E[j]
                # exact left-fold arithmetic of the old JVM expression:
                # dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), IEEE double
                cos = _seq_dot(a, b) / (
                    math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b))
                )
                out.append((int(ids[i]), int(ids[j]), cos))
        return pd.DataFrame(out, columns=cols) if out else empty

    pairs = bke.groupBy("band", "key").applyInPandas(
        verify, schema="a_id long, b_id long, cos double"
    )
    return (
        pairs.select("a_id", "b_id", F.round("cos", 2).alias("sim_bucket2"))
        .filter(F.col("sim_bucket2") >= threshold)
        .distinct()
    )


def ivf_centroids(dim: int, n_centroids: int) -> List[List[float]]:
    """Deterministic fixed-codebook IVF centroids in [-1, 1), md5-derived
    like the LSH hyperplanes — no RNG state, identical everywhere, inlined
    as literals into the oracle SQL. (A learned k-means codebook slots in
    unchanged: assignment/probe below only consume the vectors. The fixed
    codebook keeps the oracle static — it cannot re-run k-means.)"""
    return [
        [m / 1_000_000.0 - 1.0 for m in row]
        for row in ivf_centroid_micros(dim, n_centroids)
    ]


def ivf_centroid_micros(dim: int, n_centroids: int) -> List[List[int]]:
    """The codebook's exact INTEGER form: value = m/1e6 − 1.0. Oracles
    inline this rational expression instead of the float's 17-digit repr —
    a printed double re-parsed through an engine's decimal-literal path
    can land 1 ulp away, but (m / 1000000.0 - 1.0) is two correctly
    rounded ops every engine computes bit-identically."""
    import hashlib

    out = []
    for c in range(n_centroids):
        out.append(
            [
                int(hashlib.md5(f"ivf:{c}:{i}".encode()).hexdigest()[:15], 16) % 2_000_001
                for i in range(dim)
            ]
        )
    return out


def _cell_expr(e: Column, dim: int, n_centroids: int) -> Column:
    """0-based index of the max (rounded) centroid dot product. Rounding to
    6 dp before the argmax keeps the assignment bit-identical across
    engines whose float summation order differs."""
    dots = F.array(
        *[
            F.round(_dot(e, F.array(*[F.lit(x) for x in cvec])), 6)
            for cvec in ivf_centroids(dim, n_centroids)
        ]
    )
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_assign(embeddings: DataFrame, dim: int, n_centroids: int = 16) -> DataFrame:
    """IVF inverted-list assignment: each vector joins the cell of its
    nearest centroid — one narrow map, no shuffle; at 100 TB the cell column
    becomes the partition key of the vector table."""
    return embeddings.withColumn("cell", _cell_expr(F.col("embedding"), dim, n_centroids))


def ivf_probe_cells(query_vec: Sequence[float], dim: int, n_centroids: int, n_probe: int) -> List[int]:
    """The query's n_probe nearest cells (ties by cell index), driver-side."""
    scored = []
    for idx, cvec in enumerate(ivf_centroids(dim, n_centroids)):
        d = round(sum(float(a) * b for a, b in zip(query_vec, cvec)), 6)
        scored.append((-d, idx))
    return [idx for _, idx in sorted(scored)[:n_probe]]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: exact cosine rank restricted to the query's
    n_probe nearest inverted lists — the second ANN scale path next to
    sign-LSH (ann_topk). Scan cost ≈ n_probe/n_centroids of brute force;
    recall is tuned by n_probe. Cell assignment runs as one numpy
    argmax-matmul per Arrow batch (see _bucket_restrict for why inline
    assignment here vs a precomputed partition key at 100 TB)."""
    import numpy as np

    probe = frozenset(ivf_probe_cells(query_vec, dim, n_centroids, n_probe))
    cm = np.array(ivf_centroids(dim, n_centroids)).T  # (dim, C)
    schema = embeddings.select("vec_id", "embedding").schema

    def filt(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            dots = _round6_half_away(E @ cm)  # tie mode aligned with SQL round()
            cells = dots.argmax(axis=1)
            keep = np.fromiter((int(c) in probe for c in cells), bool, len(cells))
            yield pdf[keep]

    survivors = embeddings.select("vec_id", "embedding").mapInPandas(filt, schema=schema)
    return cosine_topk(survivors, query_vec, k)


def write_cell_partitioned(
    embeddings: DataFrame, path: str, dim: int, n_centroids: int = 16
) -> None:
    """Materialize the 100-TB IVF layout: the inverted-list CELL as the
    vector table's PARTITION KEY (the third instance of the layout
    discipline, after write_bucket_partitioned's sign-LSH buckets and
    pagerank's src-bucketed edges). Cells are assigned by the same
    6-dp-rounded double argmax as every query path (ivf_assign /
    ivf_topk's inline kernel / the SQL oracle), so a probe set computed
    from the query selects exactly the right partition directories. Same
    Arrow-batched numpy kernel + explicit-count repartition as the ANN
    writer (AQE never coalesces a user-pinned repartition; one writer
    task per shuffle partition is also the only shape at 10^10 vectors)."""
    import numpy as np

    cm = np.array(ivf_centroids(dim, n_centroids)).T  # (dim, C)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            pdf = pdf.copy()
            pdf["embedding"] = E.tolist()
            pdf["cell"] = _round6_half_away(E @ cm).argmax(axis=1).astype(np.int32)
            yield pdf

    df = embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, embedding array<double>, cell int"
    )
    n_writers = embeddings.sparkSession.sparkContext.defaultParallelism
    df.repartition(n_writers, F.col("cell")).write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(path)


def ivf_topk_partitioned(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    dim: int = None,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """ivf_topk over a cell-PARTITIONED vector table — the n_probe
    restriction becomes a PARTITION FILTER the scan prunes on: no per-row
    centroid argmax at query time, no bytes read outside the probe cells'
    directories. Results identical to ivf_topk on the unpartitioned table
    (same oracle); dim is taken from the query vector when omitted."""
    dim = len(query_vec) if dim is None else dim
    probe = ivf_probe_cells(query_vec, dim, n_centroids, n_probe)
    survivors = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    return cosine_topk(survivors, query_vec, k)


def label_centroid_norms(embeddings: DataFrame) -> DataFrame:
    """Per-label aggregate stats: count + mean vector norm (rounded)."""
    return (
        embeddings.select("label", _norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("nrm"), 3).alias("avg_norm"))
    )


# ------------------------------------------------------------------ k-means

def _kmeans_assign(embeddings: DataFrame, cents: List[List[float]]) -> DataFrame:
    """(vec_id, embedding DOUBLE[], cell) under squared-Euclidean argmin:
    argmin |x-c|² = argmax(x·c − |c|²/2). Scores are rounded to 6 dp
    (HALF-AWAY, matching SQL round — see _round6_half_away) before the
    argmax and ties break to the LOWEST cell id (numpy argmax first-max ==
    the oracle's ORDER BY score DESC, cell ASC). Residual cross-engine
    risk is only summation-association noise (~1e-15) landing exactly on
    a rounding boundary — measure-zero on continuous data, the same
    accepted margin as the ivf/ann kernels. One BLAS matmul per Arrow
    batch — the same kernel discipline as ivf_topk/cosine_scores (Spark's
    higher-order array functions evaluate interpreted per element)."""
    import numpy as np

    cm = np.asarray(cents, dtype=np.float64)  # (C, dim)
    half_sq = np.array([_seq_dot(c, c) / 2.0 for c in cents])  # left-fold like SQL

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            out = pdf[["vec_id"]].copy()
            out["embedding"] = E.tolist()
            out["cell"] = _round6_half_away(E @ cm.T - half_sq).argmax(axis=1).astype(np.int32)
            yield out

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, embedding array<double>, cell int"
    )


def _seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Left-fold dot product — the association order of DuckDB's
    list_dot_product and Spark's F.aggregate, NOT numpy's pairwise sum.
    Used wherever a driver-side scalar must match the oracle's bits."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def kmeans_fit(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means over the embedding column — the codebook TRAINER the
    IVF docstring (ivf_centroids) points at: the fixed md5 codebook seeds
    iteration 0, each round reassigns every vector to its nearest centroid
    and recomputes per-cell means, and the learned codebook slots straight
    into ivf_assign/write_cell_partitioned. The reference has no analog
    (its data plane is per-job Go maps); this is the standard
    training-data-pipeline clustering op (corpus bucketing, diversity
    sampling, embedding-space pruning).

    Scale shape (10^10 vectors): assignment is one narrow Arrow-batched
    BLAS matmul per batch (no shuffle); the update is posexplode →
    partial-aggregated hash agg keyed by (cell, dim) — the shuffle carries
    n_centroids×dim rows per task, and the collected per-iteration state
    is the n_centroids×dim codebook itself (control-plane sized, the
    MLlib discipline). No iteration state accumulates on the cluster.

    Determinism: per-dim means are quantized to exact integer MICRO-units
    (round(avg·1e6) as long — engines disagree by 1 ulp on round(x, 6) of
    a double, but agree on integer rounding) and re-enter the next round
    as micro/1e6, a correctly-rounded division both engines compute
    bit-identically — so cross-engine float-association noise cannot
    compound across rounds; assignment scores round to 6 dp (half-away)
    before the argmax, leaving association-on-a-boundary as the only
    (measure-zero) divergence. Empty cells keep their previous centroid with n=0 (both sides
    coalesce against the incoming codebook).

    Returns (cell int, n long, centroid array<double> — per-dim means of
    the FINAL assignment, 6 dp)."""
    spark = embeddings.sparkSession
    stats, last = _kmeans_stats(embeddings, dim, n_centroids, n_iters)
    res = stats.groupBy("cell").agg(
        F.max("n").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cvu"))),
            lambda s: s["cvu"] / F.lit(1000000.0),
        ).alias("centroid"),
    )
    codebook = spark.createDataFrame(
        [(c, last[c]) for c in range(n_centroids)], "cell int, prev array<double>"
    )
    return codebook.join(res, "cell", "left").select(
        "cell",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.col("centroid"), F.col("prev")).alias("centroid"),
    )


def kmeans_fit_flat(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 2,
) -> DataFrame:
    """kmeans_fit with the codebook flattened to SCALAR rows
    (cell int, n long, dim int, c_micro long) — one row per centroid
    coordinate in exact integer micro-units. This is the cross-engine
    exchange format: the r6 driver canonicalizer cannot sort an
    array<double> cell (pandas sort_values → unhashable list), and micro
    ints sidestep float-printing entirely. n_centroids×dim rows — still
    control-plane sized at any corpus scale."""
    spark = embeddings.sparkSession
    stats, last = _kmeans_stats(embeddings, dim, n_centroids, n_iters)
    # exact micro-units of the final codebook input for empty-cell
    # fallback: entries are either cvu/1e6 or the initial m/1e6 - 1.0,
    # both within << 0.5 micro of an integer, so round() recovers it
    codebook = spark.createDataFrame(
        [
            (c, d, int(round(last[c][d] * 1e6)))
            for c in range(n_centroids)
            for d in range(dim)
        ],
        "cell int, dim int, prev_micro long",
    )
    return codebook.join(stats, ["cell", "dim"], "left").select(
        "cell",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "dim",
        F.coalesce(F.col("cvu"), F.col("prev_micro")).cast("long").alias("c_micro"),
    )


def _kmeans_stats(embeddings, dim, n_centroids, n_iters):
    """Shared Lloyd loop: returns (final per-(cell,dim) stats DF with
    columns cell/dim/cvu/n, final input codebook as python floats).

    Iteration discipline (operators/bfs.py IterationState): per-round
    lineage is flat by construction — the codebook is a collected
    driver-side list, so each round is scan → assign → agg, never a
    growing chain — but at n_iters > 1 the input would be re-read from
    parquet every round; persist the projected input across rounds and
    release it on exit (MLlib KMeans caches its input the same way)."""
    if n_iters < 1:
        raise ValueError(f"kmeans requires n_iters >= 1, got {n_iters}")
    cents = [list(map(float, c)) for c in ivf_centroids(dim, n_centroids)]
    inp = embeddings.select("vec_id", "embedding")
    if n_iters > 1:
        inp = inp.persist()
    stats = None
    try:
        for t in range(n_iters):
            assigned = _kmeans_assign(inp, cents)
            stats = (
                assigned.select("cell", F.posexplode("embedding").alias("dim", "v"))
                .groupBy("cell", "dim")
                .agg(
                    F.round(F.avg("v") * 1e6).cast("long").alias("cvu"),
                    F.count("*").alias("n"),
                )
            )
            if t == n_iters - 1:
                # localCheckpoint (eager) so the returned frame neither
                # recomputes the final pass nor pins the input cache
                stats = stats.localCheckpoint()
                break
            rows = stats.collect()  # n_centroids × dim rows — the codebook
            by_cell: dict = {}
            for r in rows:
                by_cell.setdefault(r["cell"], list(cents[r["cell"]]))[r["dim"]] = (
                    r["cvu"] / 1e6
                )
            cents = [by_cell.get(c, cents[c]) for c in range(n_centroids)]
    finally:
        if n_iters > 1:
            inp.unpersist(False)
    return stats, cents  # cents = codebook that produced the final assignment
