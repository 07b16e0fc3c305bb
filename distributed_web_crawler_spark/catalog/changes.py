"""Change-data-capture view over AtomicTable version history — the
Iceberg/Delta "changelog read" analog for the control tables (job ledger,
job cache, client registry).

Every CAS commit of an AtomicTable is a snapshot — stored either whole
(data.parquet) or as a keyed delta folded over its base chain
(catalog.tables.read_table_version); diffing consecutive snapshots on a
key column yields the change stream the reference would get by tailing
Postgres WAL / Redis keyspace notifications. Cardinality is
control-plane tiny (one row per job/seed/client), so the diff runs
driver-side in pandas and lands in Spark as a normal DataFrame — at real
scale this is `spark.read.format("iceberg").option("start-snapshot-id",…)`
on a changelog-enabled table, with callers unchanged.

Ops emitted per version step: `insert` (key appears), `delete` (key
vanishes — cache eviction / registry reap), `update_pre`/`update_post`
(key present in both but any column changed) — Delta CDF's op vocabulary.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
import pyarrow.parquet as pq

from .tables import AtomicTable


def snapshots(table: AtomicTable) -> List[int]:
    """Committed version numbers, ascending."""
    import os

    out = []
    for nm in os.listdir(table.dir):
        if nm.startswith("commit_v"):
            out.append(int(nm[8:]))
    return sorted(out)


def read_version(table: AtomicTable, v: int) -> pd.DataFrame:
    """Full snapshot at version v — reconstructs keyed-delta versions by
    folding their base chain (catalog.tables.read_table_version)."""
    from .tables import read_table_version

    return read_table_version(table, v)


def _advance(table: AtomicTable, v: int, prev_v: Optional[int], prev_df) -> pd.DataFrame:
    """Snapshot at v, folding forward from the already-reconstructed
    predecessor when v is a delta based on it — keeps changes_pdf linear in
    (versions × delta size) instead of re-walking each chain per step."""
    import os

    from .tables import fold_delta, version_delta_meta

    meta = version_delta_meta(table, v)
    if prev_df is not None and meta is not None and meta["base"] == prev_v:
        ups = pq.read_table(os.path.join(table.path_of(v), "delta.parquet")).to_pandas()
        return fold_delta(prev_df, ups, meta["deletes"], meta["key"])
    return read_version(table, v)


def changes_pdf(
    table: AtomicTable,
    key: str,
    start_version: Optional[int] = None,
    end_version: Optional[int] = None,
) -> pd.DataFrame:
    """Change rows between consecutive snapshots in (start, end]:
    (_version, _op, <data columns>)."""
    snaps = snapshots(table)
    vs = [v for v in snaps
          if (start_version is None or v > start_version)
          and (end_version is None or v <= end_version)]
    prev_v: Optional[int] = None
    chunks: List[pd.DataFrame] = []

    def _block(rows: pd.DataFrame, v: int, op: str) -> pd.DataFrame:
        d = rows.reset_index(drop=True).copy()
        d.insert(0, "_op", op)
        d.insert(0, "_version", v)
        return d

    if start_version is not None and start_version in snaps:
        prev = read_version(table, start_version)
        prev_v = start_version
    else:
        # A checkpointed start_version that is NOT a committed snapshot must
        # FAIL, never silently degrade (Delta/Iceberg raise for an invalid
        # start snapshot too). Two distinct corruptions land here:
        # expired (< max: compact() dropped it — replaying the first
        # surviving snapshot as inserts would double-count every row) and
        # unknown (> max, or an empty/rebuilt table: a corrupted checkpoint
        # or a rolled-back table — returning an empty changeset would make
        # the consumer silently miss every future row until its checkpoint
        # is coincidentally passed). start_version=0/None still means
        # "from the beginning" (full state as inserts).
        if start_version:
            if snaps and start_version < max(snaps):
                raise ValueError(
                    f"start_version {start_version} has been compacted away "
                    f"(earliest available snapshot: {min(snaps)}); the consumer "
                    "must re-baseline from a full snapshot read"
                )
            if not snaps or start_version > max(snaps):
                raise ValueError(
                    f"start_version {start_version} is not a committed snapshot "
                    f"(newest: {max(snaps) if snaps else None}); the table was "
                    "rolled back or the checkpoint is corrupt — the consumer "
                    "must re-baseline from a full snapshot read"
                )
        prev = None
    for v in vs:
        cur = _advance(table, v, prev_v, prev)
        prev_v = v
        if prev is None:
            # r9: emitted as one vectorized block (the per-row
            # iterrows/to_dict loop cost O(rows) Python dict builds —
            # seconds at 10^4+ rows); row order (= snapshot order) and
            # content are unchanged
            if len(cur):
                chunks.append(_block(cur, v, "insert"))
        else:
            # vectorized three-way diff on the key index — the per-key
            # boolean-mask scans this replaces were O(rows²) per version
            # step, which a 10^5-job ledger would feel even "driver-side".
            # keep="first" preserves the old .iloc[0] behavior for a
            # (malformed) snapshot with duplicate keys; sort=False keeps
            # mixed-type keys working (emit order is sorted(key=str) below)
            pi = prev.drop_duplicates(subset=key, keep="first").set_index(key, drop=False)
            ci = cur.drop_duplicates(subset=key, keep="first").set_index(key, drop=False)
            ins_k = ci.index.difference(pi.index, sort=False)
            del_k = pi.index.difference(ci.index, sort=False)
            common = pi.index.intersection(ci.index, sort=False)
            a = pi.loc[common]
            b = ci.loc[common]
            if list(prev.columns) != list(cur.columns):
                # snapshot schema drift: every common row "differs" under
                # the old per-row Series.equals semantics -> all updates
                upd_k = common
            else:
                # row equality with NaN == NaN, preserving the original
                # per-row Series.equals semantics this vectorization
                # replaced: equals is DTYPE-STRICT (an int64 1 vs float64
                # 1.0 across snapshots is a change and must emit
                # update_pre/update_post), and object columns may hold
                # non-scalar cells (a flat a.values == b.values would turn
                # an ndarray cell's == into a nested array and make
                # .all(axis=1) raise). Column-at-a-time keeps the numeric
                # common case vectorized.
                eq = _rows_equal(a[cur.columns], b[cur.columns])
                upd_k = a.index[~eq]
            # r9: vectorized block emission — identical rows in the
            # identical order (inserts then deletes, each sorted by
            # str(key); updates sorted by str(key) with pre/post
            # interleaved PER KEY, preserved via an even/odd index merge)
            ks_ins = sorted(ins_k, key=str)
            ks_del = sorted(del_k, key=str)
            ks_upd = sorted(upd_k, key=str)
            if ks_ins:
                chunks.append(_block(ci.loc[ks_ins], v, "insert"))
            if ks_del:
                chunks.append(_block(pi.loc[ks_del], v, "delete"))
            if ks_upd:
                pre = _block(a.loc[ks_upd], v, "update_pre")
                post = _block(b.loc[ks_upd], v, "update_post")
                pre.index = range(0, 2 * len(ks_upd), 2)
                post.index = range(1, 2 * len(ks_upd), 2)
                chunks.append(pd.concat([pre, post]).sort_index().reset_index(drop=True))
        prev = cur
    cols = ["_version", "_op"] + [c for c in (prev.columns if prev is not None else [])]
    if not chunks:
        # old-shape parity: an empty changeset is always the bare
        # (_version, _op) frame, data columns or not
        return pd.DataFrame(columns=["_version", "_op"])
    return pd.concat(chunks, ignore_index=True)[cols]


def _cell_eq(x, y) -> bool:
    import numpy as np

    if x is y:
        # identity short-circuit: keeps reference-identical cells stable
        # even for types whose __eq__ raises
        return True
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass  # non-scalar cell: isna is elementwise, fall through to ==
    try:
        r = x == y
    except Exception:
        # a raising __eq__ cannot prove equality — report changed
        return False
    if isinstance(r, np.ndarray):
        # array-valued cell: shapes must match (a broadcastable == would
        # let an all-NaN array compare equal to a scalar NaN), and NaN ==
        # NaN holds PER ELEMENT (np.array([nan, 1.0]) in both snapshots
        # is unchanged, not a phantom update on every version step)
        if np.shape(x) != np.shape(y):
            return False
        try:
            r = r | (pd.isna(x) & pd.isna(y))
        except (TypeError, ValueError):
            pass
        return bool(np.all(r))
    try:
        return bool(r)
    except Exception:
        # truth-ambiguous __eq__ result (e.g. a pandas Series cell of
        # equal shape): cannot prove equality — report changed, mirroring
        # the raising-__eq__ branch above
        return False


def _rows_equal(a: pd.DataFrame, b: pd.DataFrame):
    """Boolean mask of positionally-aligned row equality, Series.equals
    semantics per cell (NaN == NaN, dtype-strict across snapshots)."""
    import numpy as np

    eq = np.ones(len(a), dtype=bool)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if sa.dtype != sb.dtype:
            # Series.equals returns False on any dtype mismatch
            return np.zeros(len(a), dtype=bool)
        if sa.dtype == object:
            col = np.fromiter(
                (_cell_eq(x, y) for x, y in zip(sa.to_numpy(), sb.to_numpy())),
                dtype=bool,
                count=len(sa),
            )
        else:
            col = (sa.to_numpy() == sb.to_numpy()) | (sa.isna().to_numpy() & sb.isna().to_numpy())
        eq &= col
    return eq


def changes_df(spark, warehouse: str, name: str, key: str, start_version: Optional[int] = None):
    """The change log as a Spark DataFrame (e.g. name='job_ledger',
    key='job_id' / name='job_cache', key='seed_url')."""
    pdf = changes_pdf(AtomicTable(warehouse, name), key, start_version)
    if pdf.empty:
        return spark.createDataFrame([], "_version long, _op string")
    return spark.createDataFrame(pdf)
