"""CDC view over AtomicTable version history: inserts, updates with
pre/post images, deletes (eviction/reaping), and incremental reads from a
start version — Delta-CDF-style ops over the CAS snapshot chain."""

from distributed_web_crawler_spark.catalog.changes import changes_df, changes_pdf, snapshots
from distributed_web_crawler_spark.catalog.tables import AtomicTable
from distributed_web_crawler_spark.plans.ledger import JobCache, JobLedger


def test_ledger_change_log(tmp_path):
    wh = str(tmp_path)
    led = JobLedger(wh)
    led.submit("J1", "c0", "u1", 2, now=100.0)
    led.submit("J2", "c1", "u2", 1, now=101.0)
    led.acquire("m1", now=102.0)  # J1 pending -> running
    led.complete("J1")  # running -> done
    t = AtomicTable(wh, "job_ledger")
    pdf = changes_pdf(t, key="job_id")
    ops = list(zip(pdf["_op"], pdf["job_id"]))
    assert ops[0] == ("insert", "J1")
    assert ("insert", "J2") in ops
    # acquire + complete each produce an update pre/post pair for J1
    j1_updates = [o for o, j in ops if j == "J1" and o.startswith("update")]
    assert j1_updates == ["update_pre", "update_post", "update_pre", "update_post"]
    post_states = pdf[(pdf["job_id"] == "J1") & (pdf["_op"] == "update_post")]["state"].tolist()
    assert post_states == ["running", "done"]


def test_cache_eviction_appears_as_delete(tmp_path):
    wh = str(tmp_path)
    cache = JobCache(wh, ttl_s=1000.0, max_entries=2)
    cache.put_if_deeper("u0", 1, [["a"]], now=0.0)
    cache.put_if_deeper("u1", 1, [["b"]], now=1.0)
    cache.get("u1", 1, now=2.0)  # u1 hot
    cache.put_if_deeper("u2", 1, [["c"]], now=3.0)  # evicts cold u0
    pdf = changes_pdf(AtomicTable(wh, "job_cache"), key="seed_url")
    deletes = pdf[pdf["_op"] == "delete"]["seed_url"].tolist()
    assert deletes == ["u0"]


def test_incremental_read_and_spark_view(spark, tmp_path):
    wh = str(tmp_path)
    led = JobLedger(wh)
    led.submit("J1", "c0", "u1", 1, now=100.0)
    t = AtomicTable(wh, "job_ledger")
    v1 = snapshots(t)[-1]
    led.submit("J2", "c0", "u2", 1, now=101.0)
    # incremental: only changes after v1
    pdf = changes_pdf(t, key="job_id", start_version=v1)
    assert list(zip(pdf["_op"], pdf["job_id"])) == [("insert", "J2")]
    df = changes_df(spark, wh, "job_ledger", key="job_id")
    rows = df.orderBy("_version", "_op").collect()
    assert [r["_op"] for r in rows] == ["insert", "insert"]
    assert {r["job_id"] for r in rows} == {"J1", "J2"}

def test_expired_start_version_raises(tmp_path):
    """A checkpointed start_version that compact() expired must fail loudly
    (Delta/Iceberg behavior) instead of replaying the first surviving
    snapshot as inserts — a resuming consumer would double-count rows."""
    import pytest

    wh = str(tmp_path)
    led = JobLedger(wh)
    for k in range(8):
        led.submit(f"J{k}", "c", f"u{k}", 1, now=100.0 + k)
    t = AtomicTable(wh, "job_ledger")
    v_checkpoint = snapshots(t)[1]  # consumer checkpointed v2
    t.compact(keep_last=3)  # ... which expires v1..v5
    with pytest.raises(ValueError, match="compacted away"):
        changes_pdf(t, key="job_id", start_version=v_checkpoint)
    # start after the newest snapshot is legal: empty change set, no raise
    assert changes_pdf(t, key="job_id", start_version=snapshots(t)[-1]).empty
    # surviving checkpoints still work
    pdf = changes_pdf(t, key="job_id", start_version=snapshots(t)[0])
    assert (pdf["_op"] == "insert").sum() == 2


def test_unknown_start_version_raises(tmp_path):
    """start_version BEYOND the newest snapshot (corrupted checkpoint /
    rolled-back or rebuilt table) must raise, not silently return an empty
    changeset that hides every future row from the consumer. A
    start_version == newest snapshot stays a legal empty read."""
    import pytest

    wh = str(tmp_path)
    led = JobLedger(wh)
    led.submit("J1", "c", "u1", 1, now=100.0)
    t = AtomicTable(wh, "job_ledger")
    newest = snapshots(t)[-1]
    assert changes_pdf(t, key="job_id", start_version=newest).empty
    with pytest.raises(ValueError, match="not a committed snapshot"):
        changes_pdf(t, key="job_id", start_version=newest + 7)
    with pytest.raises(ValueError, match="not a committed snapshot"):
        changes_pdf(AtomicTable(wh, "never_written"), key="job_id", start_version=3)


def _commit_pdf(table, pdf):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = table.new_version_path()
    os.makedirs(path)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path + "/data.parquet")
    assert table.publish(path)


def test_dtype_only_change_emits_update(tmp_path):
    """Series.equals semantics are DTYPE-STRICT: an int64 1 that becomes a
    float64 1.0 across snapshots is a change and must emit an update
    pre/post pair (the vectorized diff must not paper over it via ==)."""
    import pandas as pd

    t = AtomicTable(str(tmp_path), "tt")
    _commit_pdf(t, pd.DataFrame({"k": ["a", "b"], "x": pd.array([1, 2], dtype="int64")}))
    _commit_pdf(t, pd.DataFrame({"k": ["a", "b"], "x": pd.array([1.0, 2.0], dtype="float64")}))
    pdf = changes_pdf(t, key="k")
    v2 = pdf[pdf["_version"] == 2]
    assert list(v2["_op"]) == ["update_pre", "update_post", "update_pre", "update_post"]


def test_non_scalar_cells_do_not_crash(tmp_path):
    """An object column holding lists/arrays must diff per cell, not raise
    (a flat values == would nest an ndarray and break .all(axis=1))."""
    import pandas as pd

    t = AtomicTable(str(tmp_path), "tt")
    _commit_pdf(t, pd.DataFrame({"k": ["a", "b"], "tags": [[1, 2], [3]]}))
    _commit_pdf(t, pd.DataFrame({"k": ["a", "b"], "tags": [[1, 2], [3, 4]]}))
    pdf = changes_pdf(t, key="k")
    v2 = pdf[pdf["_version"] == 2]
    ops = list(zip(v2["_op"], v2["k"]))
    assert ops == [("update_pre", "b"), ("update_post", "b")]


def test_array_cells_with_nan_are_not_phantom_updates(tmp_path):
    """NaN == NaN must hold inside array-valued cells too: an unchanged
    np.array([nan, 1.0]) cell must not emit update pairs every step."""
    import numpy as np
    import pandas as pd

    t = AtomicTable(str(tmp_path), "tt")
    _commit_pdf(t, pd.DataFrame({"k": ["a"], "v": [[np.nan, 1.0]]}))
    _commit_pdf(t, pd.DataFrame({"k": ["a"], "v": [[np.nan, 1.0]]}))
    _commit_pdf(t, pd.DataFrame({"k": ["a"], "v": [[np.nan, 2.0]]}))
    pdf = changes_pdf(t, key="k")
    assert list(pdf[pdf["_version"] == 2]["_op"]) == []  # unchanged
    assert list(pdf[pdf["_version"] == 3]["_op"]) == ["update_pre", "update_post"]


def test_array_vs_scalar_nan_is_a_change(tmp_path):
    """An all-NaN array cell must NOT compare equal to a scalar NaN cell
    (shape change is a change — a broadcastable == would hide it)."""
    import numpy as np
    import pandas as pd

    from distributed_web_crawler_spark.catalog.changes import _cell_eq

    assert not _cell_eq(np.array([np.nan, np.nan]), float("nan"))
    assert not _cell_eq(np.array([np.nan]), np.array([np.nan, np.nan]))
    assert _cell_eq(np.array([np.nan, 1.0]), np.array([np.nan, 1.0]))
    x = pd.DataFrame()  # __eq__-hostile object: identity keeps it stable
    assert _cell_eq(x, x)
