"""Partitioned cuckoo seen-filters — the north rule's second URL-seen
option next to :mod:`bloom` ("partitioned Bloom/cuckoo-filter URL-seen
set", replacing the reference's mutex-guarded visited maps,
Server/Master/master.go:96, 254-262).

Why a second filter: a Bloom filter cannot DELETE. A cuckoo filter
(partial-key cuckoo hashing, Fan, Andersen, Kaminsky & Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public
knowledge) stores short fingerprints in 4-slot buckets and supports exact
deletion of previously-inserted items, which is what a crawl needs for
TTL / re-crawl semantics ("unsee" a URL so the next drain fetches it
again) without rebuilding the whole seen set.

Sharding and IO mirror bloom.py exactly — the engine treats both through
the same 4-function surface (``empty_filter / add_hashes / contains /
load_blobs / write_blob``) plus a params dataclass, so
``EngineConfig.seen_filter = "cuckoo"`` swaps the probe and the fused
write without touching the plan:

* the seen set is sharded into ``seen_buckets`` by ``pmod(url_hash, n)``;
  each shard owns one blob file per touched round, inherited through the
  commit manifest like any Iceberg data file;
* blob updates run executor-side inside the fused ``_write_bucketed``
  task; the driver never sees the hashes;
* probe tasks load only their shard's blob (no broadcast of the filter
  set) and emit maybe-seen flags; positives still go to the exact
  bucket-pruned anti-join, so a false positive can never lose a URL.

Layout: a table of ``n_buckets`` buckets × 4 slots of uint16
fingerprints; 0 = empty (fingerprints are mapped into 1..65535). Partial
key: ``i1 = h & (n-1)``, ``i2 = i1 ^ (ods_hash(fp) & (n-1))`` — the
XOR form makes the pair symmetric, so any occupied slot can be
re-located or evicted knowing only (index, fp). All hot paths are
vectorized numpy over the whole batch; the eviction cascade processes
one victim per full bucket per sweep, still array-at-a-time.

Capacity is fixed at sizing time (the paper's model: partial-key tables
cannot grow in place because the original hash bits are gone); inserts
beyond ~95% load raise ``CuckooFullError`` with the resize arithmetic in
the message. At the 10^10-URL target you size ``n_buckets_log2`` per
shard from the frontier share exactly like SCALE.md sizes the Bloom
bits; with the default 2^18 buckets × 4 slots a shard holds ~1M URLs in
a 2 MiB blob at an FP rate of ~2^-13 (3 bits better than the default
Bloom config at similar bytes/key).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

_SLOTS = 4  # slots per bucket (the paper's sweet spot for 95% load)
_MAX_SWEEPS = 500


class CuckooFullError(RuntimeError):
    pass


@dataclass(frozen=True)
class CuckooParams:
    n_buckets_log2: int = 18  # 2^18 buckets * 4 slots ≈ 1M capacity/shard

    @property
    def n_buckets(self) -> int:
        return 1 << self.n_buckets_log2

    @property
    def capacity(self) -> int:
        return self.n_buckets * _SLOTS


def empty_filter(p: CuckooParams) -> np.ndarray:
    return np.zeros((p.n_buckets, _SLOTS), dtype=np.uint16)


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """uint16 fingerprints from the TOP hash bits (i1 uses the low bits —
    fp and index stay independent); 0 is the empty-slot sentinel so 0
    maps to 1."""
    h = hashes.astype(np.int64).view(np.uint64)
    fp = (h >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _fp_hash(fp: np.ndarray) -> np.ndarray:
    """Fingerprint → bucket-offset hash (MurmurHash-style multiply, the
    constant used by the paper's reference implementation — public)."""
    return (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFFFFFF)


def _index_pair(hashes: np.ndarray, fp: np.ndarray, p: CuckooParams):
    mask = np.uint64(p.n_buckets - 1)
    i1 = (hashes.astype(np.int64).view(np.uint64) & mask).astype(np.int64)
    i2 = (i1.view(np.uint64) ^ (_fp_hash(fp) & mask)).astype(np.int64)
    return i1, i2


def _alt_index(idx: np.ndarray, fp: np.ndarray, p: CuckooParams) -> np.ndarray:
    mask = np.uint64(p.n_buckets - 1)
    return (idx.astype(np.int64).view(np.uint64) ^ (_fp_hash(fp) & mask)).astype(np.int64)


def contains(filt: np.ndarray, hashes: np.ndarray, p: CuckooParams) -> np.ndarray:
    """True = maybe-seen (needs the exact re-check), False = definitely
    new — same contract as bloom.contains."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    h = np.asarray(hashes, dtype=np.int64)
    fp = _fingerprints(h)
    i1, i2 = _index_pair(h, fp, p)
    fpc = fp[:, None]
    return ((filt[i1] == fpc) | (filt[i2] == fpc)).any(axis=1)


def _rank_within_group(keys: np.ndarray):
    """(order, rank): stable sort order of `keys` and each element's rank
    within its equal-key run (0-based), both aligned to the SORTED order."""
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    first = np.zeros(len(sk), dtype=bool)
    if len(sk):
        first[0] = True
        first[1:] = sk[1:] != sk[:-1]
    run_id = np.cumsum(first) - 1
    run_start = np.flatnonzero(first)
    rank = np.arange(len(sk)) - run_start[run_id]
    return order, sk, rank


def _place_free(filt: np.ndarray, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Place as many (idx, fp) items as fit into free slots of their
    target buckets (conflict-free: per-bucket ranks meet per-bucket free
    counts). Returns a boolean placed-mask aligned to the input."""
    placed = np.zeros(len(idx), dtype=bool)
    if len(idx) == 0:
        return placed
    order, sidx, rank = _rank_within_group(idx)
    rows = filt[sidx]  # (n, 4) gather
    occupied = rows != 0
    free_cnt = _SLOTS - occupied.sum(axis=1)
    fits = rank < free_cnt
    if not fits.any():
        return placed
    # rank-th free slot: argsort puts free (False) columns first, stably
    free_order = np.argsort(occupied, axis=1, kind="stable")
    cols = free_order[np.arange(len(sidx)), np.minimum(rank, _SLOTS - 1)]
    tgt = order[fits]
    filt[idx[tgt], cols[fits]] = fp[tgt]
    placed[tgt] = True
    return placed


def add_hashes(filt: np.ndarray, hashes: np.ndarray, p: CuckooParams) -> None:
    """Bulk-insert with SET semantics (a hash already present — or
    duplicated within the batch — is inserted once). Mutates `filt` in
    place like bloom.add_hashes. Deterministic: the eviction walk is
    seeded from the fingerprint, never a RNG."""
    h = np.unique(np.asarray(hashes, dtype=np.int64))
    if len(h) == 0:
        return
    fp = _fingerprints(h)
    keep = ~contains(filt, h, p)
    fp, hh = fp[keep], h[keep]
    if len(hh) == 0:
        return
    i1, i2 = _index_pair(hh, fp, p)
    # pending state: fingerprint, current target, alternate target
    cur, alt = i1.copy(), i2.copy()
    pend_fp = fp.copy()
    kicks = np.zeros(len(pend_fp), dtype=np.int64)
    for sweep in range(_MAX_SWEEPS):
        if len(pend_fp) == 0:
            return
        placed = _place_free(filt, cur, pend_fp)
        if placed.all():
            return
        rem = ~placed
        pend_fp, cur, alt, kicks = pend_fp[rem], cur[rem], alt[rem], kicks[rem]
        # items that haven't tried their alternate bucket yet swap targets;
        # items that bounced off both evict a victim from `cur`
        fresh = kicks == 0
        cur[fresh], alt[fresh] = alt[fresh], cur[fresh]
        kicks[fresh] = 1
        evict = ~fresh
        if evict.any():
            # one eviction per distinct full bucket per sweep (array-wide):
            # the lowest-rank pending item on each bucket swaps its fp with
            # a victim slot chosen deterministically from (fp, sweep)
            eidx = np.flatnonzero(evict)
            order, sidx, rank = _rank_within_group(cur[eidx])
            lead = eidx[order[rank == 0]]
            vcol = ((pend_fp[lead].astype(np.int64) + sweep) % _SLOTS).astype(np.int64)
            vbkt = cur[lead]
            victim_fp = filt[vbkt, vcol].copy()
            filt[vbkt, vcol] = pend_fp[lead]
            # the displaced fingerprint re-enters the walk toward ITS
            # alternate bucket (symmetric partial-key: alt from (bucket, fp))
            pend_fp[lead] = victim_fp
            cur[lead] = _alt_index(vbkt, victim_fp, p)
            alt[lead] = vbkt
            kicks[lead] += 1
    load = (filt != 0).sum() / filt.size
    raise CuckooFullError(
        f"cuckoo shard over capacity (load {load:.3f}, {filt.size} slots): "
        f"size n_buckets_log2 (now {p.n_buckets_log2}) for the shard's URL "
        f"share at ~0.95 max load, or raise EngineConfig.seen_buckets"
    )


def delete_hashes(filt: np.ndarray, hashes: np.ndarray, p: CuckooParams) -> np.ndarray:
    """Remove each (distinct) hash's fingerprint from one slot, if
    present. Returns a per-input boolean deleted-mask. This is the
    operation Bloom cannot do — TTL/re-crawl 'unsee'.

    Contract (the paper's §3.3): only delete keys that were actually
    inserted, AND whose stored copy is not shared. Two hazards create
    false negatives:

    * deleting a never-inserted key whose (bucket, fingerprint) pair
      collides with a stored key removes THAT key's entry;
    * because add_hashes is set-semantic (one stored copy per distinct
      (bucket, fp) — required by the chunked-blob entry merge in
      load_blobs), two DISTINCT inserted keys colliding on (bucket, fp)
      share one copy, and deleting either key strands the other. At a
      10^10-key deployment with 16-bit fingerprints such collisions are
      guaranteed.

    The engine therefore never calls this on live data: unsee REBUILDS
    the touched buckets' filters from the exact surviving seen rows
    (plans/frontier.py _rebuild_filter_blobs), which is collision-proof
    by construction. delete_hashes remains for callers that track key
    multiplicity themselves."""
    h = np.asarray(hashes, dtype=np.int64)
    out = np.zeros(len(h), dtype=bool)
    hu, inv = np.unique(h, return_inverse=True)
    fp = _fingerprints(hu)
    i1, i2 = _index_pair(hu, fp, p)
    deleted = np.zeros(len(hu), dtype=bool)
    for idx in (i1, i2):
        rem = np.flatnonzero(~deleted)
        if len(rem) == 0:
            break
        # one slot per item; serialize same-bucket deletions by rank so two
        # distinct hashes sharing (bucket, fp) free two slots, not one.
        # Ranks run as far as the densest bucket's target count (NOT capped
        # at _SLOTS — a bucket can be targeted by many distinct-fp deletes)
        order, sidx, rank = _rank_within_group(idx[rem])
        for rk in range(int(rank.max()) + 1 if len(rank) else 0):
            sel = rem[order[rank == rk]]
            if len(sel) == 0:
                break
            rows = filt[idx[sel]]
            hit = rows == fp[sel][:, None]
            has = hit.any(axis=1)
            col = hit.argmax(axis=1)
            filt[idx[sel][has], col[has]] = 0
            deleted[sel[has]] = True
    return deleted[inv]


def entries(filt: np.ndarray, p: CuckooParams):
    """(canonical_index, fp) pairs of all occupied slots, deduplicated —
    the two buckets of a pair are interchangeable, so the canonical index
    is min(i, alt(i, fp)); used to merge blob files."""
    idx, col = np.nonzero(filt)
    fp = filt[idx, col]
    alt = _alt_index(idx, fp, p)
    canon = np.minimum(idx, alt)
    pairs = np.stack([canon, fp.astype(np.int64)], axis=1)
    return np.unique(pairs, axis=0)


def _insert_pairs(filt: np.ndarray, canon: np.ndarray, fp: np.ndarray, p: CuckooParams) -> None:
    """Insert (canonical_index, fp) pairs — the merge path. Same walk as
    add_hashes but the starting pair comes from the stored entry."""
    fpc = fp[:, None]
    i2 = _alt_index(canon, fp.astype(np.uint16), p)
    present = ((filt[canon] == fpc) | (filt[i2] == fpc)).any(axis=1)
    rem = ~present
    canon, fp, i2 = canon[rem], fp[rem], i2[rem]
    cur, alt = canon.copy(), i2
    pend_fp = fp.astype(np.uint16)
    kicks = np.zeros(len(pend_fp), dtype=np.int64)
    for sweep in range(_MAX_SWEEPS):
        if len(pend_fp) == 0:
            return
        placed = _place_free(filt, cur, pend_fp)
        if placed.all():
            return
        rm = ~placed
        pend_fp, cur, alt, kicks = pend_fp[rm], cur[rm], alt[rm], kicks[rm]
        fresh = kicks == 0
        cur[fresh], alt[fresh] = alt[fresh], cur[fresh]
        kicks[fresh] = 1
        evict = ~fresh
        if evict.any():
            eidx = np.flatnonzero(evict)
            order, _sidx, rank = _rank_within_group(cur[eidx])
            lead = eidx[order[rank == 0]]
            vcol = ((pend_fp[lead].astype(np.int64) + sweep) % _SLOTS).astype(np.int64)
            vbkt = cur[lead]
            victim_fp = filt[vbkt, vcol].copy()
            filt[vbkt, vcol] = pend_fp[lead]
            pend_fp[lead] = victim_fp
            cur[lead] = _alt_index(vbkt, victim_fp, p)
            alt[lead] = vbkt
            kicks[lead] += 1
    raise CuckooFullError("cuckoo shard over capacity during blob merge")


def load_blob(path: str, p: CuckooParams) -> np.ndarray:
    if path and os.path.exists(path):
        arr = np.fromfile(path, dtype=np.uint16)
        return arr.reshape(-1, _SLOTS)
    return empty_filter(p)


def load_blobs(paths, p: CuckooParams) -> np.ndarray:
    """Merge one shard's blob file(s). Chunked rounds write one blob per
    chunk, each = previous filter + that chunk's items (same layout rule
    as bloom); a cuckoo union is NOT a bitwise OR, so later files merge
    into the first by re-inserting their deduplicated (index, fp)
    entries — set semantics make the shared 'previous' entries no-ops."""
    if paths is None or isinstance(paths, str):
        return load_blob(paths or "", p)
    live = [path for path in paths if path and os.path.exists(path)]
    if not live:
        return empty_filter(p)
    filt = load_blob(live[0], p)
    for path in live[1:]:
        other = load_blob(path, p)
        pairs = entries(other, p)
        if len(pairs):
            _insert_pairs(filt, pairs[:, 0], pairs[:, 1], p)
    return filt


def write_blob(path: str, filt: np.ndarray) -> None:
    import uuid

    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex[:12]}.tmp")
    filt.tofile(tmp)
    os.replace(tmp, path)
