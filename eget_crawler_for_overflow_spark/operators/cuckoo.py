"""Cuckoo filter — the deletable fallback for the URL-seen fast path.

The north rule asks for "bloom/cuckoo URL-seen": Bloom shards (seen.py)
are the default for the append-only seen set; this cuckoo filter is the
drop-in when the fast path must support deletions/rotation (e.g. recrawl
windows where URLs age out). Standard design (Fan et al., CoNLL'14):
4-slot buckets, 16-bit fingerprints, partial-key cuckoo hashing —
i2 = i1 XOR hash(fingerprint) — with bounded eviction kicks.

numpy-vectorized lookups (the hot path); inserts are amortized per
generation batch. Same interface shape as BloomShard so SeenSet can swap
implementations per shard.
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_FP_BITS = 16


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


class CuckooShard:
    def __init__(self, expected_n: int, load_factor: float = 0.84):
        n_buckets = 1
        while n_buckets * _SLOTS * load_factor < expected_n:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        self._rng_state = np.uint64(0x243F6A8885A308D3)  # deterministic kicks

    # -- hashing ----------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (_splitmix64(h) & np.uint64((1 << _FP_BITS) - 1)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # reserve 0 for empty

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fph = _splitmix64(fp.astype(np.uint64))
        return ((i1.astype(np.uint64) ^ fph) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    # -- single-key ops (batch inserts loop; lookups are vectorized) ------
    def _insert_one(self, i1: int, fp: int) -> bool:
        for idx in (i1, int(self._i2(np.array([i1]), np.array([fp], np.uint16))[0])):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict: bounded random-walk kicks
        idx = i1
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            self._rng_state = _splitmix64(np.array([self._rng_state]))[0]
            slot = int(self._rng_state % _SLOTS)
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(
                self._i2(np.array([idx]), np.array([cur], np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table over-full (caller should resize)

    def add(self, hashes: np.ndarray) -> int:
        """Insert a batch; returns how many were inserted (idempotence is
        NOT checked — callers dedupe first, as SeenSet does)."""
        if len(hashes) == 0:
            return 0
        h = hashes.astype(np.uint64)
        fps = self._fp(h)
        i1s = self._i1(h)
        ok = 0
        for i1, fp in zip(i1s, fps):
            if self._insert_one(int(i1), int(fp)):
                ok += 1
        return ok

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, hashes: np.ndarray) -> int:
        """Remove fingerprints (the operation Bloom cannot do)."""
        removed = 0
        h = hashes.astype(np.uint64)
        fps = self._fp(h)
        i1s = self._i1(h)
        i2s = self._i2(i1s, fps)
        for i1, i2, fp in zip(i1s, i2s, fps):
            for idx in (int(i1), int(i2)):
                row = self.table[idx]
                hit = np.flatnonzero(row == fp)
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed
