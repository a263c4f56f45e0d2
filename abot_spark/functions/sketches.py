"""Probabilistic seen-set sketches: Bloom + cuckoo filters (numpy).

The reference's URL-seen set is a ``ConcurrentDictionary<long, byte>`` keyed
by the first 8 MD5 bytes of the absolute URL
(``Abot/Core/Repositories/CrawledUrlRepository.cs:20, 41-76``) — an exact
hash set whose documented contract is "no false negatives; hash collisions
(false positives) tolerated by design" (``:9-11``, asserted by
``Abot.Tests.Unit/Core/CrawledUrlRepositoryTest.cs:60-89``).

At a 10^10-URL frontier that contract is exactly a Bloom/cuckoo contract,
which is why the scale design (SURVEY.md §4, north_star) keeps the *exact*
anti-join on the bucketed ``seen`` table as the source of truth and layers
two sketch sidecars on top as join pruners:

- :class:`BloomFilter` — the per-shard kernel of the sharded sidecar
  (:class:`abot_spark.store.BloomSeenShards`): one standalone filter per
  ``pmod(url_hash, B)`` bucket, living as an immutable file per (bucket,
  wave) on shared storage.  Absorb and probe both run executor-side,
  bucket-locally — nothing is driver-merged or broadcast, which is what
  survives the ~12 GB filter a 10^10-URL seen-set implies.  Candidates
  the filter rules out are *definitely new* and skip the exact seen-join
  (the overwhelming majority on a warmed-up crawl); false positives only
  send extra rows through the exact join, never drop one.
- :class:`CuckooFilter` — a per-bucket sidecar with *deletion* support
  (fingerprint displacement, Fan et al., CoNEXT'14), for the
  ``AllowUriRecrawling`` mode where seen marks can be retracted
  (``Scheduler.cs:78-86`` bypasses AddIfNew; a recrawl-enabled store must
  be able to unmark).  Lookup is vectorized numpy over the two candidate
  buckets; no false negatives while load < capacity.

Both sketches key on the already-computed ``xxhash64(canonical_url)``
int64 column — they never rehash the URL string.

Everything here is plain numpy on int64/uint64 arrays so the pandas-UDF
path stays Arrow-vectorized (no per-row Python, per BASELINE input_hint).
"""

from __future__ import annotations

import math

import numpy as np

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain integer mixer (Steele et al.);
    decorrelates the two probe hashes from the single input hash."""
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)) & _MASK
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
        return x ^ (x >> _U64(31))


def _as_u64(hashes) -> np.ndarray:
    return np.asarray(hashes, dtype=np.int64).view(np.uint64)


class BloomFilter:
    """Bitpacked Bloom filter over int64 keys, double-hashing probe scheme
    (Kirsch & Mitzenmacher: g_i = h1 + i*h2 is FPR-equivalent to k
    independent hashes).

    Supports an internal ``n_buckets`` slicing (a key's k probe positions
    all land inside its ``hash & (B-1)`` slice — FPR unchanged since
    xxhash64 keys spread uniformly); the sharded seen sidecar uses
    standalone per-shard instances (``n_buckets=1``), with the sharding
    done at the FILE level by :class:`abot_spark.store.BloomSeenShards`
    so absorb and probe stay executor-local, never driver-merged.
    """

    def __init__(self, expected_items: int, fpp: float = 0.01,
                 bits: np.ndarray | None = None, n_buckets: int = 64):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be pow2"
        m = max(64 * n_buckets,
                int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
        # power-of-two bit count: the probe modulo becomes a mask (the
        # modulo dominated insert/probe cost); never worse than optimal-m FPR
        self.m_bits = 1 << (m - 1).bit_length()
        self.n_buckets = n_buckets
        self.mb_bits = self.m_bits // n_buckets    # slice size (pow2)
        # k from the target fpp (= optimal for the pre-rounding m); the
        # rounded-up m only lowers the realized FPR further
        self.k = max(1, round(-math.log2(fpp)))
        self.expected_items = expected_items
        self.fpp = fpp
        self.bits = (np.zeros(self.m_bits // 8, dtype=np.uint8)
                     if bits is None else bits)
        self.n_added = 0          # approximate (not persisted by to_bytes)

    def _probe_hashes(self, hashes) -> tuple[np.ndarray, np.ndarray]:
        h = _as_u64(hashes)
        h1 = _mix64(h)
        h2 = _mix64(h ^ _MASK) | _U64(1)   # odd -> full-period stride
        return h1, h2

    def bucket_of(self, hashes) -> np.ndarray:
        return (_as_u64(hashes) & _U64(self.n_buckets - 1)).astype(np.int64)

    def _global_pos(self, hashes, i: int) -> np.ndarray:
        """Probe i's global bit position: bucket base + in-bucket offset."""
        h1, h2 = self._probe_hashes(hashes)
        base = _as_u64(self.bucket_of(hashes)) * _U64(self.mb_bits)
        with np.errstate(over="ignore"):
            return base + ((h1 + _U64(i) * h2) & _U64(self.mb_bits - 1))

    def add_many(self, hashes) -> None:
        if len(hashes) == 0:
            return
        # bool scatter + packbits beats bitwise_or.at ~10x (no per-element
        # read-modify-write); the transient bool plane is m_bits bytes
        h1, h2 = self._probe_hashes(hashes)
        base = _as_u64(self.bucket_of(hashes)) * _U64(self.mb_bits)
        mask = _U64(self.mb_bits - 1)
        plane = np.zeros(self.m_bits, dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos = base + ((h1 + _U64(i) * h2) & mask)
                plane[pos.astype(np.int64)] = True
        self.bits |= np.packbits(plane, bitorder="little")
        self.n_added += len(hashes)

    def contains_many(self, hashes) -> np.ndarray:
        """Vectorized membership: bool array, no false negatives."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._probe_hashes(hashes)
        base = _as_u64(self.bucket_of(hashes)) * _U64(self.mb_bits)
        mask = _U64(self.mb_bits - 1)
        ok = np.ones(len(h1), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos = base + ((h1 + _U64(i) * h2) & mask)
                byte = self.bits[(pos >> _U64(3)).astype(np.int64)]
                ok &= ((byte >> (pos & _U64(7)).astype(np.uint8)) & 1).astype(bool)
        return ok

    # -- (de)serialization — the shard-file payload -------------------------
    #
    # Self-describing header so a worker can rebuild the filter from the
    # broadcast bytes alone: magic "ABF2", then uint32 n_buckets, uint64
    # expected_items, float64 fpp (little-endian), then the bit array.

    _MAGIC = b"ABF2"
    _HDR = 4 + 4 + 8 + 8

    def to_bytes(self) -> bytes:
        import struct

        hdr = self._MAGIC + struct.pack(
            "<IQd", self.n_buckets, self.expected_items, self.fpp)
        return hdr + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, expected_items: int | None = None,
                   fpp: float | None = None) -> "BloomFilter":
        import struct

        if raw[:4] != cls._MAGIC:
            raise ValueError("not a bloom sidecar payload (bad magic)")
        n_buckets, exp, f = struct.unpack("<IQd", raw[4:cls._HDR])
        if expected_items is not None and expected_items != exp:
            raise ValueError(
                f"bloom sidecar was built for expected_items={exp}, caller"
                f" configured {expected_items} — config changed between runs")
        bf = cls(exp, f, n_buckets=n_buckets)
        body = raw[cls._HDR:]
        if len(body) != len(bf.bits):
            raise ValueError(
                f"bloom sidecar is {len(body)} bytes, expected"
                f" {len(bf.bits)} — expected_items/fpp changed between runs")
        bf.bits = np.frombuffer(body, dtype=np.uint8).copy()
        return bf


class CuckooFilter:
    """(2,4)-cuckoo filter over int64 keys: 16-bit fingerprints, 4 slots
    per bucket, partial-key displacement; supports delete (needed when seen
    marks can be retracted under AllowUriRecrawling)."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, table: np.ndarray | None = None):
        n_buckets = 1
        while n_buckets * 4 < capacity / 0.95:
            n_buckets <<= 1          # power of two -> mask instead of mod
        self.n_buckets = n_buckets
        self.table = (np.zeros((n_buckets, 4), dtype=np.uint16)
                      if table is None else table)
        self.n_items = int(np.count_nonzero(self.table)) if table is not None else 0
        self._rng = np.random.default_rng(0)   # deterministic eviction choice

    def _fp_and_bucket(self, hashes) -> tuple[np.ndarray, np.ndarray]:
        h = _as_u64(hashes)
        fp = (_mix64(h) & _U64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)       # 0 = empty slot
        b1 = (_mix64(h ^ _U64(0x5BF0)) & _U64(self.n_buckets - 1)).astype(np.int64)
        return fp, b1

    def _alt_bucket(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # standard partial-key cuckoo: alt = b xor H(fp)
        return (b ^ _mix64(fp.astype(np.uint64)).astype(np.int64)) \
            & (self.n_buckets - 1)

    def add_many(self, hashes) -> int:
        """Insert; returns number successfully inserted (full filter drops —
        callers size capacity ahead, and the exact seen table remains the
        source of truth)."""
        fp, b1 = self._fp_and_bucket(hashes)
        b2 = self._alt_bucket(b1, fp)
        ok = 0
        for f, x, y in zip(fp, b1, b2):
            if self._insert_one(int(f), int(x), int(y)):
                ok += 1
        return ok

    def _insert_one(self, f: int, b1: int, b2: int) -> bool:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                self.n_items += 1
                return True
        b = b1 if self._rng.integers(2) else b2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(4))
            f, self.table[b, slot] = int(self.table[b, slot]), f
            b = int(self._alt_bucket(np.array([b]), np.array([f], np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                self.n_items += 1
                return True
        return False

    def contains_many(self, hashes) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1 = self._fp_and_bucket(hashes)
        b2 = self._alt_bucket(b1, fp)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, hashes) -> int:
        fp, b1 = self._fp_and_bucket(hashes)
        b2 = self._alt_bucket(b1, fp)
        removed = 0
        for f, x, y in zip(fp, b1, b2):
            for b in (int(x), int(y)):
                slots = np.nonzero(self.table[b] == f)[0]
                if len(slots):
                    self.table[b, slots[0]] = 0
                    self.n_items -= 1
                    removed += 1
                    break
        return removed

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, capacity: int) -> "CuckooFilter":
        cf = cls(capacity)
        cf.table = np.frombuffer(raw, dtype=np.uint16) \
            .reshape(cf.n_buckets, 4).copy()
        cf.n_items = int(np.count_nonzero(cf.table))
        return cf
