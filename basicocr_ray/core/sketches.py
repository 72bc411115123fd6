"""Mergeable sketches for near-duplicate detection: MinHash + SimHash.

Public-knowledge constructions (Broder 1997 MinHash; Charikar 2002 SimHash;
banding/LSH per Mining of Massive Datasets ch.3). Vectorized with numpy;
all randomness comes from fixed seeds so signatures are reproducible across
workers and rounds — a hard requirement for distributed dedup.
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash64(token: str) -> int:
    """Stable 64-bit token hash (md5-derived; NEVER Python hash(), which is
    salted per-process and would break cross-worker determinism)."""
    return struct.unpack("<Q", hashlib.md5(token.encode("utf-8")).digest()[:8])[0]


def shingles(text: str, k: int = 5) -> set[str]:
    """Character k-shingles of the lowercased text."""
    text = text.lower()
    if len(text) <= k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


class MinHasher:
    """num_perm universal-hash MinHash over character shingles.

    h_i(x) = (a_i * x + b_i) mod p  (p = 2^61-1), coefficients drawn once
    from a seeded generator — identical in every worker.
    """

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 1234):
        self.num_perm = num_perm
        self.k = k
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # one C SipHash pass over all shingles (pandas' fixed-key hash —
        # cross-worker deterministic; was one md5 per shingle through
        # Python struct, the dominant cost of the whole dedup family)
        import pandas as _pd

        xs = _pd.util.hash_array(np.asarray(list(sh), dtype=object))
        # (num_perm, n_shingles) without overflow: use object->mod via python ints
        # is slow; uint64 wraparound is fine as a PRF as long as it is the
        # same everywhere (documented deviation from exact mod-p hashing).
        vals = (self.a[:, None] * xs[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def signatures_batch(
        self, texts: list[str | None], return_counts: bool = False
    ) -> np.ndarray:
        """Signatures for a WHOLE batch: (len(texts), num_perm) uint64.

        Bit-identical to per-doc :meth:`signature` (tested), but pays the
        pandas hash-call and numpy dispatch overhead ONCE per batch
        instead of once per document: all documents' shingles hash in a
        single C pass, and each permutation row reduces per-document via
        ``np.minimum.reduceat`` over the segment offsets. Empty docs get
        the UINT64_MAX sentinel row, as before.

        With ``return_counts=True`` also returns the per-document
        DISTINCT shingle count (int64, the exact |A| of the Jaccard
        set) — already computed for the reduceat segmentation, so the
        caller's size-ratio prefilter costs nothing extra here."""
        import pandas as _pd

        n = len(texts)
        out = np.full(
            (n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        all_sh: list[str] = []
        counts = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            sh = shingles(t or "", self.k)
            counts[i] = len(sh)
            all_sh.extend(sh)
        if not all_sh:
            return (out, counts) if return_counts else out
        xs = _pd.util.hash_array(np.asarray(all_sh, dtype=object))
        nz = counts > 0
        seg = counts[nz]
        starts = np.concatenate(
            ([0], np.cumsum(seg)[:-1])
        ).astype(np.int64)
        mins = np.empty((int(nz.sum()), self.num_perm), dtype=np.uint64)
        for r in range(self.num_perm):
            vals = (self.a[r] * xs + self.b[r]) % _MERSENNE
            mins[:, r] = np.minimum.reduceat(vals, starts)
        out[nz] = mins
        return (out, counts) if return_counts else out

    def bands_batch(
        self, sigs: np.ndarray, num_bands: int = 16
    ) -> np.ndarray:
        """Band hashes for a whole batch of signatures: (n, num_bands)
        uint64, identical values to per-doc :meth:`bands` (same mix, same
        fold order)."""
        rows = self.num_perm // num_bands
        chunks = sigs[:, : num_bands * rows].reshape(
            len(sigs), num_bands, rows
        )
        mixed = chunks * self._BAND_MIX
        mixed ^= mixed >> np.uint64(29)
        h = np.zeros((len(sigs), num_bands), dtype=np.uint64)
        for r in range(rows):  # rows is tiny (2-4); docs stay vectorized
            h = (h * np.uint64(0xC2B2AE3D27D4EB4F)) ^ mixed[:, :, r]
        h ^= h >> np.uint64(32)
        h *= self._BAND_MIX
        h ^= h >> np.uint64(29)
        return h

    @staticmethod
    def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    _BAND_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier

    def bands(self, sig: np.ndarray, num_bands: int = 16) -> list[tuple[int, int]]:
        """LSH banding: → [(band_id, band_hash)]; docs sharing any pair are
        near-dup candidates (MMDS ch.3 banding technique). Band hashes are
        a vectorized multiply-shift mix of each row chunk (deterministic;
        equal chunks ⇒ equal hashes, which is all banding needs — an md5
        per band was ~30% of the signature stage)."""
        rows = self.num_perm // num_bands
        chunks = sig[: num_bands * rows].reshape(num_bands, rows)
        mixed = chunks * self._BAND_MIX
        mixed ^= mixed >> np.uint64(29)
        h = np.zeros(num_bands, dtype=np.uint64)
        for r in range(rows):  # rows is tiny (2-4); columns stay vectorized
            h = (h * np.uint64(0xC2B2AE3D27D4EB4F)) ^ mixed[:, r]
        h ^= h >> np.uint64(32)
        h *= self._BAND_MIX
        h ^= h >> np.uint64(29)
        return [(b, int(h[b])) for b in range(num_bands)]


class HyperLogLog:
    """Mergeable approximate distinct counter (Flajolet et al. 2007,
    with the standard small-range linear-counting correction).

    The register array is the partial-aggregation unit: one sketch per
    batch inside `map_batches`, registers max-merged in a tiny final step
    — the sketch shape the guide prescribes for distinct counts at scale
    (a `unique()` shuffle moves every key; this moves 2^p bytes/batch)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 4:
            self.alpha = 0.673
        elif p == 5:
            self.alpha = 0.697
        elif p == 6:
            self.alpha = 0.709
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add(self, token: str) -> None:
        h = _hash64(token)
        idx = h >> (64 - self.p)
        rest = h << self.p & ((1 << 64) - 1)
        # all-zero remainder ⇒ every one of the 64-p observable bits is a
        # leading zero, so rank is the maximum 64-p+1 (not 1)
        max_rank = 64 - self.p + 1
        rank = max_rank if rest == 0 else min(max_rank, 65 - rest.bit_length())
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, tokens) -> "HyperLogLog":
        """Vectorized bulk add: one md5 per token is the per-item Python
        floor `add()` pays; here the whole batch hashes through pandas'
        SipHash (C, fixed key — cross-worker deterministic like md5) and
        the index/rank math runs as numpy array ops (measured: hashing is
        ~90% of the remaining cost; the rank/register math is ~3%). ~2-3×
        the per-token loop end-to-end. NOTE: a different (equally uniform)
        hash family than `add()` — do not mix the two paths into sketches
        that will be merged; `approx_distinct` uses only this one."""
        import pandas as _pd

        toks = np.asarray(tokens, dtype=object)
        if toks.size == 0:
            return self
        h = _pd.util.hash_array(toks)  # uint64, deterministic default key
        p_ = np.uint64(self.p)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << p_  # uint64 wraparound == masked shift
        max_rank = 64 - self.p + 1
        # floor(log2) of each 32-bit half via frexp (uint32 → float64 is
        # exact, so the exponent IS the bit length; no log2 rounding risk)
        hi = (rest >> np.uint64(32)).astype(np.float64)
        lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
        bl = np.where(hi > 0, np.frexp(hi)[1] + 32, np.frexp(lo)[1])
        rank = np.where(
            rest == 0, max_rank, np.minimum(max_rank, 65 - bl)
        ).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def update(self, tokens) -> "HyperLogLog":
        for t in tokens:
            self.add(t)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def count(self) -> float:
        est = self.alpha * self.m * self.m / np.sum(
            np.power(2.0, -self.registers.astype(np.float64))
        )
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * self.m and zeros:
            est = self.m * math.log(self.m / zeros)  # linear counting
        return float(est)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (the verify step behind
    MinHash candidates)."""
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def simhash(text: str, token_k: int = 4) -> int:
    """64-bit SimHash over character k-grams (Charikar 2002): sum ±1 per bit
    weighted by gram occurrences, sign → bit. Fully vectorized: one C hash
    pass over the gram set, one unpackbits, one column sum (was an md5 +
    unpackbits per gram)."""
    import pandas as _pd

    grams = list(shingles(text, token_k))
    if not grams:
        return 0
    h = _pd.util.hash_array(np.asarray(grams, dtype=object))
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int64)
    acc = bits.sum(axis=0) * 2 - len(grams)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def simhash_batch(
    texts: list[str | None], token_k: int = 4
) -> np.ndarray:
    """SimHashes for a whole batch: uint64 array, value-identical to
    per-doc :func:`simhash` (tested) — one C hash pass over every
    document's grams, per-document bit sums via ``np.add.reduceat``."""
    import pandas as _pd

    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    all_g: list[str] = []
    counts = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        g = shingles(t or "", token_k)
        counts[i] = len(g)
        all_g.extend(g)
    if not all_g:
        return out
    h = _pd.util.hash_array(np.asarray(all_g, dtype=object))
    bits = np.unpackbits(
        h.view(np.uint8).reshape(-1, 8), axis=1
    ).astype(np.int64)
    nz = counts > 0
    seg = counts[nz]
    starts = np.concatenate(([0], np.cumsum(seg)[:-1])).astype(np.int64)
    sums = np.add.reduceat(bits, starts, axis=0)  # (n_nonempty, 64)
    acc = sums * 2 - seg[:, None]
    weights = np.left_shift(
        np.uint64(1), np.arange(64, dtype=np.uint64)
    )
    out[nz] = ((acc > 0).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64
    )
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class CountMinSketch:
    """Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005): d rows of
    w counters, each keyed by an independent md5-derived hash; estimates
    OVERCOUNT only (min over rows), so it is a sound candidate filter for
    heavy hitters — candidates ⊇ true heavies, exact verification prunes
    the rest. Same partial+merge discipline as HyperLogLog: one sketch per
    batch inside map_batches, elementwise-sum merge (counts are linear),
    zero shuffle."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _rows(self, token: str) -> np.ndarray:
        h = hashlib.md5(token.encode("utf-8")).digest()
        return np.array(
            [
                struct.unpack("<I", h[4 * i : 4 * i + 4])[0] % self.width
                for i in range(self.depth)
            ],
            dtype=np.int64,
        )

    def add(self, token: str, count: int = 1) -> None:
        idx = self._rows(token)
        self.counts[np.arange(self.depth), idx] += count

    def estimate(self, token: str) -> int:
        idx = self._rows(token)
        return int(self.counts[np.arange(self.depth), idx].min())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self

    def serialize(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, width: int = 2048, depth: int = 4):
        s = cls(width, depth)
        s.counts = np.frombuffer(data, dtype=np.int64).reshape(depth, width).copy()
        return s


def winnow_fingerprints(
    text: str, k: int = 8, w: int = 4
) -> tuple[int, list[str]]:
    """MOSS winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003): md5
    hex of every char ``k``-gram of the lowercased text, minimum per
    sliding window of ``w`` consecutive gram hashes, distinct selected
    hashes sorted. Guarantees every shared substring of length
    ≥ k + w − 1 contributes at least one shared fingerprint — the
    document-fingerprinting contract plagiarism/near-dup detection
    relies on. Returns (n_grams, fingerprints); texts too short for one
    full window return (n_grams, []). md5 keeps the selection
    SQL-reconstructible (the audit-hash discipline); a production swap
    is a vectorized rolling polynomial hash — selection logic unchanged."""
    t = text.lower()
    if len(t) < k:
        return 0, []
    hs = [
        hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()
        for i in range(len(t) - k + 1)
    ]
    if len(hs) < w:
        return len(hs), []
    # monotonic-deque window minimum: O(n) over the gram stream
    from collections import deque

    sel: set[str] = set()
    dq: deque[int] = deque()
    for i, h in enumerate(hs):
        while dq and hs[dq[-1]] >= h:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - w:
            dq.popleft()
        if i >= w - 1:
            sel.add(hs[dq[0]])
    return len(hs), sorted(sel)


def cdc_chunk_lengths(
    text: str, k: int = 8, divisor: int = 64
) -> list[int]:
    """Content-defined chunking (the LBFS/rsync primitive a crawl-
    snapshot store uses so an edit reshifts ONE chunk boundary, not
    every fixed-width chunk after it): scanning 1-based window
    positions i = 1..len−k+1, cut after character i+k−1 whenever
    md5-low64 of the k-char window ≡ 0 (mod divisor) and the cut is
    not at the very end. Returns the chunk lengths (sum == len(text));
    texts shorter than k are one chunk. Expected chunk length ≈
    divisor chars. md5 keeps boundaries SQL-reconstructible (audit
    discipline); a gear/Rabin rolling hash is the production swap —
    the cut rule is unchanged."""
    from basicocr_ray.core.textstats import md5_low64

    L = len(text)
    if L == 0:
        # one zero-length chunk: matches the SQL twin's ends=[0]/starts=[0]
        # algebra and the 'texts shorter than k are one chunk' contract
        return [0]
    cuts = [
        i + k - 1
        for i in range(1, max(L - k + 1, 0) + 1)
        if i + k - 1 < L
        and md5_low64(text[i - 1 : i - 1 + k]) % divisor == 0
    ]
    bounds = [0] + cuts + [L]
    return [b - a for a, b in zip(bounds, bounds[1:])]
