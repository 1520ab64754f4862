"""Deterministic, SQL-replicable hashing for the training-data operators.

Every hash here must be computable bit-identically by the DuckDB oracle:
``md5int60(s)`` == DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT`` (60
bits), and the minhash permutations use 30-bit moduli so ``a*x + b``
stays inside BIGINT on both sides.
"""

from __future__ import annotations

import hashlib

MOD = 1_000_000_007  # 30-bit prime: products fit in int64 on both sides
N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3

STOPWORDS = ("the", "a")

# fixed permutation parameters, derived deterministically; inlined into the
# oracle SQL as literals by pipelines/training.py
PERM_A = [((i + 1) * 2654435761) % MOD for i in range(N_PERM)]
PERM_B = [((i + 1) * 40503 + 12345) % MOD for i in range(N_PERM)]


def md5int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def md5int60_batch(strs) -> "np.ndarray":  # noqa: F821 — numpy imported lazily
    """Vectorized-ish md5int60 over an iterable of strings: one tight
    C-backed loop, int64 out.  Callers should pass DISTINCT strings (from
    a dictionary-encode) — that is where the batch win comes from: the
    md5 bill drops from per-token-instance to per-distinct-token."""
    import numpy as np

    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(s.encode()).hexdigest()[:15], 16) for s in strs),
        dtype=np.int64,
        count=len(strs),
    )


# shingle-hash composition constants (r4): a 3-token shingle hashes as
# (h1*SHINGLE_C1 + h2*SHINGLE_C2 + h3) % MOD with h_i = md5int60(tok_i)
# % MOD — so the md5 bill is per DISTINCT TOKEN (vectorizable via
# dictionary-encode), not per shingle instance, while staying exactly
# SQL-replicable (the oracle composes the same arithmetic over
# list_zip'd token-hash lists).  Fixed arbitrary constants < MOD; the
# collision rate of the composition is ~1/MOD per distinct pair, the
# same order as the previous md5(shingle-string) % MOD mapping, and
# both engine and oracle dedup shingles on the COMPOSED value so the
# two sides can never disagree.
SHINGLE_C1 = 774_856_843
SHINGLE_C2 = 386_217_529

# 64-bit variant for EXACT-dedup shingle IDs (ngram_jaccard explode, r5):
# x = h1*U1 + h2*U2 + h3 (mod 2^64, h_i = full 60-bit md5int60(tok_i)) —
# same dictionary-encoded vectorization as minhash, but the full-width
# wrap keeps the per-pair collision rate at ~2^-64 (vs ~2^-60 for the
# old md5(shingle-string) ids, ~2^-30 for the MOD composition), because
# jaccard's string-level oracle cannot absorb ID collisions the way the
# composition-replicating minhash oracle can.  Odd 64-bit mix constants
# (golden-ratio / xxhash avalanche primes).
SHINGLE_U1 = 0x9E3779B97F4A7C15
SHINGLE_U2 = 0xC2B2AE3D27D4EB4F


def tokens(text: str) -> list[str]:
    """Whitespace tokens, split on single space — matches DuckDB
    string_split(text, ' ') exactly (no regex, no collapsing)."""
    return text.split(" ")


def shingles(text: str, k: int = SHINGLE_K) -> list[str]:
    toks = tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def shingle_hashes(text: str) -> list[int]:
    """Composed 3-token shingle hashes (see SHINGLE_C1/C2 note).  Docs
    with fewer than SHINGLE_K tokens fall back to one whole-text hash —
    for <3 tokens ``' '.join(tokens)`` IS the text (split is lossless),
    so md5int60(text) equals the old md5(single-shingle-string) exactly.
    Scalar reference twin of the vectorized kernel in
    stages/dedup.minhash_signatures."""
    toks = tokens(text)
    if len(toks) < SHINGLE_K:
        return [md5int60(text) % MOD]
    th = [md5int60(t) % MOD for t in toks]
    return [
        (th[i] * SHINGLE_C1 + th[i + 1] * SHINGLE_C2 + th[i + 2]) % MOD
        for i in range(len(th) - SHINGLE_K + 1)
    ]


def minhash_signature(text: str) -> list[int]:
    """16 minhash values over composed 3-token shingle hashes:
    min((a*x+b) % p) over distinct x = shingle_hashes(text)."""
    xs = set(shingle_hashes(text))
    if not xs:
        return [MOD] * N_PERM
    return [min((a * x + b) % MOD for x in xs) for a, b in zip(PERM_A, PERM_B)]


def band_keys(sig: list[int]) -> list[str]:
    """One join key per band: 'b:h1:h2:h3:h4'."""
    out = []
    for b in range(N_BANDS):
        chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        out.append(str(b) + ":" + ":".join(str(h) for h in chunk))
    return out


# 60-bit simhash (the full md5int60 width), banded 4 x 15 bits for the
# near-dup candidate join: catches every hamming-distance <= 3 pair with
# certainty, and a 15-bit band value keeps buckets tiny at scale (the
# 16-bit/2-band scheme had only 512 distinct band values globally — every
# bucket grew linearly with the corpus and the in-bucket self-merge was
# quadratic; VERDICT r1).
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15


def simhash16(text: str) -> int:
    """Legacy 16-bit simhash (kept for tests/back-compat)."""
    votes = [0] * 16
    for t in tokens(text):
        h = md5int60(t) % (1 << 16)
        for b in range(16):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(16):
        if votes[b] > 0:
            out |= 1 << b
    return out


def simhash60(text: str) -> int:
    """60-bit simhash over whitespace tokens (token hash = md5int60);
    vote per bit, bit set iff vote > 0.  Scalar reference twin of the
    vectorized stages/text.simhash60_batch kernel."""
    votes = [0] * SIMHASH_BITS
    for t in tokens(text):
        h = md5int60(t)
        for b in range(SIMHASH_BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(SIMHASH_BITS):
        if votes[b] > 0:
            out |= 1 << b
    return out


def simhash_band_keys(sim: int) -> list[str]:
    """'b:value' per 15-bit band of a 60-bit simhash."""
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return [
        f"{b}:{(sim >> (SIMHASH_BAND_BITS * b)) & mask}" for b in range(SIMHASH_BANDS)
    ]


def fingerprint(text: str) -> int:
    """Positional fingerprint: sum_i (md5int60(tok_i) % p) * i, i from 1
    (document fingerprinting / rolling-hash family, SQL-replicable)."""
    return sum((md5int60(t) % MOD) * i for i, t in enumerate(tokens(text), start=1))
