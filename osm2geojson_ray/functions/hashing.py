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


def tokens(text: str) -> list[str]:
    """Whitespace tokens, split on single space — matches DuckDB
    string_split(text, ' ') exactly (no regex, no collapsing)."""
    return text.split(" ")


def shingles(text: str, k: int = SHINGLE_K) -> list[str]:
    toks = tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def minhash_signature(text: str) -> list[int]:
    """16 minhash values over 3-token shingles: min((a*x'+b) % p) with
    x' = md5int60(shingle) % p."""
    xs = [md5int60(s) % MOD for s in set(shingles(text))]
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
