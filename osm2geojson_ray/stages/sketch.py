"""Distributed cardinality sketch: HyperLogLog registers per group.

The sketch state (per-group max-rho registers) is a bounded commutative
monoid, so it composes exactly like the engine's other combiner
aggregates: per-batch register maxes inside ``map_batches`` (≤ groups ×
2^b tiny rows leave any block), then ONE hash exchange merges by max —
no distinct-shuffle of the raw keys, which is the entire point of a
cardinality sketch at 10^12 rows.

Registers — not the float estimate — are the OUTPUT, which keeps the
operator fully oracle-checkable: every register is an integer
``max(rho)`` over md5-derived values, replicated verbatim in SQL
(``md5int60`` == DuckDB ``('0x'||substr(md5(s),1,15))::BIGINT``, rho =
trailing-zero count of the hash suffix).  ``hll_estimate`` turns merged
registers into the usual bias-corrected estimate driver-side (a
5-group × 64-register table — trivially bounded).

rho convention: hash = 60-bit md5; bucket = h % 2^b; suffix w = h >>
b_bits (54 bits at b=64 buckets); rho = trailing zeros of w, + 1 (w ==
0 ⇒ rho = 55).  Trailing (not leading) zeros keep the SQL twin pure
integer math: ``w & -w`` isolates the lowest set bit and ``log2`` of an
exact power of two is exact in double.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.grouping import partition_map
from ..functions.hashing import md5int60

N_BUCKETS = 64  # b = 6 bucket bits; suffix = 54 bits
_MAX_RHO = 55  # all-zero 54-bit suffix


def _rho(w: np.ndarray) -> np.ndarray:
    """Trailing-zero count + 1 of each (nonneg) suffix; 0 → _MAX_RHO."""
    out = np.full(len(w), _MAX_RHO, np.int64)
    nz = w != 0
    # w & -w is an exact power of two ≤ 2^53: log2 is exact in double
    out[nz] = np.log2((w[nz] & -w[nz]).astype(np.float64)).astype(np.int64) + 1
    return out


def hll_registers(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    num_parts: int = 8,
) -> ray.data.Dataset:
    """Per ``group_col``: the 64 HLL registers of distinct ``key_col``
    values → (group, bucket, rho_max), only buckets that received at
    least one key.  Key hashing is ``md5int60(str(key))`` — one md5 per
    DISTINCT key per batch (duplicates are deduped before hashing;
    sketch maxes make cross-batch duplicates free)."""

    def local(t: pa.Table) -> pa.Table:
        kv = t.column(key_col).to_numpy(zero_copy_only=False)
        # hash each distinct key once per batch
        uk, inv = np.unique(kv, return_inverse=True)
        hv = np.array([md5int60(str(k)) for k in uk], np.int64)[inv]
        bucket = hv % N_BUCKETS
        rho = _rho(hv // N_BUCKETS)
        tb = pa.table(
            {
                group_col: t.column(group_col).combine_chunks(),
                "bucket": pa.array(bucket),
                "rho": pa.array(rho),
            }
        )
        m = tb.group_by([group_col, "bucket"]).aggregate([("rho", "max")])
        return pa.table(
            {
                group_col: m.column(group_col),
                "bucket": m.column("bucket"),
                "rho_max": m.column("rho_max").combine_chunks().cast(pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        m = t.group_by([group_col, "bucket"]).aggregate([("rho_max", "max")])
        return pa.table(
            {
                group_col: m.column(group_col),
                "bucket": m.column("bucket"),
                "rho_max": m.column("rho_max_max").combine_chunks().cast(pa.int64()),
            }
        )

    pre = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, [group_col], num_parts, merge)


def hll_estimate(registers: dict[int, int], m: int = N_BUCKETS) -> float:
    """Bias-corrected HLL estimate from one group's {bucket: rho_max}
    (missing buckets count as empty).  Driver-side helper over the
    bounded register table; small-range correction = linear counting."""
    alpha = 0.709  # alpha_64
    reg = np.zeros(m, np.float64)
    for b, r in registers.items():
        reg[b] = r
    est = alpha * m * m / np.sum(np.exp2(-reg))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)
