"""F4 sort/dedup fixtures (SortingWriterTest.java semantics, FIXTURES.md):
no row loss through the exchange, grouped counts preserved, empty input →
empty output — against the engine's hash exchange instead of the
reference's external merge sort."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from osm2geojson_ray.functions.grouping import (
    group_to_lists,
    partition_map,
)


def test_grouped_counts_preserved_1001():
    # 1001 entries with keys i%5 → 5 groups, total length preserved
    t = pa.table({"k": np.arange(1001) % 5, "v": ["-"] * 1001})
    out = group_to_lists(rd.from_arrow(t), "k", ["v"], num_parts=4).take_all()
    assert len(out) == 5
    assert sum(len(r["v"]) for r in out) == 1001


def test_no_row_loss_20k_random_collisions():
    rng = np.random.RandomState(42)
    keys = rng.randint(0, 26 * 26, size=20_000)  # forced collisions
    vals = rng.randint(0, 1 << 30, size=20_000)
    t = pa.table({"k": keys, "v": vals})

    def ident(part: pa.Table) -> pa.Table:
        return part

    out = partition_map(rd.from_arrow(t).repartition(16), ["k"], 8, ident)
    rows = out.take_all()
    assert len(rows) == 20_000
    got = sorted((r["k"], r["v"]) for r in rows)
    want = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == want


def test_empty_input_empty_output():
    t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    out = group_to_lists(rd.from_arrow(t), "k", ["v"], num_parts=4).take_all()
    assert out == []
