"""Vectorized feature projections — the hot-path implementation of
P7/P8 + the §2.8 tag rules (OsmPostProcessor.java:119-208,244-354).

Same semantics as stages/postprocess.py (the per-row reference kernels,
parity-tested against this module); here the tag table is exploded once
and every rule is a numpy mask over the flattened (row, key, value)
arrays — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schema import FEATURES

_WHITELIST = ["leisure", "amenity", "natural", "historic", "cuisine",
              "tourism", "shop", "building", "admin-level"]
_RULE_KEYS = ["name", "highway", "website", "building", "amenity", "railway",
              "station", "public_transport", "light_rail", "bus", *_WHITELIST]


def _explode_tags(tags_col) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    col = tags_col.combine_chunks() if isinstance(tags_col, pa.ChunkedArray) else tags_col
    lens = np.asarray(col.value_lengths().fill_null(0), dtype=np.int64)
    n = len(lens)
    row_idx = np.repeat(np.arange(n), lens)
    flat = col.flatten()
    keys = np.asarray(flat.field("key").to_pandas(), dtype=object)
    vals = np.asarray(flat.field("value").to_pandas(), dtype=object)
    return row_idx, keys, vals, n


def _last_value_per_row(n: int, row_idx: np.ndarray, keys: np.ndarray,
                        vals: np.ndarray, key: str) -> np.ndarray:
    out = np.full(n, None, dtype=object)
    m = keys == key
    out[row_idx[m]] = vals[m]  # ascending order → last occurrence wins
    return out


def _lower(arr: np.ndarray) -> np.ndarray:
    out = np.full(len(arr), None, dtype=object)
    has = arr != None  # noqa: E711
    out[has] = [s.lower() for s in arr[has]]
    return out


def compute_tag_outputs(tags_col):
    """Vectorized §2.8 rule evaluation for a tags column.

    Returns dict with: name (object array | None), categories
    (row->sorted unique list, via cat_rows/cat_vals arrays), address /
    names / links exploded arrays — all keyed by row index."""
    row_idx, keys, vals, n = _explode_tags(tags_col)
    kv = {k: _last_value_per_row(n, row_idx, keys, vals, k) for k in _RULE_KEYS}
    low = {k: _lower(kv[k]) for k in ["building", "amenity", "railway", "station",
                                      "public_transport", "light_rail", "bus"]}

    cat_rows: list[np.ndarray] = []
    cat_vals: list[np.ndarray] = []

    def add_cats(rows: np.ndarray, values) -> None:
        if len(rows) == 0:
            return
        cat_rows.append(rows)
        if isinstance(values, str):
            cat_vals.append(np.full(len(rows), values, dtype=object))
        else:
            cat_vals.append(np.asarray(values, dtype=object))

    hw = kv["highway"] != None  # noqa: E711
    hw_rows = np.nonzero(hw)[0]
    add_cats(hw_rows, "street")
    add_cats(hw_rows, ["highway:" + v for v in kv["highway"][hw_rows]])
    for k in _WHITELIST:
        present = np.nonzero(kv[k] != None)[0]  # noqa: E711
        add_cats(present, [f"{k}:" + v for v in kv[k][present]])

    b_yes = low["building"] == "yes"
    pub = b_yes & (low["amenity"] == "public_building")
    add_cats(np.nonzero(pub)[0], "public-building")
    add_cats(np.nonzero(b_yes & ~pub)[0], "building")
    add_cats(np.nonzero(low["railway"] == "tram_stop")[0], "tram-stop")
    add_cats(np.nonzero(low["railway"] == "station")[0], "train-station")
    add_cats(np.nonzero(low["railway"] == "halt")[0], "train-station")
    add_cats(np.nonzero(low["station"] == "light_rail")[0], "light-rail-station")
    sp = low["public_transport"] == "stop_position"
    lr = sp & (low["light_rail"] == "yes")
    bus = sp & ~lr & (low["bus"] == "yes")
    halt = sp & ~lr & ~bus & (low["railway"] == "halt")
    add_cats(np.nonzero(lr)[0], "light-rail-station")
    add_cats(np.nonzero(bus)[0], "bus-stop")
    add_cats(np.nonzero(halt)[0], "train-station")

    if cat_rows:
        cr = np.concatenate(cat_rows)
        cv = np.concatenate(cat_vals)
    else:
        cr = np.empty(0, np.int64)
        cv = np.empty(0, object)

    is_addr = np.asarray([k.startswith("addr:") for k in keys], bool) if len(keys) else np.zeros(0, bool)
    is_name = np.asarray([k.startswith("name:") for k in keys], bool) if len(keys) else np.zeros(0, bool)

    return {
        "n": n,
        "name": kv["name"],
        "website": kv["website"],
        "cat_rows": cr,
        "cat_vals": cv,
        "addr": (row_idx[is_addr], keys[is_addr], vals[is_addr]),
        "names": (row_idx[is_name], keys[is_name], vals[is_name]),
    }


def _group_sorted_unique(rows: np.ndarray, vals: np.ndarray, n: int):
    """(row, value) pairs → per-row sorted unique value lists.
    Returns (offsets int32[n+1], flat values object array)."""
    if len(rows) == 0:
        return np.zeros(n + 1, np.int32), np.empty(0, object)
    order = np.lexsort((vals, rows))
    r = rows[order]
    v = vals[order]
    keep = np.ones(len(r), bool)
    keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    r = r[keep]
    v = v[keep]
    counts = np.bincount(r, minlength=n)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return offsets, v


def _subset_lists(offsets: np.ndarray, flat: np.ndarray, rows: np.ndarray):
    """Take per-row lists for a row subset (returns new offsets + flat)."""
    lens = (offsets[1:] - offsets[:-1])[rows]
    new_off = np.zeros(len(rows) + 1, np.int32)
    np.cumsum(lens, out=new_off[1:])
    total = int(new_off[-1])
    if total == 0 or len(rows) == 0:
        return new_off, flat[:0]
    starts = offsets[rows].astype(np.int64)
    # vectorized multi-range gather: arange(total) shifted per segment
    shift = np.repeat(starts - new_off[:-1].astype(np.int64), lens)
    idx = np.arange(total, dtype=np.int64) + shift
    return new_off, flat[idx]


def _grouped_pairs(rows: np.ndarray, a: np.ndarray, b: np.ndarray, n: int):
    """(row, a, b) triples → per-row list<struct{key,value}> in original
    order (stable)."""
    counts = np.bincount(rows, minlength=n) if len(rows) else np.zeros(n, np.int64)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(rows, kind="stable") if len(rows) else np.empty(0, np.int64)
    return offsets, a[order] if len(a) else a, b[order] if len(b) else b


def build_features_table(
    ids: np.ndarray,
    prefix: str,
    osm_type: str,
    tags_col,
    xs_off: np.ndarray,
    xs_flat: np.ndarray,
    ys_flat: np.ndarray,
    geom_types: np.ndarray | None,
) -> pa.Table:
    """Shared vectorized feature construction.  ``xs_off`` are per-row
    coordinate offsets (int32[n+1]); geometry types Point/LineString/
    Polygon computed by the caller (None → all Point)."""
    info = compute_tag_outputs(tags_col)
    n = info["n"]
    # gates: name present (P7/P8) AND ≥1 category (§2.8 drop)
    has_cat = np.zeros(n, bool)
    has_cat[info["cat_rows"]] = True
    name = info["name"]
    keep_mask = (name != None) & has_cat  # noqa: E711
    keep = np.nonzero(keep_mask)[0]
    if len(keep) == 0:
        return pa.Table.from_pydict({f.name: [] for f in FEATURES}, schema=FEATURES)

    cat_off, cat_flat = _group_sorted_unique(info["cat_rows"], info["cat_vals"], n)
    k_cat_off, k_cat_flat = _subset_lists(cat_off, cat_flat, keep)

    a_rows, a_keys, a_vals = info["addr"]
    addr_off, addr_k, addr_v = _grouped_pairs(a_rows, a_keys, a_vals, n)
    k_addr_off, kept_idx = _subset_lists(
        addr_off, np.arange(len(addr_k)), keep
    )
    addr_struct = pa.StructArray.from_arrays(
        [pa.array([k[5:] for k in addr_k[kept_idx]], pa.string()),
         pa.array(list(addr_v[kept_idx]), pa.string())],
        names=["key", "value"],
    )

    nm_rows, nm_keys, nm_vals = info["names"]
    # names: {lang: [values]} — group (row, lang) preserving value order
    if len(nm_rows):
        order = np.lexsort((np.arange(len(nm_rows)), nm_keys, nm_rows))
        nr, nk, nv = nm_rows[order], nm_keys[order], nm_vals[order]
        new_grp = np.ones(len(nr), bool)
        new_grp[1:] = (nr[1:] != nr[:-1]) | (nk[1:] != nk[:-1])
        grp_id = np.cumsum(new_grp) - 1
        grp_row = nr[new_grp]
        grp_lang = nk[new_grp]
        val_counts = np.bincount(grp_id)
        val_off = np.zeros(len(grp_row) + 1, np.int32)
        np.cumsum(val_counts, out=val_off[1:])
        values_list = pa.ListArray.from_arrays(pa.array(val_off), pa.array(list(nv), pa.string()))
        lang_struct = pa.StructArray.from_arrays(
            [pa.array([l[5:] for l in grp_lang], pa.string()), values_list],
            names=["lang", "values"],
        )
        ngrp_counts = np.bincount(grp_row, minlength=n)
        names_off = np.zeros(n + 1, np.int32)
        np.cumsum(ngrp_counts, out=names_off[1:])
        k_names_off, names_idx = _subset_lists(names_off, np.arange(len(grp_row)), keep)
        lang_struct_k = lang_struct.take(pa.array(names_idx))
    else:
        k_names_off = np.zeros(len(keep) + 1, np.int32)
        lang_struct_k = pa.array([], pa.struct([("lang", pa.string()), ("values", pa.list_(pa.string()))]))

    web = info["website"][keep]
    link_lens = (web != None).astype(np.int32)  # noqa: E711
    link_off = np.zeros(len(keep) + 1, np.int32)
    np.cumsum(link_lens, out=link_off[1:])
    link_flat = pa.array([w for w in web if w is not None], pa.string())

    k_xs_off, k_xs = _subset_lists(xs_off, xs_flat, keep)
    _, k_ys = _subset_lists(xs_off, ys_flat, keep)
    gt = (
        np.full(len(keep), "Point", dtype=object)
        if geom_types is None
        else geom_types[keep]
    )
    single_zero = np.zeros(len(keep), np.int32)
    ro = pa.ListArray.from_arrays(
        pa.array(np.arange(len(keep) + 1, dtype=np.int32)), pa.array(single_zero)
    )
    po = pa.ListArray.from_arrays(
        pa.array(np.arange(len(keep) + 1, dtype=np.int32)), pa.array(single_zero)
    )
    fid = pa.array([f"{prefix}{i}" for i in ids[keep]], pa.string())
    return pa.Table.from_arrays(
        [
            fid,
            pa.array(np.full(len(keep), osm_type, dtype=object), pa.string()),
            pa.array(ids[keep], pa.int64()),
            pa.array(list(name[keep]), pa.string()),
            pa.array(list(gt), pa.string()),
            pa.ListArray.from_arrays(pa.array(k_xs_off), pa.array(k_xs, pa.float64())),
            pa.ListArray.from_arrays(pa.array(k_xs_off), pa.array(k_ys, pa.float64())),
            ro,
            po,
            pa.ListArray.from_arrays(pa.array(k_cat_off), pa.array(list(k_cat_flat), pa.string())),
            pa.ListArray.from_arrays(pa.array(k_addr_off), addr_struct),
            pa.ListArray.from_arrays(pa.array(k_names_off), lang_struct_k),
            pa.ListArray.from_arrays(pa.array(link_off), link_flat),
        ],
        schema=FEATURES,
    )


def poi_features_batch_vec(batch: pa.Table) -> pa.Table:
    batch = batch.filter(
        pc.greater(pc.coalesce(pc.list_value_length(
            batch.column("tags").combine_chunks()), pa.scalar(0, pa.int32())), 0)
    )
    n = batch.num_rows
    ids = np.asarray(batch.column("node_id")) if n else np.empty(0, np.int64)
    xs_off = np.arange(n + 1, dtype=np.int32)
    xs_flat = np.asarray(batch.column("lon")) if n else np.empty(0)
    ys_flat = np.asarray(batch.column("lat")) if n else np.empty(0)
    return build_features_table(
        ids, "osmnode/", "poi", batch.column("tags"), xs_off, xs_flat, ys_flat, None
    )


def way_features_batch_vec(batch: pa.Table) -> pa.Table:
    batch = batch.filter(
        pc.greater(pc.coalesce(pc.list_value_length(
            batch.column("tags").combine_chunks()), pa.scalar(0, pa.int32())), 0)
    )
    n = batch.num_rows
    ids = np.asarray(batch.column("way_id")) if n else np.empty(0, np.int64)
    nodes = batch.column("nodes").combine_chunks() if n else None
    if n:
        lens = np.asarray(nodes.value_lengths().fill_null(0), dtype=np.int64)
        xs_off = np.zeros(n + 1, np.int32)
        np.cumsum(lens, out=xs_off[1:])
        flat = nodes.flatten()
        xs_flat = np.asarray(flat.field("lon"))
        ys_flat = np.asarray(flat.field("lat"))
        first = xs_off[:-1]
        last = np.maximum(xs_off[1:] - 1, 0)
        closed = (xs_flat[first] == xs_flat[last]) & (ys_flat[first] == ys_flat[last])
        geom_types = np.where(closed, "Polygon", "LineString").astype(object)
    else:
        xs_off = np.zeros(1, np.int32)
        xs_flat = ys_flat = np.empty(0)
        geom_types = np.empty(0, object)
    return build_features_table(
        ids, "osmway/", "way", batch.column("tags"), xs_off, xs_flat, ys_flat, geom_types
    )


def poi_features(nodes: ray.data.Dataset) -> ray.data.Dataset:
    return nodes.map_batches(poi_features_batch_vec, batch_format="pyarrow", zero_copy_batch=True)


def way_features(complete_ways: ray.data.Dataset) -> ray.data.Dataset:
    return complete_ways.map_batches(way_features_batch_vec, batch_format="pyarrow", zero_copy_batch=True)
