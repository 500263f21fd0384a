"""General equi-join operator (the relational primitive the query layer
had been hand-rolling per pipeline; engine surface — the reference,
jataware/cartwright, is a column classifier with no join layer).

Two physical plans, mirroring the engine's spatial-join family:

* ``equi_join`` (broadcast): the small side ships once via ``ray.put``;
  each large-side batch runs ONE Arrow Acero hash join
  (``pa.Table.join``) against it — vectorized C++, multi-match and
  left-outer semantics included.
* ``equi_join_shuffle`` (both sides large): both sides are tagged and
  UNIONed through a single-key sort exchange (Ray's range partitioner
  co-locates equal keys in one block), then each block splits by side
  and runs one in-block Acero join — one C++ join call per BLOCK, not
  per key, and nothing ever collects to the driver.

Column collisions on the right side get ``suffix``. ``on`` is one
column name or a list (both sides must carry the same names); the
shuffle plan sorts on EXACTLY the key columns — equal key tuples land
in one block, the engine's exchange-discipline rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _keys(on) -> list:
    return [on] if isinstance(on, str) else list(on)


def _suffix_collisions(right: pa.Table, left_names, on, suffix: str) -> pa.Table:
    keys = set(_keys(on))
    renames = {c: c + suffix for c in right.column_names
               if c not in keys and c in left_names}
    if renames:
        right = right.rename_columns(
            [renames.get(c, c) for c in right.column_names])
    return right


def equi_join(large_ds, small: pa.Table, on, how: str = "inner",
              suffix: str = "_r"):
    """Broadcast hash join: ``small`` is a pyarrow Table. ``how`` is
    ``inner`` or ``left`` (left outer, preserving every large-side
    row)."""
    import ray

    join_type = {"inner": "inner", "left": "left outer"}[how]
    small_ref = ray.put(small)

    def probe(t: pa.Table) -> pa.Table:
        s = _suffix_collisions(ray.get(small_ref), set(t.column_names),
                               on, suffix)
        return t.join(s, keys=_keys(on), join_type=join_type)

    return large_ds.map_batches(probe, batch_format="pyarrow")


_SALT_COL = "__ej_salt"


def _key_hash(t: pa.Table, keys: list) -> np.ndarray:
    """uint64 hash of the key tuple per row (FNV-combine of
    ``pd.util.hash_array`` per column) — identical on both sides, so the
    hot-key probe is a numeric searchsorted. A hash collision merely
    co-salts two keys (extra replication, never wrong rows: the in-block
    join still matches on the real key columns)."""
    import pandas as pd

    h = np.zeros(t.num_rows, dtype=np.uint64)
    for kcol in keys:
        vals = np.asarray(t.column(kcol).to_numpy(zero_copy_only=False))
        # hash_key MUST be exactly 16 bytes: object/string columns raise
        # on any other length (numeric columns ignore it, which is how a
        # 17-byte key survived integer-only tests)
        h = (h * np.uint64(1099511628211)
             ^ pd.util.hash_array(vals, hash_key="cartwright_ejslt")
                 .astype(np.uint64))
    return h


def _per_key_round_robin(pos_masked: np.ndarray,
                         hot_k: np.ndarray) -> np.ndarray:
    """Salt assignment for the hot A-side rows of one batch: each hot
    key's rows (identified by their slot ``pos_masked`` into ``hot_k``)
    get 0,1,...,K-1,0,... IN THEIR OWN sequence, regardless of how the
    keys interleave in the batch. Pure numpy: stable-sort by slot, rank
    within each run, mod that key's K, scatter back."""
    order = np.argsort(pos_masked, kind="stable")
    ps = pos_masked[order]
    starts = np.flatnonzero(np.concatenate([[True], ps[1:] != ps[:-1]]))
    seg_len = np.diff(np.concatenate([starts, [ps.size]]))
    rank = np.arange(ps.size, dtype=np.int64) - np.repeat(
        starts, seg_len)
    out = np.empty(ps.size, dtype=np.int64)
    out[order] = rank % hot_k[ps]
    return out


def _salt_hot_keys(a_ds, b_ds, keys: list, cap: int, max_salts: int):
    """Append ``__ej_salt`` to both sides: keys whose A-side count
    exceeds ``cap`` split their A rows over ``ceil(n/cap)`` salts
    (clamped to ``max_salts``) while their B rows REPLICATE once per
    salt; cold keys carry salt 0. The (key, salt) exchange then bounds
    any one block by ~cap A-rows — the straggler fix (VERDICT r03
    Next #4; the kNN-join salting design).

    The histogram is distributed end to end: per-block (hash, n)
    partials → one narrow groupby → a count filter — only the HOT keys
    (tiny by definition) ever reach the driver. Skew on the B side is
    NOT detected: pass the skewed/fact side as ``a_ds``."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(_key_hash(t, keys), return_counts=True)
        return pa.table({"__kh": pa.array(u.view(np.int64)),
                         "__n": pa.array(c, pa.int64())})

    hist = (a_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__kh").aggregate(Sum("__n", alias_name="__n")))
    hot_df = hist.map_batches(
        lambda t: t.filter(pc.greater(t["__n"], cap)),
        batch_format="pyarrow").to_pandas()
    hot_h = hot_df["__kh"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.argsort(hot_h)
    hot_h = hot_h[order]
    hot_k = np.minimum(
        np.ceil(hot_df["__n"].to_numpy()[order] / cap), max_salts
    ).astype(np.int64)

    def _probe(h: np.ndarray):
        if not hot_h.size:
            return np.zeros(h.shape[0], bool), np.empty(0, np.int64)
        pos = np.minimum(np.searchsorted(hot_h, h), hot_h.size - 1)
        mask = hot_h[pos] == h
        return mask, pos

    def a_assign(t: pa.Table) -> pa.Table:
        salts = np.zeros(t.num_rows, dtype=np.int64)
        mask, pos = _probe(_key_hash(t, keys))
        if mask.any():
            # round-robin PER KEY (ADVICE r04): a single batch counter
            # shared across co-resident hot keys gives each key a
            # strided subsequence — when its K divides the interleave
            # stride the key hits only a subset of its salts, weakening
            # the straggler bound. Rebase the counter per key segment.
            salts[mask] = _per_key_round_robin(pos[mask], hot_k)
        return t.append_column(_SALT_COL, pa.array(salts, pa.int64()))

    def b_assign(t: pa.Table) -> pa.Table:
        mask, pos = _probe(_key_hash(t, keys))
        if not mask.any():
            # no hot keys in this batch: skip the identity take() copy
            return t.append_column(
                _SALT_COL, pa.array(np.zeros(t.num_rows, np.int64)))
        reps = np.ones(t.num_rows, dtype=np.int64)
        reps[mask] = hot_k[pos[mask]]
        idx = np.repeat(np.arange(t.num_rows), reps)
        starts = np.cumsum(reps) - reps
        salts = np.arange(idx.shape[0]) - starts[idx]
        out = t.take(pa.array(idx))
        return out.append_column(_SALT_COL, pa.array(salts, pa.int64()))

    return (a_ds.map_batches(a_assign, batch_format="pyarrow"),
            b_ds.map_batches(b_assign, batch_format="pyarrow"))


def equi_join_shuffle(a_ds, b_ds, on, how: str = "inner",
                      suffix: str = "_r", salt_cap: int | None = None,
                      max_salts: int = 64):
    """Shuffle plan for two large Datasets — see module docstring.
    ``how``: ``inner`` or ``left`` (left outer is block-local too: the
    exchange co-locates ALL rows of a key, so an unmatched left row is
    provably unmatched globally).

    Hot keys: by default a single key's rows land in ONE block, so a
    mega-hot key is a straggler (documented boundary). Pass ``salt_cap``
    to enable salting: keys whose A-side count exceeds the cap split
    over up to ``max_salts`` subkeys (A rows split, B rows replicate —
    :func:`_salt_hot_keys`), the exchange runs on (key, salt), and the
    in-block join matches on (key, salt) so each A row meets exactly one
    B replica set. Costs one extra narrow histogram shuffle; results are
    row-identical to the unsalted plan (fuzz-tested against DuckDB on a
    zipf-skewed key)."""
    if salt_cap is not None:
        keys = _keys(on)
        a_ds, b_ds = _salt_hot_keys(a_ds, b_ds, keys, salt_cap, max_salts)
        out = _equi_join_shuffle_impl(a_ds, b_ds, keys + [_SALT_COL],
                                      how, suffix)
        return out.map_batches(lambda t: t.drop_columns([_SALT_COL]),
                               batch_format="pyarrow")
    return _equi_join_shuffle_impl(a_ds, b_ds, _keys(on), how, suffix)


def _equi_join_shuffle_impl(a_ds, b_ds, keys: list, how: str, suffix: str):
    import pyarrow.compute as pc

    from ..stages.partition import arrow_schema_of

    join_type = {"inner": "inner", "left": "left outer"}[how]
    a_schema = arrow_schema_of(a_ds)
    b_schema = arrow_schema_of(b_ds)
    for kcol in keys:
        if kcol not in a_schema.names or kcol not in b_schema.names:
            raise KeyError(f"join key {kcol!r} missing on one side")
    kset = set(keys)
    a_names = set(a_schema.names)
    b_out = [(c, c + suffix if (c not in kset and c in a_names) else c)
             for c in b_schema.names if c not in kset]

    # one unified exchange schema: keys + side + both sides' payloads
    # (other side's columns null)
    uni = pa.schema(
        [(kcol, a_schema.field(kcol).type) for kcol in keys]
        + [("__ej_side", pa.int8())]
        + [(c, a_schema.field(c).type) for c in a_schema.names
           if c not in kset]
        + [(out, b_schema.field(src).type) for src, out in b_out])

    def tag(side: int, schema, out_names):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for fld in uni:
                if fld.name in kset:
                    cols.append(t.column(fld.name).cast(fld.type))
                elif fld.name == "__ej_side":
                    cols.append(pa.array(np.full(n, side, np.int8)))
                elif fld.name in out_names:
                    cols.append(t.column(out_names[fld.name])
                                .cast(fld.type))
                else:
                    cols.append(pa.nulls(n, fld.type))
            return pa.Table.from_arrays(cols, schema=uni)
        return fn

    a_map = {c: c for c in a_schema.names if c not in kset}
    b_map = {out: src for src, out in b_out}
    both = (a_ds.map_batches(tag(0, a_schema, a_map),
                             batch_format="pyarrow")
            .union(b_ds.map_batches(tag(1, b_schema, b_map),
                                    batch_format="pyarrow")))

    out_schema = pa.schema(
        [(kcol, a_schema.field(kcol).type) for kcol in keys]
        + [(c, a_schema.field(c).type) for c in a_schema.names
           if c not in kset]
        + [(out, b_schema.field(src).type) for src, out in b_out])

    def block_join(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        side = t.column("__ej_side")
        a_part = t.filter(pc.equal(side, 0)) \
            .select(keys + [c for c in a_schema.names if c not in kset])
        b_part = t.filter(pc.equal(side, 1)) \
            .select(keys + [out for _, out in b_out])
        if a_part.num_rows == 0 or \
                (b_part.num_rows == 0 and join_type == "inner"):
            return out_schema.empty_table()
        return a_part.join(b_part, keys=keys, join_type=join_type) \
            .select(out_schema.names).cast(out_schema)

    return (both.sort(keys)
            .map_batches(block_join, batch_format="pyarrow",
                         batch_size=None))
