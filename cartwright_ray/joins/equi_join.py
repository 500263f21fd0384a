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


def equi_join_shuffle(a_ds, b_ds, on, how: str = "inner",
                      suffix: str = "_r"):
    """Shuffle plan for two large Datasets — see module docstring.
    ``how``: ``inner`` or ``left`` (left outer is block-local too: the
    exchange co-locates ALL rows of a key, so an unmatched left row is
    provably unmatched globally). Hot keys: a single key's rows land in
    one block; salt the key upstream (``pip_join.salted_keys`` pattern)
    if a histogram shows a key whose matched cartesian product exceeds
    a block."""
    import pyarrow.compute as pc

    from ..stages.partition import arrow_schema_of

    join_type = {"inner": "inner", "left": "left outer"}[how]
    keys = _keys(on)
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
