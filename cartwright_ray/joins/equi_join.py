"""General equi-join operator (the relational primitive the query layer
had been hand-rolling per pipeline).

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

Column collisions on the right side get ``suffix``. Join keys must be
a single column present on both sides (compose a struct/concat key
upstream for multi-column joins — keeps the exchange narrow).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _suffix_collisions(right: pa.Table, left_names, on: str,
                       suffix: str) -> pa.Table:
    renames = {c: c + suffix for c in right.column_names
               if c != on and c in left_names}
    if renames:
        right = right.rename_columns(
            [renames.get(c, c) for c in right.column_names])
    return right


def equi_join(large_ds, small: pa.Table, on: str, how: str = "inner",
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
        return t.join(s, keys=on, join_type=join_type)

    return large_ds.map_batches(probe, batch_format="pyarrow")


def equi_join_shuffle(a_ds, b_ds, on: str, how: str = "inner",
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
    a_schema = arrow_schema_of(a_ds)
    b_schema = arrow_schema_of(b_ds)
    if on not in a_schema.names or on not in b_schema.names:
        raise KeyError(f"join key {on!r} missing on one side")
    a_names = set(a_schema.names)
    b_out = [(c, c + suffix if (c != on and c in a_names) else c)
             for c in b_schema.names if c != on]

    # one unified exchange schema: key + side + both sides' payloads
    # (other side's columns null)
    uni = pa.schema(
        [(on, a_schema.field(on).type), ("__ej_side", pa.int8())]
        + [(c, a_schema.field(c).type) for c in a_schema.names if c != on]
        + [(out, b_schema.field(src).type) for src, out in b_out])

    def tag(side: int, schema, out_names):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for fld in uni:
                if fld.name == on:
                    cols.append(t.column(on).cast(fld.type))
                elif fld.name == "__ej_side":
                    cols.append(pa.array(np.full(n, side, np.int8)))
                elif fld.name in out_names:
                    cols.append(t.column(out_names[fld.name])
                                .cast(fld.type))
                else:
                    cols.append(pa.nulls(n, fld.type))
            return pa.Table.from_arrays(cols, schema=uni)
        return fn

    a_map = {c: c for c in a_schema.names if c != on}
    b_map = {out: src for src, out in b_out}
    both = (a_ds.map_batches(tag(0, a_schema, a_map),
                             batch_format="pyarrow")
            .union(b_ds.map_batches(tag(1, b_schema, b_map),
                                    batch_format="pyarrow")))

    out_schema = pa.schema(
        [(on, a_schema.field(on).type)]
        + [(c, a_schema.field(c).type) for c in a_schema.names if c != on]
        + [(out, b_schema.field(src).type) for src, out in b_out])

    def block_join(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        side = t.column("__ej_side")
        a_part = t.filter(pc.equal(side, 0)) \
            .select([on] + [c for c in a_schema.names if c != on])
        b_part = t.filter(pc.equal(side, 1)) \
            .select([on] + [out for _, out in b_out])
        if a_part.num_rows == 0 or \
                (b_part.num_rows == 0 and join_type == "inner"):
            return out_schema.empty_table()
        return a_part.join(b_part, keys=on, join_type=join_type) \
            .select(out_schema.names).cast(out_schema)

    return (both.sort(on)
            .map_batches(block_join, batch_format="pyarrow",
                         batch_size=None))
