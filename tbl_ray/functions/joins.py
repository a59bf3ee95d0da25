"""Broadcast hash join — the only join shape that belongs in a 100 TB
streaming pipeline without an explicit co-partitioning step.

The reference has no joins (SURVEY.md §2.4); training pipelines still need
dimension enrichment (url -> domain metadata, lang -> config, shard ->
provenance). The small side is bounded by definition: it collects
driver-side once, ships via ``ray.put``, and every batch joins against it
with Arrow's hash join — the big side streams, nothing shuffles.

For big-big joins, co-partition both sides with
``tbl_ray.stages.partition.partition_by_hash`` and join partition-wise;
that path is deliberately explicit (an implicit all-to-all at this scale
should never hide inside an operator).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from tbl_ray.functions.dedup import _fingerprint128  # noqa: F401 - re-export
from tbl_ray.stages.exchange import KeyBucket as _KeyBucket
from tbl_ray.stages.exchange import auto_buckets as _auto_buckets
from tbl_ray.stages.exchange import safe_group_by as _safe_group_by

_JOIN_TYPES = {"inner", "left outer"}


def _batch_content_hash(t: pa.Table) -> int:
    """64-bit hash that is a pure function of the table's LOGICAL values.

    Never hashes raw Arrow buffers: validity-bitmap trailing bits and
    64-byte padding are unspecified by the Arrow spec, and a zero-copy
    sliced batch exposes its parent's full buffers — a raw-buffer hash
    would not be stable across Ray lineage re-execution, which the skew
    salt's determinism requires. Columns hash per-row (position-mixed so
    permutations differ) via the same value-pure primitives the keyed
    exchange uses; nested/exotic types are skipped, degrading the hash's
    batch-decorrelation, never its determinism."""
    import numpy as np

    acc = np.uint64(0xCBF29CE484222325)
    for name in t.schema.names:
        col = t.column(name).combine_chunks()
        ty = col.type
        if pa.types.is_temporal(ty):
            # date32/time32 (and friends) have no direct cast to int64;
            # reinterpret the fixed-width storage instead (validity is
            # preserved by Array.view), then widen
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            try:
                storage = pa.int32() if ty.bit_width == 32 else pa.int64()
                col = arr.view(storage)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
                continue  # exotic temporal layout: skip, never crash
            ty = col.type
        if pa.types.is_integer(ty) or pa.types.is_boolean(ty):
            wide = pa.uint64() if pa.types.is_unsigned_integer(ty) else pa.int64()
            k = (
                pc.fill_null(pc.cast(col, wide), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
        elif pa.types.is_floating(ty):
            k = (
                pc.fill_null(pc.cast(col, pa.float64()), 0.0)
                .to_numpy(zero_copy_only=False)
                .view(np.uint64)
            )
        elif (
            pa.types.is_string(ty)
            or pa.types.is_large_string(ty)
            or pa.types.is_binary(ty)
            or pa.types.is_large_binary(ty)
        ):
            k, _ = _fingerprint128(col)
        else:
            continue
        pos = np.arange(len(k), dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (k + np.uint64(1)) * (
                pos * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(0xA24BAED4963EE407)
            )
            # avalanche the column sum BEFORE folding: the positional sum
            # is linear in arithmetic row sequences (consecutive id
            # blocks), which would leave the low bits — the only ones the
            # mod-skew_salt consumer sees — constant across batches
            s = h.sum(dtype=np.uint64)
            s ^= s >> np.uint64(33)
            s *= np.uint64(0xFF51AFD7ED558CCD)
            s ^= s >> np.uint64(33)
            s *= np.uint64(0xC4CEB9FE1A85EC53)
            s ^= s >> np.uint64(33)
            acc = (acc * np.uint64(0x100000001B3)) ^ s
    return int(acc)


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    on: str | list[str],
    *,
    join_type: str = "inner",
    rsuffix: str = "_r",
) -> "ray.data.Dataset":
    """Join a streaming Dataset against a small in-memory table.

    ``join_type``: ``inner`` or ``left outer`` (the big side is always the
    left/probe side). Key columns must exist on both sides; the small
    side's non-key columns append to the output. Small-side non-key names
    colliding with big-side names get ``rsuffix`` (same contract as
    ``join_auto``/``shuffle_join`` — Arrow ``Table.join`` would otherwise
    emit silent duplicate column names)."""
    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {sorted(_JOIN_TYPES)}")
    keys = [on] if isinstance(on, str) else list(on)
    for kcol in keys:
        if kcol not in small.schema.names:
            raise ValueError(f"key column {kcol!r} missing from small side")
    small_ref = ray.put(small.combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        left_names = set(t.schema.names)
        taken = left_names | set(s.schema.names)
        collide = {}
        for c in s.schema.names:
            if c in keys or c not in left_names:
                continue
            # suffix until unique on BOTH sides: a big side already
            # holding '<c>_r' would otherwise collide with the rename
            # itself (the exact silent-duplicate this exists to prevent)
            new = c + rsuffix
            while new in taken:
                new += rsuffix
            collide[c] = new
            taken.add(new)
        if collide:
            s = s.rename_columns(
                [collide.get(c, c) for c in s.schema.names]
            )
        return t.join(s, keys=keys, join_type=join_type)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    on: str | list[str],
    *,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Keep (semi) or drop (anti) big-side rows whose key appears in the
    small side — the filter form of the broadcast join."""
    keys = [on] if isinstance(on, str) else list(on)
    small_ref = ray.put(small.select(keys).combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        jt = "left anti" if anti else "left semi"
        return t.join(s, keys=keys, join_type=jt)

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_asof_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    *,
    on: str,
    by: str | None = None,
    value_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """As-of join against a small right side: each left row picks the right
    row with the LATEST ``on`` value <= its own, within its ``by`` group
    (DuckDB ``ASOF LEFT JOIN`` semantics; unmatched rows get nulls).

    The standard event-enrichment join (trade->quote, request->config
    version). Right side is bounded: sorted once driver-side, broadcast,
    probed per batch with a vectorized ``searchsorted`` (left keys
    dictionary-encoded — per-row Python only over batch-unique keys) —
    the big side streams, nothing shuffles."""
    import numpy as np

    by_keys = [by] if by else []
    vcols = value_cols or [
        c for c in small.schema.names if c != on and c not in by_keys
    ]
    small = small.filter(pc.is_valid(small.column(on)))  # null on never matches
    s = small.sort_by([*[(k, "ascending") for k in by_keys], (on, "ascending")])
    if by:
        rkeys = s.column(by).to_pylist()  # small side: bounded
        bounds: dict[object, tuple[int, int]] = {}
        start = 0
        for i in range(1, s.num_rows + 1):
            if i == s.num_rows or rkeys[i] != rkeys[start]:
                bounds[rkeys[start]] = (start, i)
                start = i
    else:
        bounds = {None: (0, s.num_rows)}
    on_sorted = np.asarray(s.column(on))
    right_ref = ray.put((s, bounds, on_sorted))

    def probe(t: pa.Table) -> pa.Table:
        s_tbl, bnds, on_arr = ray.get(right_ref)
        n = t.num_rows
        left_on = np.asarray(t.column(on))
        take_idx = np.full(n, -1, dtype=np.int64)
        if by:
            denc = t.column(by).combine_chunks().dictionary_encode()
            uniq = denc.dictionary.to_pylist()  # batch-unique keys only
            codes = np.asarray(denc.indices.cast(pa.int64()))
            for code, kk in enumerate(uniq):
                if kk not in bnds:
                    continue
                lo, hi = bnds[kk]
                rows = np.flatnonzero(codes == code)
                ridx = np.searchsorted(
                    on_arr[lo:hi], left_on[rows], side="right"
                ) - 1
                ok = ridx >= 0
                take_idx[rows[ok]] = lo + ridx[ok]
        else:
            lo, hi = bnds[None]
            ridx = np.searchsorted(on_arr[lo:hi], left_on, side="right") - 1
            ok = ridx >= 0
            take_idx[ok] = lo + ridx[ok]
        # Null left `on` values must NOT match (DuckDB ASOF semantics):
        # np.asarray turns them into NaN/NaT and searchsorted(..., "right")-1
        # would pin them to the LAST right row. Force those rows to -1.
        on_col = t.column(on)
        if on_col.null_count:
            take_idx[np.asarray(pc.is_null(on_col).combine_chunks())] = -1
        null_mask = take_idx < 0
        out = t
        for c in vcols:
            col = s_tbl.column(c).take(
                pa.array(np.where(null_mask, 0, take_idx), pa.int64())
            )
            if null_mask.any():
                col = pa.compute.if_else(
                    pa.array(~null_mask), col, pa.nulls(n, col.type)
                )
            out = out.append_column(c, col)
        return out

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    *,
    join_type: str = "inner",
    rsuffix: str = "_r",
    n_buckets: int | None = None,
    skew_keys: list | None = None,
    skew_salt: int = 8,
) -> "ray.data.Dataset":
    """EXPLICIT co-partitioned hash join for two LARGE sides.

    This is the all-to-all this module's broadcast joins deliberately
    avoid — reach for it only when neither side fits a broadcast. Both
    sides are widened to one union schema (each filling the other's
    columns with typed nulls, plus a side tag), the union hash-shuffles
    ONCE on the key, and each key group emits its left x right matches
    locally. ``join_type``: ``inner`` or ``left outer``. Right-side
    non-key columns colliding with left names get ``rsuffix``.

    ``n_buckets`` is the co-partition width (one vectorized Arrow join
    per bucket); ``None`` auto-sizes from the larger side's estimated
    bytes (floor 64 — see ``stages.exchange.auto_buckets``) so a bucket
    never outgrows a worker heap at corpus scale.

    Skew: a hot key's rows all land in ONE bucket/task by construction.
    ``skew_keys`` (an explicit hot-key list — from corpus stats, e.g. the
    top domains of a web table) fans each hot LEFT row out to one of
    ``skew_salt`` sub-buckets round-robin and REPLICATES the matching
    right rows into all ``skew_salt`` of them (the standard skew join):
    the hot key's work spreads over ``skew_salt`` tasks, every pair still
    meets exactly once, and non-hot keys pay nothing. Single-key joins
    only (raise otherwise)."""
    u, bucket_join = _shuffle_join_plan(
        left, right, on,
        join_type=join_type, rsuffix=rsuffix, n_buckets=n_buckets,
        skew_keys=skew_keys, skew_salt=skew_salt,
    )
    return u.groupby("__bucket__").map_groups(
        bucket_join, batch_format="pyarrow"
    )


def _shuffle_join_plan(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    *,
    join_type: str,
    rsuffix: str,
    n_buckets: int | None,
    skew_keys: list | None,
    skew_salt: int,
):
    """Build the widened/salted/bucketed union and the per-bucket join fn
    (separated so tests can assert bucket-size balance directly)."""
    import numpy as np

    if join_type not in _JOIN_TYPES:
        raise ValueError(f"join_type must be one of {sorted(_JOIN_TYPES)}")
    if n_buckets is None:
        # the larger side bounds bucket size (within 2x of the sum)
        n_buckets = max(_auto_buckets(left), _auto_buckets(right))
    keys = [on] if isinstance(on, str) else list(on)
    if skew_keys is not None and len(keys) != 1:
        raise ValueError("skew_keys requires a single join key")
    if skew_keys is not None and skew_salt < 2:
        raise ValueError(f"skew_salt must be >= 2 (got {skew_salt})")
    lsch = left.schema()
    rsch = right.schema()
    lsch = getattr(lsch, "base_schema", lsch)
    rsch = getattr(rsch, "base_schema", rsch)
    if lsch is None or rsch is None:
        raise ValueError(
            "shuffle_join needs a known schema on both sides; a row-filtered "
            "empty dataset loses its schema — construct empty sides with "
            "ray.data.from_arrow(<0-row table>) instead"
        )
    for kcol in keys:
        if kcol not in lsch.names or kcol not in rsch.names:
            raise ValueError(f"key column {kcol!r} missing from a side")
        if lsch.field(kcol).type != rsch.field(kcol).type:
            raise ValueError(f"key column {kcol!r} dtype differs across sides")
    lcols = [c for c in lsch.names if c not in keys]
    rcols_in = [c for c in rsch.names if c not in keys]
    # suffix until unique against BOTH sides (a left column named
    # '<c>_r' would collide with the rename itself) and prior renames
    taken = set(keys) | set(lcols) | set(rcols_in)
    rename = {}
    for c in rcols_in:
        new = c
        while new in set(lcols) or (new != c and new in taken):
            new += rsuffix
        rename[c] = new
        taken.add(new)
    rcols_out = [rename[c] for c in rcols_in]
    fields = (
        [(k, lsch.field(k).type) for k in keys]
        + [(c, lsch.field(c).type) for c in lcols]
        + [(rename[c], rsch.field(c).type) for c in rcols_in]
        + [("__side__", pa.int8())]
    )
    out_names = [n for n, _ in fields[:-1]]

    r_orig = {rename[c]: c for c in rcols_in}  # out name -> right source

    skew_vals = None
    if skew_keys is not None:
        skew_vals = pa.array(skew_keys, type=lsch.field(keys[0]).type)

    def widen(side: int):
        def fn(t: pa.Table) -> pa.Table:
            if side == 1:
                # SQL equality never matches NULL = NULL: right rows with
                # a null key can match nothing, so drop them before the
                # exchange (left null-key rows stay — inner emits nothing
                # for their group, left outer emits them with null right
                # columns, both per SQL)
                for kcol in keys:
                    t = t.filter(pc.is_valid(t.column(kcol)))
            n = t.num_rows
            cols = {}
            for name, typ in fields[:-1]:
                if name in keys:
                    src = name
                elif side == 0:
                    src = name if name in lcols else None
                else:
                    src = r_orig.get(name)
                if src is not None:
                    cols[name] = t.column(src).cast(typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__side__"] = pa.nulls(n, pa.int8()).fill_null(side)
            out = pa.table(cols)
            if skew_vals is None:
                return out
            hot = pc.fill_null(
                pc.is_in(out.column(keys[0]), value_set=skew_vals), False
            )
            hot_np = np.asarray(hot.combine_chunks())
            salt = np.zeros(n, dtype=np.int64)
            if side == 0:
                # round-robin the hot probe rows over the salt range,
                # starting at a per-batch offset DERIVED FROM BATCH CONTENT:
                # a key that is hot in aggregate but sparse per batch (1 hot
                # row per 1k-row block) would otherwise always draw salt 0
                # and the fan-out would silently do nothing. The offset must
                # be deterministic (not os.urandom): Ray may re-execute this
                # task for lineage reconstruction after downstream shuffle
                # blocks were partially consumed, and a nondeterministic
                # offset would land rows in different salt sub-buckets than
                # the first execution, duplicating or losing join rows.
                hot_idx = np.flatnonzero(hot_np)
                if len(hot_idx):
                    # hash EVERY column's values, not just a first hot
                    # value/position: regular layouts (the hot key at the
                    # same offset of every fixed-size block, cold keys
                    # constant) make any value/position hash identical
                    # across batches, collapsing every batch's hot rows
                    # into one salt sub-bucket. Payload columns (ids,
                    # docs) differ between batches, so a full-content
                    # hash decorrelates them; only batches whose logical
                    # values are identical in every column share a salt
                    # (their rows are indistinguishable anyway). The hash
                    # is a pure function of values, never raw buffers —
                    # see _batch_content_hash
                    # reduce mod skew_salt BEFORE adding: a full-width
                    # Python int would make numpy upcast the sum to
                    # float64 (mantissa loses the low bits -> every row
                    # the same salt)
                    h = _batch_content_hash(out) % skew_salt
                    salt[hot_idx] = (h + np.arange(len(hot_idx))) % skew_salt
                return out.append_column("__salt__", pa.array(salt))
            # build side: every hot row must meet every salt sub-bucket
            cold = out.filter(pc.invert(hot)).append_column(
                "__salt__", pa.array(np.zeros(int((~hot_np).sum()), np.int64))
            )
            hot_idx = np.flatnonzero(hot_np)
            if len(hot_idx) == 0:
                return cold
            rep = out.take(
                pa.array(np.repeat(hot_idx, skew_salt), pa.int64())
            ).append_column(
                "__salt__",
                pa.array(np.tile(np.arange(skew_salt, dtype=np.int64),
                                 len(hot_idx))),
            )
            return pa.concat_tables([cold, rep])

        return fn

    u = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    # Co-partition by key-HASH bucket, not by key: grouping on the raw key
    # calls the merge once per key (measured 150k Python calls on a 600k-row
    # lineitem join); grouping on n_buckets coarse buckets calls it once per
    # bucket and lets Arrow's vectorized hash join do the per-key work —
    # with SQL null semantics for free (Arrow join never matches NULL keys,
    # verified; right null-key rows were already dropped above).
    def bucket_join(t: pa.Table) -> pa.Table:
        side = t.column("__side__")
        lt = t.filter(pc.equal(side, 0)).select(keys + lcols)
        rt = t.filter(pc.equal(side, 1)).select(keys + rcols_out)
        return lt.join(rt, keys=keys, join_type=join_type).select(out_names)

    u = u.map_batches(
        _KeyBucket(keys, n_buckets), batch_format="pyarrow", zero_copy_batch=True
    )
    if skew_vals is not None:
        s = skew_salt

        def fold_salt(t: pa.Table) -> pa.Table:
            b = t.column("__bucket__").to_numpy(zero_copy_only=False)
            salt = t.column("__salt__").to_numpy(zero_copy_only=False)
            i = t.schema.get_field_index("__bucket__")
            t = t.set_column(
                i, "__bucket__", pa.array((b * s + salt).astype(np.int64))
            )
            return t.drop_columns(["__salt__"])

        u = u.map_batches(
            fold_salt, batch_format="pyarrow", zero_copy_batch=True
        )
    return u, bucket_join


# _KeyBucket moved to tbl_ray.stages.exchange (shared by every keyed
# exchange in the engine); alias kept for existing imports/tests.


def broadcast_range_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    *,
    by: str,
    on: str,
    start_col: str,
    end_col: str,
) -> "ray.data.Dataset":
    """Interval (range) join against a small broadcast side: each big-side
    row matches every small-side row with the same ``by`` key whose
    ``[start_col, end_col]`` range contains the row's ``on`` value
    (inclusive both ends — SQL ``BETWEEN``). Inner semantics: unmatched
    rows emit nothing; a row inside k overlapping ranges emits k rows.

    Execution: the range table ships once via ``ray.put``; every batch
    runs one vectorized mask per small-side range (equality on ``by`` AND
    two comparisons on ``on``) and a single ``take`` to materialize the
    matches. Cost is O(|small| x batch_rows) vector ops — the right shape
    while the range side is a dimension table (promo windows, config
    epochs, maintenance windows). For a LARGE range side, bucket both
    sides by (key, coarse time bucket) with
    ``tbl_ray.stages.partition.partition_by_hash`` and range-join per
    bucket instead.
    """
    for c in (by, start_col, end_col):
        if c not in small.schema.names:
            raise ValueError(f"column {c!r} missing from range side")
    bsch = ds.schema()
    bsch = getattr(bsch, "base_schema", bsch)
    if bsch is not None:  # fail at the driver, not inside a worker task
        for c in (by, on):
            if c not in bsch.names:
                raise ValueError(f"column {c!r} missing from big side")
    small_ref = ray.put(small.combine_chunks())

    def probe(t: pa.Table) -> pa.Table:
        import numpy as np

        s = ray.get(small_ref)
        payload = [c for c in s.schema.names if c not in (by, start_col, end_col)]
        key = t.column(by)
        onv = t.column(on)
        big_idx: list = []
        small_idx: list = []
        for i in range(s.num_rows):
            mask = pc.and_kleene(
                pc.equal(key, s.column(by)[i]),
                pc.and_kleene(
                    pc.greater_equal(onv, s.column(start_col)[i]),
                    pc.less_equal(onv, s.column(end_col)[i]),
                ),
            )
            rows = np.flatnonzero(
                pc.fill_null(mask, False).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
            )
            if len(rows):
                big_idx.append(rows)
                small_idx.append(np.full(len(rows), i, dtype=np.int64))
        if not big_idx:
            empty = t.slice(0, 0)
            for c in payload:
                empty = empty.append_column(c, s.column(c).slice(0, 0))
            return empty
        bi = np.concatenate(big_idx)
        si = np.concatenate(small_idx)
        out = t.take(bi)
        for c in payload:
            out = out.append_column(c, s.column(c).take(si))
        return out

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Anti join for two LARGE sides: keep left rows whose key appears
    nowhere in the right side, without broadcasting either.

    Scale shape (the co-bucketed design exact_dedup_bucketed pioneered):
    the right side first collapses to its per-block DISTINCT keys (the
    only bytes it contributes to the exchange), both sides are tagged
    and co-partitioned by ONE key-hash bucket exchange, and each bucket
    runs Arrow's vectorized ``left anti`` join locally. Null-key
    semantics match :func:`broadcast_semi_join`'s anti form exactly:
    a null right key matches nothing (dropped before the exchange), a
    null left key has no match and is KEPT (Arrow join semantics — note
    this differs from SQL ``NOT IN`` null poisoning, same as the
    broadcast plan)."""
    import numpy as np  # noqa: F401 - parity with sibling joins

    from tbl_ray.stages.exchange import KeyBucket as _KB
    from tbl_ray.stages.exchange import auto_buckets as _ab

    keys = [on] if isinstance(on, str) else list(on)
    lsch = left.schema()
    lsch = getattr(lsch, "base_schema", lsch)
    if lsch is None:
        lsch = pa.concat_tables(
            left.limit(1).iter_batches(batch_format="pyarrow", batch_size=None)
        ).schema
    lfields = [(n, lsch.field(n).type) for n in lsch.names]

    def widen_left(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n).cast(typ) for n, typ in lfields}
        cols["__side__"] = pa.nulls(t.num_rows, pa.int8()).fill_null(0)
        return pa.table(cols)

    def widen_right(t: pa.Table) -> pa.Table:
        t = t.select(keys)
        for kcol in keys:  # null right keys can never match: drop early
            t = t.filter(pc.is_valid(t.column(kcol)))
        # module-scope import (_safe_group_by): this closure runs in Ray
        # workers, where a late `from tbl_ray...` import breaks under a
        # foreign driver cwd
        t = _safe_group_by(t, keys)  # per-block distinct: shrink the shuffle
        n = t.num_rows
        cols = {}
        for name, typ in lfields:
            if name in keys:
                cols[name] = t.column(name).cast(typ)
            else:
                cols[name] = pa.nulls(n, typ)
        cols["__side__"] = pa.nulls(n, pa.int8()).fill_null(1)
        return pa.table(cols)

    u = left.map_batches(
        widen_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            widen_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if n_buckets is None:
        n_buckets = _ab(left)

    def bucket_anti(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__bucket__"])
        side = t.column("__side__")
        lt = t.filter(pc.equal(side, 0)).drop_columns(["__side__"])
        rt = t.filter(pc.equal(side, 1)).select(keys)
        return lt.join(rt, keys=keys, join_type="left anti")

    bucketed = u.map_batches(
        _KB(keys, n_buckets), batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed.groupby("__bucket__").map_groups(
        bucket_anti, batch_format="pyarrow"
    )


def join_auto(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    *,
    join_type: str = "inner",
    semi: bool = False,
    anti: bool = False,
    rsuffix: str = "_r",
    right_on: str | list[str] | None = None,
) -> "ray.data.Dataset":
    """Statistics-driven join: broadcast the right side when it is
    PROVABLY small (``tbl_ray.sizing`` — exact bytes for materialized
    inputs, summed file sizes for lazy reads, unknown = huge), else run
    the explicit co-partitioned shuffle join. The same
    broadcast-vs-shuffle decision a SQL planner makes from table
    statistics; results are identical either way (tests drive both via
    ``TBL_RAY_LOCAL_SKETCH_BYTES``).

    ``right_on`` joins differently-named right key columns (renamed to
    ``on`` in the output). Pass the right side UNMAPPED when you can: a
    ``map_batches`` breaks the lazy-read size proof (``input_files`` no
    longer reaches the source), silently forcing the shuffle plan —
    ``right_on`` exists so a key rename never costs the broadcast.

    ``semi``/``anti`` return the filter form (left rows kept/dropped by
    key membership, no right columns). A right side too big to broadcast
    routes to a co-bucketed shuffle plan: ``anti`` to
    ``shuffle_anti_join`` (one keyed exchange of both sides, per-bucket
    membership filter — the same design as
    ``tbl_ray.functions.dedup.exact_dedup_bucketed``), ``semi`` to an
    inner ``shuffle_join`` against the right side's distinct keys.
    """
    from tbl_ray.sizing import collect_local, fits_local

    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    if len(rkeys) != len(keys):
        raise ValueError("right_on must name one column per `on` key")
    rename = dict(zip(rkeys, keys))

    def rename_keys_table(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [rename.get(c, c) for c in t.schema.names]
        )

    if fits_local(right):
        t = collect_local(right)
        if t is None:  # empty right side: synthesize its schema
            rsch = right.schema()
            rsch = getattr(rsch, "base_schema", rsch)
            t = rsch.empty_table()
        t = rename_keys_table(t)
        if semi or anti:
            return broadcast_semi_join(left, t, keys, anti=anti)
        # match the shuffle plan's schema: right non-key columns that
        # collide with left names get rsuffix (Arrow's Table.join would
        # silently emit duplicate column names otherwise, so the two
        # plans would diverge)
        lsch = left.schema()
        lsch = getattr(lsch, "base_schema", lsch)
        if lsch is not None:
            lnames = set(lsch.names)
            t = t.rename_columns(
                [
                    c if c in keys or c not in lnames else c + rsuffix
                    for c in t.schema.names
                ]
            )
        return broadcast_join(left, t, keys, join_type=join_type)
    if anti:
        if rkeys != keys:
            right = right.map_batches(
                rename_keys_table, batch_format="pyarrow", zero_copy_batch=True
            )
        return shuffle_anti_join(left, right, keys)
    if rkeys != keys:
        right = right.map_batches(
            rename_keys_table, batch_format="pyarrow", zero_copy_batch=True
        )
    if semi:
        from tbl_ray.stages.aggregate import distinct_rows

        right = distinct_rows(right.select_columns(keys), keys)
        return shuffle_join(left, right, keys, join_type="inner")
    return shuffle_join(
        left, right, keys, join_type=join_type, rsuffix=rsuffix
    )
