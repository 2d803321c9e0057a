"""Histogram operators + event sessionization.

Reference:
- HistogramFeatures / HistogramGridCoverage: GT/core/HistogramFeatures
  .java — value counts per bin.
- Sessionization is an engine extension for the events table (gap-based
  sessions) — the kind of windowed event op a training-data pipeline
  needs; expressible in SQL with lag+cumsum windows (oracle-checkable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def histogram(ds, col: str, breaks: list[float]):
    """Counts per [b_i, b_{i+1}) bin (last bin closed). Partial per
    block → single combine."""
    edges = np.asarray(breaks, dtype=np.float64)
    k = len(edges) - 1

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.searchsorted(edges, v, side="right") - 1
        idx = np.where(v == edges[-1], k - 1, idx)
        ok = (idx >= 0) & (idx < k)
        cnt = np.bincount(idx[ok], minlength=k)
        return pa.table({f"b{i}": [int(cnt[i])] for i in range(k)})

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(f"b{i}") for i in range(k)])
    return pa.table({
        "bin": pa.array(np.arange(k, dtype=np.int32)),
        "lower": pa.array(edges[:-1]),
        "upper": pa.array(edges[1:]),
        "count": pa.array([int(agg[f"sum(b{i})"]) for i in range(k)],
                          pa.int64()),
    })


def raster_histogram(tiles, breaks: list[float]):
    """HistogramGridCoverage over a tile Dataset."""
    edges = np.asarray(breaks, dtype=np.float64)
    k = len(edges) - 1

    def _partial(batch: pa.Table) -> pa.Table:
        cnt = np.zeros(k, dtype=np.int64)
        for blob in batch["data"]:
            v = np.frombuffer(blob.as_py(), dtype=np.float64)
            v = v[~np.isnan(v)]
            idx = np.searchsorted(edges, v, side="right") - 1
            idx = np.where(v == edges[-1], k - 1, idx)
            ok = (idx >= 0) & (idx < k)
            cnt += np.bincount(idx[ok], minlength=k)
        return pa.table({f"b{i}": [int(cnt[i])] for i in range(k)})

    parts = tiles.map_batches(_partial, batch_format="pyarrow")
    agg = parts.aggregate(*[ray.data.aggregate.Sum(f"b{i}") for i in range(k)])
    return pa.table({
        "bin": pa.array(np.arange(k, dtype=np.int32)),
        "lower": pa.array(edges[:-1]),
        "upper": pa.array(edges[1:]),
        "count": pa.array([int(agg[f"sum(b{i})"]) for i in range(k)],
                          pa.int64()),
    })


def sessionize(events_ds, *, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: float = 30.0):
    """Gap-based sessions per user: a new session starts when the gap
    to the previous event exceeds ``gap_minutes``.

    groupby(user).map_groups with an in-group sort — each user's events
    fit one group (the standard event-log pattern). Emits
    (user, event ts, session_idx (0-based per user), session_len).
    """
    gap_us = int(gap_minutes * 60 * 1e6)

    def _sess(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group[ts_col])
        g = group.take(order)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsi = ts.astype(np.int64)
        new = np.zeros(len(tsi), dtype=np.int64)
        if len(tsi) > 1:
            new[1:] = (np.diff(tsi) > gap_us).astype(np.int64)
        sess = np.cumsum(new)
        return pa.table({
            user_col: g[user_col],
            ts_col: g[ts_col],
            "session_idx": pa.array(sess),
        })

    return events_ds.groupby(user_col).map_groups(_sess,
                                                  batch_format="pyarrow")


def session_stats(events_ds, *, user_col="user_id", ts_col="ts",
                  gap_minutes: float = 30.0):
    """Per-session aggregate: (user, session_idx, n_events,
    duration_sec)."""
    sess = sessionize(events_ds, user_col=user_col, ts_col=ts_col,
                      gap_minutes=gap_minutes)

    def _agg(group: pa.Table) -> pa.Table:
        ts = group[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return pa.table({
            user_col: [group[user_col][0].as_py()],
            "session_idx": [group["session_idx"][0].as_py()],
            "n_events": pa.array([len(ts)], pa.int64()),
            "duration_sec": pa.array([(ts.max() - ts.min()) / 1e6]),
        })

    return sess.groupby([user_col, "session_idx"]).map_groups(
        _agg, batch_format="pyarrow")


def funnel(events_ds, steps: list[str], *, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type"):
    """Ordered funnel: per user, the deepest step reached such that each
    step's FIRST occurrence comes strictly after the previous step's.
    Returns (step_idx, step, users) — users reaching ≥ that step.

    groupby(user).map_groups over sorted events (the event-log pattern);
    SQL-oracle-expressible via cascaded min-ts window aggregates.
    """
    import ray

    def _depth(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group[ts_col])
        g = group.take(order)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        types = g[type_col].to_pylist()
        prev_t = -1
        depth = 0
        for step in steps:
            nxt = None
            for t, ty in zip(ts, types):
                if ty == step and t > prev_t:
                    nxt = t
                    break
            if nxt is None:
                break
            prev_t = nxt
            depth += 1
        return pa.table({user_col: [group[user_col][0].as_py()],
                         "depth": pa.array([depth], pa.int64())})

    depths = events_ds.groupby(user_col).map_groups(_depth,
                                                    batch_format="pyarrow")

    def _partial(batch: pa.Table) -> pa.Table:
        d = batch["depth"].to_numpy()
        cnt = [int((d >= i + 1).sum()) for i in range(len(steps))]
        return pa.table({f"s{i}": [cnt[i]] for i in range(len(steps))})

    agg = depths.map_batches(_partial, batch_format="pyarrow").aggregate(
        *[ray.data.aggregate.Sum(f"s{i}") for i in range(len(steps))])
    return pa.table({
        "step_idx": pa.array(np.arange(len(steps), dtype=np.int64)),
        "step": pa.array(steps, pa.string()),
        "users": pa.array([int(agg[f"sum(s{i})"]) for i in range(len(steps))],
                          pa.int64()),
    })


def cohort_retention(events_ds, *, user_col: str = "user_id",
                     ts_col: str = "ts",
                     num_partitions: int | None = None):
    """Cohort retention matrix — the standard events-pipeline rollup:
    users are cohorted by their FIRST active day; each (cohort_day,
    day_offset) cell counts the distinct users of that cohort active
    ``offset`` days later. All-integer (epoch days), hash-exact vs the
    SQL min/date_diff oracle.

    Scale shape: pass 1 reduces events to per-user first-day via
    ``groupby(user).min`` (slim (user, day) shuffle); pass 2 co-groups
    the distinct (user, day) activity with the cohort table by USER
    hash bucket (union + groupby — never a driver-side map), computes
    offsets vectorized, and a final small groupby counts distinct
    users per (cohort, offset) — output is calendar-sized, not
    event-sized.
    """
    import ray

    from ..core.fid import hash_ints
    from ..core.util import default_shuffle_partitions

    num_partitions = num_partitions or default_shuffle_partitions()
    US_PER_DAY = 86_400_000_000

    def _days(b: pa.Table, tag: int) -> pa.Table:
        import pyarrow.compute as pc
        u = b[user_col].to_numpy(zero_copy_only=False)
        day = (pc.cast(b[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False) // US_PER_DAY)
        t = pa.table({user_col: pa.array(u, pa.int64()),
                      "day": pa.array(day, pa.int64())})
        if tag >= 0:
            t = t.append_column("tag", pa.array(
                np.full(len(u), tag, np.int64)))
        return t

    # pass 1: per-user cohort day (min active day)
    cohorts = events_ds.map_batches(
        lambda b: _days(b, -1), batch_format="pyarrow").groupby(
        user_col, num_partitions=num_partitions).min("day")

    # distinct (user, day) activity — dedup inside the same bucket
    # co-shuffle as the cohort join (one exchange, not two)
    def _bkt(b: pa.Table) -> pa.Table:
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bkt = (hash_ints(u) % np.uint64(num_partitions * 8)).astype(
            np.int64)
        return b.append_column("bkt", pa.array(bkt, pa.int64()))

    acts = events_ds.map_batches(
        lambda b: _days(b, 0), batch_format="pyarrow")
    coh_tagged = cohorts.map_batches(
        lambda b: pa.table({user_col: b[user_col],
                            "day": b["min(day)"],
                            "tag": pa.array(
                                np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    unioned = acts.union(coh_tagged).map_batches(
        _bkt, batch_format="pyarrow")

    def _offsets(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # empty shuffle partition — typed
            return pa.table({"cohort_day": pa.array([], pa.int64()),
                             "offs": pa.array([], pa.int64()),
                             user_col: pa.array([], pa.int64())})
        u = group[user_col].to_numpy(zero_copy_only=False)
        d = group["day"].to_numpy(zero_copy_only=False)
        tag = group["tag"].to_numpy(zero_copy_only=False)
        # cohort lookup within the bucket: every user's cohort row is
        # co-located here by construction
        cu = u[tag == 1]
        cd = d[tag == 1]
        order = np.argsort(cu)
        cu, cd = cu[order], cd[order]
        au, ad = u[tag == 0], d[tag == 0]
        pos = np.searchsorted(cu, au)
        cohort = cd[np.clip(pos, 0, max(cu.size - 1, 0))]
        offs = ad - cohort
        # distinct (cohort, offs, user) within the bucket = global
        # distinct (users live in exactly one bucket)
        key = np.stack([cohort, offs, au])
        _, first = np.unique(key, axis=1, return_index=True)
        return pa.table({
            "cohort_day": pa.array(cohort[first], pa.int64()),
            "offs": pa.array(offs[first], pa.int64()),
            user_col: pa.array(au[first], pa.int64())})

    import ray.data.aggregate as A

    distinct = unioned.groupby("bkt", num_partitions=num_partitions) \
        .map_groups(_offsets, batch_format="pyarrow")
    return distinct.groupby(["cohort_day", "offs"]).aggregate(
        A.Count())
