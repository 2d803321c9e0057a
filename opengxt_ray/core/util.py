"""Small runtime helpers."""

from __future__ import annotations


def default_concurrency(cap: int | None = None) -> int:
    """Actor-pool sizing: a FIXED pool of cluster-CPU actors.

    Ray's autoscaling pool ((1, N) tuples) scales up too conservatively
    for short jobs — measured ~6 busy actors out of 32 on a 17 s stage —
    so stateful stages default to an exact pool sized to the cluster.
    Pass an explicit ``concurrency`` to ops when several actor stages
    must share the cluster simultaneously.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    hi = max(2, cpus - 2)  # leave CPUs for upstream read/map tasks
    if cap:
        hi = min(hi, cap)
    return hi


def default_shuffle_partitions() -> int:
    """Hash-shuffle partition count for groupbys: ~cluster CPUs.

    Passing num_partitions switches Ray's groupby from the sort-based
    all-to-all to hash-shuffle aggregators — measured ~2× less fixed
    cost on medium shuffles (hex binning 7.7 s → 4.0 s at sf0.1).
    """
    try:
        import ray

        return max(8, int(ray.cluster_resources().get("CPU", 8))) \
            if ray.is_initialized() else 8
    except Exception:
        return 8


def default_join_partitions() -> int:
    """Partition count for ``Dataset.join``: ~cluster CPUs, floor 8.

    Measured lore (BASELINE.md): a join with 32 partitions stalls ≤4-CPU
    sessions (each partition pair pins a task; too many tiny partitions
    thrash the tiny object store), while a fixed 8 chokes a big cluster
    into an 8-way funnel. Scale with CPUs, floor at the small-session-safe
    8 — at 256 nodes this becomes one partition per core instead of a
    hardcoded constant.
    """
    try:
        import ray

        if ray.is_initialized():
            return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 8


def install_empty_bundle_warning_filter() -> None:
    """Silence ONLY the benign empty-bundle RefBundle warning.

    Ray's sort shuffle can emit 0-row SCHEMA-LESS partitions when the
    sampled range boundaries duplicate over a small key space (racy;
    remaining sites: union_polygon / minhash map_groups — every other
    site was fixed for real by typed empties + coalesce_for_groupby,
    round-5 sweep). Map stages never invoke UDFs on 0-row blocks, so
    these cannot be stamped with a schema from user code, and all
    downstream consumers in this repo handle typed empties (gate
    67/67). This filter drops the executor warning only when one side
    of the comparison is the EMPTY schema — a real typed-vs-typed
    schema mismatch still warns. Driver surfaces (__ray_entry__,
    bench, gate tool) install it; set OGXT_KEEP_EMPTY_SCHEMA_WARNINGS=1
    to see everything (tools/schema_warnings.py does).
    """
    import logging
    import os
    import re

    if os.environ.get("OGXT_KEEP_EMPTY_SCHEMA_WARNINGS"):
        return

    class _EmptyBundleFilter(logging.Filter):
        ogxt_empty_bundle = True  # idempotence marker
        _empty_new = re.compile(r"new schema: *\. This may lead")
        _empty_prev = re.compile(r"Previous schema: *, new schema:")

        def filter(self, record):
            try:
                msg = record.getMessage()
            except Exception:
                return True
            if "RefBundle with a different schema" not in msg:
                return True
            return not (self._empty_new.search(msg)
                        or self._empty_prev.search(msg))

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(getattr(f, "ogxt_empty_bundle", False) for f in lg.filters):
        lg.addFilter(_EmptyBundleFilter())


def coalesce_for_groupby(ds, nkeys_hint: int | None = None):
    """Coalesce blocks entering a sort-shuffled groupby/map_groups.

    The sort shuffle emits one reduce partition PER INPUT BLOCK;
    surplus partitions over the distinct-key count (or duplicate
    sampled range boundaries at small scale) come out as EMPTY
    schema-less blocks that trip the executor's mixed-schema RefBundle
    warning — and schema-less empties have previously broken
    downstream joins (multi_windrose round-3 fix, CLAUDE.md lore).

    With a key-count hint, target ≥8 distinct keys per reduce
    partition; always cap at the shuffle default so reduce parallelism
    still scales with the cluster (the hint only ever SHRINKS the
    partition count at toy scale — at 100-TB scale keys ≫ CPUs and
    this is the plain ~CPU-count coalesce).

    CAUTION: with no hint this repartitions to the CPU-count target
    even when the input has FEWER blocks/rows than that —
    repartitioning a tiny table UP mints schema-less empty blocks, the
    exact artifact this helper exists to avoid, and those poison
    downstream hash-shuffle joins (round-5 buffer_statistics
    regression). Pass a hint whenever the key count is knowable; skip
    the coalesce entirely for possibly-tiny unhinted inputs.
    """
    tgt = default_shuffle_partitions()
    if nkeys_hint is not None:
        tgt = max(1, min(tgt, int(nkeys_hint) // 8))
    return ds.repartition(tgt)
