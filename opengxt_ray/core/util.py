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
