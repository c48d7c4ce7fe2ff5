"""Multi-host (multi-process) distributed runtime.

The reference's workhorse is multi-node DDP at ``--distributed-world-size 32``
over NCCL (reference SpeechT5/README.md:92-94, fairseq legacy_ddp).  The
TPU-native equivalent (SURVEY.md §2.8): ``jax.distributed.initialize`` joins
every host into ONE global device view; the existing ``Mesh('data','model')``
then simply spans all processes' devices and XLA inserts the cross-host
collectives (psum over ICI within a slice, DCN across slices).  Nothing in the
model/trainer code changes — only how arrays come into being:

- each host loads ONLY its slice of the global batch (``process_rows``) and
  the trainer assembles the global array with
  ``jax.make_array_from_process_local_data``;
- host-initialized state is placed onto cross-process shardings with
  ``jax.make_array_from_callback`` (``host_to_global``);
- eval-side per-row outputs come back via ``local_rows`` (this host's shard
  rows) and scalar metrics are summed across hosts with ``allsum_scalars``.

The CPU integration harness (tests/test_distributed.py) runs the same code
path with two local processes + gloo collectives — the "multi-node without a
cluster" rig the reference never had (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    platform: Optional[str] = None,
) -> None:
    """Join this process into the global JAX runtime.

    Must run before the first backend use.  On TPU pods the three arguments
    are auto-detected from the environment (pass nothing); ``platform="cpu"``
    forces the CPU backend with gloo cross-process collectives — the
    integration-test configuration.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """Gate for rank-0-only side effects (log prints, metrics files)."""
    return process_index() == 0


def process_rows(global_batch_size: int) -> slice:
    """This process's contiguous row block of a global batch.

    The mesh's 'data' axis follows ``jax.devices()`` order, which is
    process-major, so shard i of the batch axis lives on process
    ``i // (shards_per_process)`` — a contiguous block per process.
    """
    n = process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{n} processes"
    )
    per = global_batch_size // n
    p = process_index()
    return slice(p * per, (p + 1) * per)


def make_global_batch(local_batch, mesh, batch_axis: int = 0):
    """Assemble per-process batch slices into global arrays sharded over the
    mesh 'data' axis.  ``local_batch`` holds THIS process's rows only."""
    import jax
    from .sharding import batch_shardings

    shardings = batch_shardings(local_batch, mesh, batch_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(
            s, np.asarray(x)
        ),
        local_batch, shardings,
    )


def host_to_global(tree, shardings):
    """Place host-replicated values onto (possibly cross-process) shardings.

    Every process holds the full value; each contributes exactly its
    addressable shards, so this works for replicated, FSDP- and
    tensor-sharded specs alike without sending anything over the wire.
    """
    import jax

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def local_rows(global_array) -> np.ndarray:
    """This process's rows of a batch-axis-sharded output, in global row
    order (for eval-side postprocessing of per-row outputs)."""
    shards = sorted(
        global_array.addressable_shards,
        key=lambda s: (s.index[0].start or 0) if s.index else 0,
    )
    rows, seen = [], set()
    for s in shards:
        start = (s.index[0].start or 0) if s.index else 0
        if start in seen:  # replicated over 'model': one copy is enough
            continue
        seen.add(start)
        rows.append(np.asarray(s.data))
    return np.concatenate(rows, axis=0)


def unify_batch_shapes(batch: dict, pad_values: Optional[dict] = None) -> dict:
    """Pad this host's collated arrays to the elementwise-max shape across
    processes.

    Bucketed collation pads to the local sub-batch's bucket, and different
    hosts' slices of one global batch can land in different buckets —
    ``make_array_from_process_local_data`` then sees inconsistent shapes.
    One tiny allgather of the shape vector per step unifies them (shapes are
    bucketed, so the program cache stays small).  Axis 0 (local rows) is
    never padded; ``pad_values`` maps keys to their pad id (default 0 —
    token targets MUST pass their pad id or padding becomes real labels).
    """
    if process_count() == 1:
        return batch
    from jax.experimental import multihost_utils

    pad_values = pad_values or {}
    keys = sorted(batch)
    vec = np.concatenate(
        [np.asarray(np.shape(batch[k]), np.int64) for k in keys]
    )
    gathered = np.asarray(multihost_utils.process_allgather(vec))
    maxv = gathered.max(axis=0)
    out, off = {}, 0
    for k in keys:
        arr = np.asarray(batch[k])
        tgt = tuple(int(x) for x in maxv[off : off + arr.ndim])
        off += arr.ndim
        assert tgt[0] == arr.shape[0], (
            f"{k}: local row count differs across hosts "
            f"({arr.shape[0]} vs {tgt[0]})"
        )
        if tgt != arr.shape:
            pads = [(0, t - s) for s, t in zip(arr.shape, tgt)]
            arr = np.pad(arr, pads, constant_values=pad_values.get(k, 0))
        out[k] = arr
    return out


def allsum_scalars(values: dict) -> dict:
    """Sum python-scalar metrics across processes (the reference's
    cross-rank ``reduce_metrics`` aggregation, SURVEY.md §5.5)."""
    import jax

    if process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    vec = np.asarray([float(values[k]) for k in keys], np.float64)
    summed = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def barrier(name: str = "barrier") -> None:
    import jax

    if process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
