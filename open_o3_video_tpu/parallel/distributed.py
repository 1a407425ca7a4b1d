"""Multi-host bootstrap and global-array helpers.

The TPU-native replacement for the reference's torchrun rendezvous + NCCL
process groups (SURVEY.md §5.8, run_grpo_video.sh:11-15):

- ``initialize()`` wraps ``jax.distributed.initialize`` — called once per
  host before any backend touch. On a TPU pod the coordinator is
  auto-discovered; elsewhere pass coordinator/num_processes/process_id
  (or set JAX_COORDINATOR_ADDRESS etc.).
- ``make_hybrid_mesh()`` lays out (data, fsdp, tensor) so that fsdp/tensor
  ride ICI within a slice and the extra data parallelism crosses DCN —
  collectives compiled by GSPMD land on the right fabric.
- ``put_global()`` builds a global sharded array from per-process local
  rows (== each DDP rank feeding its own samples).
- ``is_primary()`` gates host-side IO (checkpoint export, metric sinks,
  result files) to process 0 — the analogue of the reference's implicit
  rank-0 writes through HF Trainer.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-process; returns True if so.

    Safe to call when single-process (no-op) or when already initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = coordinator_address is not None and num_processes is not None
    # Auto-init only on a REAL pod: multiple TPU worker hosts (a single
    # entry means one host — e.g. the tunnel sets TPU_WORKER_HOSTNAMES=
    # localhost) or a megascale coordinator.
    workers = [w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w]
    auto_pod = len(workers) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not auto_pod:
        return False
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()  # TPU pod: auto-discovered
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return jax.process_count() > 1


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def make_hybrid_mesh(data: int = 1, fsdp: int = -1, tensor: int = 1, dcn_data: Optional[int] = None):
    """(data, fsdp, tensor) mesh spanning all processes.

    ``dcn_data`` slices of ``data x fsdp x tensor`` devices each: the outer
    data parallelism crosses DCN, fsdp/tensor stay on ICI (the scaling-book
    recipe; the reference's analogue is one DDP rank per GPU). Defaults to
    one DCN slice per process. Single-process falls back to ``make_mesh``.
    """
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    from .mesh import make_mesh

    if dcn_data is None:
        dcn_data = jax.process_count()
    if dcn_data <= 1:
        return make_mesh(data=data, fsdp=fsdp, tensor=tensor)

    per_slice = len(jax.devices()) // dcn_data
    if fsdp == -1:
        fsdp = per_slice // (data * tensor)
    assert data * fsdp * tensor == per_slice, (
        f"ICI mesh {data}x{fsdp}x{tensor} != {per_slice} devices/slice"
    )
    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data, fsdp, tensor),
            dcn_mesh_shape=(dcn_data, 1, 1),
        )
    except ValueError:
        # Platforms without a slice_index (CPU simulation, single-slice
        # multi-host): one process == one DCN granule.
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data, fsdp, tensor),
            dcn_mesh_shape=(dcn_data, 1, 1),
            process_is_granule=True,
        )
    return Mesh(devices, axis_names=("data", "fsdp", "tensor"))


def put_global(x: np.ndarray, mesh, spec):
    """Global sharded array from this process's LOCAL rows.

    Single-process: plain device_put. Multi-process: each host passes the
    rows of the batch that live on its devices (the first sharded axis is
    split across processes in mesh order), and JAX assembles the global
    array — the analogue of every DDP rank feeding its own samples.
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def sync(tag: str = "sync") -> None:
    """Barrier across processes (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def scalar(x) -> float:
    """Host float from a (possibly non-fully-addressable) replicated array."""
    try:
        return float(x)
    except RuntimeError:
        return float(x.addressable_data(0))


def all_hosts_ok(ok: bool, tag: str = "batch") -> bool:
    """Consensus on a host-local success flag.

    Returns True only when EVERY process succeeded, so all hosts take the
    same branch (skip or proceed). Host-local skip-on-failure without this
    desynchronizes an SPMD fleet: one host advances to the next batch while
    the others launch the current one, and the paired collectives deadlock.
    Single-process: returns ``ok`` unchanged."""
    import jax

    if jax.process_count() == 1:
        return bool(ok)
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray([1 if ok else 0]))
    return bool(np.asarray(g).min() == 1)


def assert_in_sync(digest: np.ndarray, tag: str = "batch") -> None:
    """Fail LOUDLY if hosts disagree on ``digest`` (a small int/float array).

    Host-local failure absorption (degraded samples, last-good substitution)
    can silently desynchronize an SPMD fleet — hosts would then launch
    different programs and deadlock in a collective. Checking a digest of
    the step's inputs turns that hang into an immediate, attributable error.
    No-op single-process.
    """
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    digest = np.asarray(digest).reshape(-1)
    gathered = multihost_utils.process_allgather(digest)  # (n_proc, n)
    if not (gathered == gathered[0]).all():
        raise RuntimeError(
            f"SPMD divergence on '{tag}': hosts computed different inputs "
            f"(digests: {gathered.tolist()}); a host-local failure was "
            "absorbed inconsistently. Fix the data source or exclude the "
            "failing item on every host."
        )
