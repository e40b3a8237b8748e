"""Multi-host (multi-process) execution support.

The reference is single-GPU (`/root/reference/train.py:32` hardcodes
``cuda:0``); this framework additionally scales over multiple hosts, each
owning a slice of a global ``("obj", "data")`` device mesh (DCN between
hosts, ICI within): the object bank shards across ALL hosts' devices, the
frame stream is read identically by every process (SLAM input is a single
deterministic stream, so no data distribution is needed), and XLA inserts
the cross-host collectives.

Environment-driven bring-up (call :func:`init_from_env` before any other
JAX usage)::

    VMAP_COORDINATOR=host0:9999 VMAP_NUM_PROCESSES=2 VMAP_PROCESS_ID=0 \
        python train.py --config ... --logdir ...

Every process runs the same train loop; per-frame losses are replicated
scalars (identical on all processes). Host-side views of sharded state
(meshing, eval, checkpointing) go through :func:`replicate_tree` — a
collective all-gather, so ALL processes must reach those call sites (the
Mapper's ``bank_obj``/``bank_bg`` getters do this transparently); only the
primary process writes artifacts.
"""

from __future__ import annotations

import os

import jax


def init_from_env() -> tuple[int, int]:
    """Initialise jax.distributed from VMAP_COORDINATOR /
    VMAP_NUM_PROCESSES / VMAP_PROCESS_ID. No-op (returns (0, 1)) when the
    coordinator is unset — single-process runs are unaffected."""
    coord = os.environ.get("VMAP_COORDINATOR")
    if not coord:
        return 0, 1
    nproc = int(os.environ["VMAP_NUM_PROCESSES"])
    pid = int(os.environ["VMAP_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return pid, nproc


def is_primary() -> bool:
    """True on the process that should write artifacts (logs, meshes,
    host-state JSON)."""
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


import functools


@functools.lru_cache(maxsize=8)
def _gather_fn(sharding):
    """Jitted identity with replicated out_shardings, cached per sharding
    so repeated host-view gathers reuse one trace/compile."""
    return jax.jit(lambda t: t, out_shardings=sharding)


def replicate_tree(tree, mesh):
    """All-gather every leaf of a (possibly obj-sharded) pytree to a fully
    replicated layout so the host can view it with ``np.asarray``.

    COLLECTIVE: in multi-process runs every process must call this with the
    same operands (the cross-host all-gather blocks otherwise)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return _gather_fn(NamedSharding(mesh, P()))(tree)
