"""Data-parallel training over a jax.sharding.Mesh.

The reference's only multi-device mode is single-node data parallelism
(optional ``nn.DataParallel``/DDP over NCCL, SURVEY.md §2 "parallelism
strategies"). The TPU-native equivalent: a 1-D ``Mesh`` over the chips,
batch sharded on the ``data`` axis, parameters replicated, gradients and
sync-BN statistics averaged with ``psum``/``pmean`` riding the ICI —
expressed with ``shard_map`` so the per-device program is explicit and the
collectives are visible to XLA's scheduler (BASELINE config #5).

Works identically on real TPU slices and on the virtual CPU mesh
(``--xla_force_host_platform_device_count``) used by tests and the driver's
``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def make_parallel_train_step(train_step: Callable, mesh: Mesh) -> Callable:
    """Wrap a pure per-device train step for DP execution.

    ``train_step`` must be built with ``make_train_step(...,
    axis_name=DATA_AXIS)`` so its gradient pmean / sync-BN collectives bind
    to this mesh axis. Batch inputs are sharded along their leading axis;
    the train state is fully replicated.
    """
    replicated = P()
    sharded = P(DATA_AXIS)
    fn = jax.shard_map(
        train_step, mesh=mesh,
        in_specs=(replicated, sharded, sharded, sharded),
        out_specs=(replicated, replicated),
        check_vma=False)
    # donate the replicated train state (rewritten every step; the caller
    # reassigns ts = fn(ts, ...)) — in-place buffer reuse on every device
    return jax.jit(fn, donate_argnums=(0,))


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with leading-axis sharding over the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. TrainState) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
