"""Device mesh + sharding rules: the framework's entire distributed layer.

The reference's distributed stack is mmcv `init_dist('slurm')` + NCCL DDP
wrappers + a rank-strided `DistributedSampler` + manual `module.`-prefix
checkpoint churn (`Diffusion_Stage/tools/train.py:64-74`,
`datasets/dataloader.py:16-53`, `options/base_options.py:61-65`).  The
TPU-native equivalent is ~no code: one `jax.sharding.Mesh` over ('data',
'seq'), batch arrays placed with a NamedSharding, params replicated, and XLA
inserts every collective (gradient psum over ICI, all-gathers for the
loss-aware sampler) from the sharding annotations alone.

- data axis: batch sharding = data parallelism (DDP/DataParallel equivalent).
- seq axis: optional T-sharding for the linear-attention KV reduction — the
  context-parallel escape hatch (SURVEY.md §5.7); linear attention's time
  reduction is a single psum, so XLA handles T-sharded q/k/v natively.

Multi-host: call `jax.distributed.initialize()` before `make_mesh`; device
order from `mesh_utils.create_device_mesh` keeps ICI-adjacent devices on the
same axis so collectives ride ICI, not DCN.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, seq: int = 1, *, devices: list | None = None
) -> Mesh:
    """Build a ('data', 'seq') mesh.  ``data=-1`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % seq == 0, f"{n} devices not divisible by seq={seq}"
        data = n // seq
    assert data * seq <= n, f"mesh {data}x{seq} exceeds {n} devices"
    dev_array = mesh_utils.create_device_mesh(
        (data, seq), devices=devices[: data * seq]
    )
    return Mesh(dev_array, axis_names=("data", "seq"))


def batch_sharding(mesh: Mesh, seq_axis: int | None = None) -> NamedSharding:
    """Sharding for a batch tensor: batch dim over 'data', optionally a time
    dim over 'seq'."""
    if seq_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = ["data"] + [None] * (seq_axis - 1) + ["seq"]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, seq_dims: dict[int, int] | None = None) -> Any:
    """Place every array of a batch pytree with its batch dim over 'data'.

    ``seq_dims`` optionally maps "array rank -> time axis" to additionally
    shard that axis over 'seq' (context parallelism): e.g. ``{3: 1, 4: 1}``
    shards mel (B, T90, M) and motion (B, T30, J, C) over time while leaving
    rank-1 arrays like m_lens data-sharded only.

    Single-process: a plain sharded device_put of the global batch.
    Multi-process (multi-slice/DCN): each host passes its LOCAL shard (from
    ``BatchIterator(host_shard=True)``) and the global array is assembled
    with `jax.make_array_from_process_local_data` — no host ever
    materializes the full global batch (SURVEY.md §2.3 DDP equivalent).
    """
    seq_dims = seq_dims or {}
    multiprocess = jax.process_count() > 1

    def place(x):
        axis = seq_dims.get(np.ndim(x))
        sh = batch_sharding(mesh, seq_axis=axis)
        if multiprocess:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Round the leading dim up by repeating head samples — the TPU analogue
    of the reference sampler's `round_up` duplication
    (`datasets/dataloader.py:30-49`).  Returns (padded, original_len)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    reps = np.concatenate([x] * (-(-rem // n)), axis=0)[:rem]  # rem may exceed n
    return np.concatenate([x, reps], axis=0), n
