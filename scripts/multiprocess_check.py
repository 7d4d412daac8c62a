"""Two-process loss-parity check for the multi-host (DCN) assembly path.

The one branch of the distributed layer a single-process CPU mesh cannot
reach is `shard_batch`'s multi-process assembly
(`jax.make_array_from_process_local_data`, `conductor_tpu/parallel/mesh.py`)
fed by `BatchIterator(host_shard=True)` — the rebuild's equivalent of the
reference's multi-process DDP + rank-strided `DistributedSampler`
(`Diffusion_Stage/datasets/dataloader.py:16-53`, `tools/train.py:64-69`).

This script runs ONE stage-2 train step three ways on localhost CPUs and
asserts the losses agree:

  - single process, 4 virtual devices (the baseline every pytest shard-parity
    test already covers);
  - 2 processes x 2 virtual devices each, coordinated via
    `jax.distributed.initialize`: each process loads only its
    `BatchIterator(host_shard=True)` row-slice and the global batch is
    assembled across processes.

Usage (parent orchestrates everything):

    python scripts/multiprocess_check.py

Exits 0 on parity; used by `tests/test_multiprocess.py` (slow tier).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))
GLOBAL_BATCH = 4
LOCAL_DEVICES = 2  # per process in the 2-process run


def run_step(data_root: str, *, host_shard: bool) -> dict:
    """One jitted train step on the ('data',) mesh over ALL global devices;
    returns {loss, grad_norm, process_index}."""
    import jax

    sys.path.insert(0, REPO)
    from conductor_tpu.config import Config, DenoiserConfig, DiffusionConfig, TrainConfig
    from conductor_tpu.data import BatchIterator, ConductorMotionDataset
    from conductor_tpu.parallel import make_mesh, replicate, shard_batch
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = Config(
        denoiser=DenoiserConfig(
            num_frames=300, latent_dim=32, ff_size=16, num_layers=2, num_heads=4
        ),
        diffusion=DiffusionConfig(steps=8, schedule="cosine"),
        train=TrainConfig(batch_size=GLOBAL_BATCH, sample_length=10),
    )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng)

    ds = ConductorMotionDataset(
        data_root, "train", sample_length=10, mode="sequential"
    )
    loader = BatchIterator(
        ds, GLOBAL_BATCH, shuffle=False, host_shard=host_shard
    )
    batch = next(iter(loader))

    mesh = make_mesh(data=jax.device_count())
    with mesh:
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        _, metrics = trainer.train_step(state, sharded, rng)
        out = {
            "loss": float(metrics["loss"]),
            "grad_norm": float(metrics["grad_norm"]),
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "devices": jax.device_count(),
        }
    return out


def child_main(args) -> None:
    import jax

    # force CPU before any backend/distributed init: the image's TPU plugin
    # would otherwise have both processes fight over one tunneled chip
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    out = run_step(args.data_root, host_shard=args.num_processes > 1)
    print("RESULT " + json.dumps(out), flush=True)


def parent_main() -> int:
    import numpy as np

    sys.path.insert(0, REPO)
    from conductor_tpu.data import make_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="conductor_mp_")
    root = os.path.join(tmp, "cm100")
    make_synthetic_dataset(root, "train", num_clips=GLOBAL_BATCH)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    def spawn(num_processes, process_id, local_devices):
        return subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__), "--child",
                "--data_root", root, "--coordinator", coord,
                "--num_processes", str(num_processes),
                "--process_id", str(process_id),
                "--local_devices", str(local_devices),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )

    def collect(proc, tag):
        out, _ = proc.communicate(timeout=900)
        results = [
            json.loads(line[len("RESULT "):])
            for line in out.splitlines()
            if line.startswith("RESULT ")
        ]
        if proc.returncode != 0 or not results:
            print(f"--- {tag} output ---\n{out}")
            raise SystemExit(f"{tag} failed (rc={proc.returncode})")
        return results[0]

    # single-process baseline (4 devices), then the 2x2 distributed run
    single = collect(spawn(1, 0, GLOBAL_BATCH), "single-process")
    procs = [spawn(2, i, LOCAL_DEVICES) for i in range(2)]
    dist = [collect(p, f"process {i}") for i, p in enumerate(procs)]

    print("single :", single)
    for r in dist:
        print(f"proc {r['process_index']}:", r)
    assert dist[0]["process_count"] == 2 and dist[0]["devices"] == 4
    for key in ("loss", "grad_norm"):
        got = [r[key] for r in dist]
        np.testing.assert_allclose(got[0], got[1], rtol=1e-6, err_msg=key)
        np.testing.assert_allclose(
            got[0], single[key], rtol=1e-5, err_msg=key
        )
    print("multiprocess parity ok")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--data_root")
    ap.add_argument("--coordinator")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--local_devices", type=int, default=LOCAL_DEVICES)
    args = ap.parse_args()
    if args.child:
        child_main(args)
        return 0
    return parent_main()


if __name__ == "__main__":
    raise SystemExit(main())
