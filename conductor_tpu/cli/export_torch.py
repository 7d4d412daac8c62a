"""Convert conductor-tpu checkpoints back into reference PyTorch formats.

    # stage 1: orbax ckpt (from cli/train_m2snet.py) -> M2SNet_*.pt
    python -m conductor_tpu.cli.export_torch m2snet \
        --run_dir checkpoints/M2SNet/M2SNet_hard --output M2SNet_export.pt

    # stage 2: run dir (from cli/train.py or cli/import_torch.py) ->
    # latest.tar the reference's DDPMTrainer.load / eval tools accept
    python -m conductor_tpu.cli.export_torch diffusion \
        --run_dir checkpoints/ConductorMotion100/my_run --output latest.tar

The inverse of `cli/import_torch.py`: models trained on TPU stay consumable
by the reference ecosystem (`Contrastive_Stage/M2SGAN_eval.py:48-53` strict
state-dict loads; `Diffusion_Stage/trainers/ddpm_trainer.py:303-319` tar
loads).  Round-trip identity is pinned in `tests/test_torch_export.py`.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from ..config import Config
from ..interop.torch_export import (
    export_m2snet,
    export_motion_transformer,
    save_diffusion_tar,
    save_torch_state_dict,
)
from ..train.checkpoints import restore_raw


def _host_tree(tree):
    return jax.tree.map(lambda x: jax.device_get(jnp.asarray(x)), tree)


def export_m2snet_cmd(args) -> None:
    # template-free restore: works for both M2SNetTrainer saves (with
    # opt_state) and cli/import_torch.py products (without)
    raw = restore_raw(os.path.join(args.run_dir, "ckpt"))
    sd = export_m2snet(_host_tree(
        {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    ))
    save_torch_state_dict(args.output, sd)
    print(f"exported M2SNet (step {int(raw['step'])}) -> {args.output} "
          f"({len(sd)} tensors)")


def export_diffusion_cmd(args) -> None:
    cfg = Config.load(os.path.join(args.run_dir, "config.json"))
    raw = restore_raw(os.path.join(args.run_dir, "ckpt"))
    sd = export_motion_transformer(_host_tree(
        {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    ))
    step = int(raw["step"])
    meta_path = os.path.join(args.run_dir, "import_meta.json")
    ep = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            ep = int(json.load(f).get("ep", 0))
    save_diffusion_tar(args.output, sd, ep=ep, total_it=step, lr=cfg.train.lr)
    print(f"exported MotionTransformer (it={step}) -> {args.output} "
          f"({len(sd)} tensors)")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="kind", required=True)

    pm = sub.add_parser("m2snet", help="orbax M2SNet ckpt -> .pt state dict")
    pm.add_argument("--run_dir", required=True,
                    help="stage-1 run dir containing ckpt/")
    pm.add_argument("--output", required=True)
    pm.set_defaults(fn=export_m2snet_cmd)

    pd = sub.add_parser("diffusion", help="stage-2 run dir -> latest.tar")
    pd.add_argument("--run_dir", required=True,
                    help="run dir containing config.json + ckpt/")
    pd.add_argument("--output", required=True)
    pd.set_defaults(fn=export_diffusion_cmd)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
