"""Evaluation CLI: FGD / Diversity / Beat Consistency / MSE / SE / MPE / SDP.

Rebuild of reference `Diffusion_Stage/tools/eval_new_metrics.py:342-390` and
the old-metric sweeps (`eval_old_metrics.py`, `eval_new.py`), with batched
on-device generation (the reference generates one clip at a time).

    python -m conductor_tpu.cli.evaluate --run_dir checkpoints/ConductorMotion100/my_run \
        --data_root /data/cm100 [--steps 50] [--max_clips 100]
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from ..config import Config
from ..eval import DiffusionEvaluator
from ..train import CheckpointManager, DDPMTrainer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (reference --which_epoch); "
                   "default: latest")
    p.add_argument("--data_root", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--steps", type=int, default=None, help="DDIM respacing (default: full ladder)")
    p.add_argument(
        "--batch_size", type=int, default=None,
        help="clips per generation wave (default: 8 per device under the "
        "mesh — the measured serving sweet spot; 8 total single-device)",
    )
    p.add_argument("--max_clips", type=int, default=None)
    p.add_argument("--no_beats", action="store_true", help="skip beat-consistency (slow, host-side)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--single_device", action="store_true",
                   help="disable mesh-sharded generation (default: shard "
                        "waves across all devices)")
    # Sampler-implementation overrides (default: whatever the run's
    # config.json trained with).  These change HOW generation runs, not the
    # model — used to score serving fast paths (bf16 MXU, fused kernels,
    # int8 AdaLN) against the exact path on the same checkpoint.
    p.add_argument("--layer_impl", default=None,
                   choices=["flax", "pallas_fused"])
    p.add_argument("--compute_dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--adaln_int8", action="store_true",
                   help="int8 MXU path for the AdaLN projection "
                        "(requires --layer_impl pallas_fused)")
    p.add_argument("--out_suffix", default="",
                   help="suffix for the eval_<split><suffix>.json artifact")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    cfg = Config.load(os.path.join(args.run_dir, "config.json"))
    overrides = {}
    if args.layer_impl:
        overrides["layer_impl"] = args.layer_impl
    if args.compute_dtype:
        overrides["compute_dtype"] = args.compute_dtype
    if args.adaln_int8:
        overrides["sampler_adaln_int8"] = True
    if overrides:
        import dataclasses

        cfg = cfg.replace(denoiser=dataclasses.replace(cfg.denoiser, **overrides))
    # legacy run dirs may carry "auto" knobs — resolve for this backend so
    # the guard below (and the trainer) see concrete impls
    from ..config import resolve_auto

    cfg = resolve_auto(cfg)
    if args.adaln_int8 and cfg.denoiser.layer_impl != "pallas_fused":
        # the flax sampling branch never reads sampler_adaln_int8; without
        # this guard the "int8" artifact would silently come from the exact
        # path and show a false 0% quantization cost
        raise SystemExit(
            "--adaln_int8 requires the fused sampling path: pass "
            "--layer_impl pallas_fused (run config has "
            f"layer_impl={cfg.denoiser.layer_impl!r})"
        )
    trainer = DDPMTrainer(cfg)
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng)
    state = CheckpointManager(os.path.join(args.run_dir, "ckpt")).restore(
        state, step=args.step
    )

    mesh = None
    if not args.single_device and len(jax.devices()) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(data=len(jax.devices()))
        print(f"evaluating on a {len(jax.devices())}-device mesh")
    evaluator = DiffusionEvaluator(trainer, batch_size=args.batch_size, mesh=mesh)
    result = evaluator.evaluate(
        state, args.data_root, split=args.split, num_steps=args.steps,
        max_clips=args.max_clips, rng=rng, compute_beats=not args.no_beats,
    )
    report = result.as_dict()
    print(json.dumps(report, indent=2))
    out = os.path.join(args.run_dir, f"eval_{args.split}{args.out_suffix}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
