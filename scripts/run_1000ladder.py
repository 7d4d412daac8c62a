"""Quality-vs-respacing on a REAL 1000-step ladder (r3 VERDICT weak #4).

The e2e demo's quality_vs_steps sweep respaces a 50-step demo ladder and
argues to the production claim ("ddim50 of 1000") by respacing-ratio
analogy.  This script measures the claim directly: train the SAME tiny demo
model with `--diffusion_steps 1000` (training cost per step is identical —
the trainer samples one t per example either way, reference trains 1000
always, `gaussian_diffusion.py:943`), then sweep ddim{50,100,250,1000}
through the real eval CLI.

    python scripts/run_1000ladder.py [--out docs/e2e_run] [--work /tmp/e2e_demo]

Training runs on CPU (tiny model); the sweep runs on whatever backend the
eval subprocess picks (the TPU when tunneled).  Reuses the e2e demo's
synthetic dataset if present.  Writes <out>/quality_vs_steps_1000.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def run_cpu(mod: str, argv: list[str]) -> None:
    """Run a conductor_tpu CLI in a CPU-pinned subprocess (the image's
    sitecustomize force-selects the axon TPU backend; env vars are ignored,
    so the pin must happen via jax.config after import)."""
    code = (
        "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_compilation_cache_dir', '/tmp/conductor_tpu_jax_cache'); "
        f"from {mod} import main; main(sys.argv[1:])"
    )
    subprocess.run([sys.executable, "-c", code, *argv], check=True, cwd=REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="docs/e2e_run")
    ap.add_argument("--work", default="/tmp/e2e_demo")
    ap.add_argument("--train_clips", type=int, default=24)
    ap.add_argument("--test_clips", type=int, default=6)
    ap.add_argument("--stage2_epochs", type=int, default=30)
    ap.add_argument("--eval_on_cpu", action="store_true",
                    help="pin the eval sweep to CPU too")
    args = ap.parse_args()
    t0 = time.time()

    os.makedirs(args.out, exist_ok=True)
    data_root = os.path.join(args.work, "cm100_synth")
    if not os.path.isdir(os.path.join(data_root, "train")):
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from conductor_tpu.data.dataset import make_synthetic_dataset as m; "
            f"m({data_root!r}, 'train', num_clips={args.train_clips}, correlated=True); "
            f"m({data_root!r}, 'test', num_clips={args.test_clips}, seed=1, correlated=True)"
        )
        subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)
    print(f"[1/3] dataset at {data_root}")

    ckpts = os.path.join(args.work, "checkpoints_1000")
    run_dir = os.path.join(ckpts, "ConductorMotion100", "ladder1000")
    if not os.path.isdir(os.path.join(run_dir, "ckpt")):
        run_cpu("conductor_tpu.cli.train", [
            "--data_root", data_root, "--name", "ladder1000",
            "--checkpoints_dir", ckpts,
            "--batch_size", "8", "--epochs", str(args.stage2_epochs),
            "--diffusion_steps", "1000", "--schedule", "cosine",
            "--sample_length", "10", "--latent_dim", "64", "--ff_size", "32",
            "--num_layers", "4", "--num_heads", "4", "--save_latest", "50",
        ])
    print(f"[2/3] trained 1000-step ladder -> {run_dir}")

    ladder = {}
    for steps in (50, 100, 250, 1000):
        argv = [
            "--run_dir", run_dir, "--data_root", data_root,
            "--steps", str(steps), "--batch_size", str(args.test_clips),
            "--out_suffix", f"_ladder{steps}",
        ]
        if args.eval_on_cpu:
            run_cpu("conductor_tpu.cli.evaluate", argv)
        else:
            subprocess.run(
                [sys.executable, "-m", "conductor_tpu.cli.evaluate", *argv],
                check=True, cwd=REPO,
            )
        with open(os.path.join(run_dir, f"eval_test_ladder{steps}.json")) as f:
            rep = json.load(f)
        ladder[str(steps)] = {
            k: rep[k]
            for k in ("fgd", "diversity", "mse",
                      "beat_consistency_generated", "beat_consistency_real")
            if k in rep
        }
        print(f"  ddim{steps}: fgd={ladder[str(steps)]['fgd']:.3f} "
              f"bc={ladder[str(steps)]['beat_consistency_generated']:.4f}")

    payload = {
        "ladder_steps": 1000,
        "model": "e2e demo config (latent 64, 4 layers), 1000-step cosine ladder",
        "sweep": ladder,
        "wall_clock_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.out, "quality_vs_steps_1000.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(f"[3/3] wrote {args.out}/quality_vs_steps_1000.json "
          f"({payload['wall_clock_s']} s)")


if __name__ == "__main__":
    main()
