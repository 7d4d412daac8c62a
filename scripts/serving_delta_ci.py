"""Serving-vs-exact quality delta with a real 95 % CI.

The serving fast path (fused whole-layer kernels + bf16 MXU + int8 AdaLN —
the configuration `bench.py` measures) must stay within the north-star
quality tolerance of the exact flax/f32 path (BASELINE.json: "FGD/BC within
1 %").  A single small sample cannot attest that: beat consistency on 6
clips moves by ±2 % on generation-seed noise alone (r3 VERDICT weak #3).
This sweep runs N generation seeds over a dedicated wide split through the
real eval CLI twice per seed — exact, then serving — on the SAME
checkpoint, and reports each metric's percentage delta as mean ± 95 % CI.

Runs on whatever backend jax is pointed at; on the real TPU the serving
path exercises actual bf16/int8 hardware numerics (off-TPU it goes through
the kernels' interpret mode).  The artifact records the device.

    python scripts/serving_delta_ci.py \
        --run_dir /tmp/e2e_demo/checkpoints/ConductorMotion100/e2e_demo \
        --data_root /tmp/e2e_demo/cm100_synth --seeds 10 --clips 24 \
        --out docs/e2e_run/serving_quality.json \
        --run_meta docs/e2e_run/run_meta.json

`scripts/run_e2e_demo.py` calls `sweep()` for its serving-quality section,
so the committed artifact and this standalone entry point share one
implementation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

METRICS = {
    "fgd_delta": "fgd",
    "bc_delta": "beat_consistency_generated",
    "mse_delta": "mse",
}


def _delta_ci(deltas_pct: list[float]) -> dict:
    ds = np.asarray(deltas_pct)
    return {
        "per_seed_pct": [round(float(d), 3) for d in ds],
        "mean_pct": round(float(ds.mean()), 3),
        "abs_mean_pct": round(float(np.abs(ds).mean()), 3),
        "ci95_pct": round(float(1.96 * ds.std() / np.sqrt(len(ds))), 3),
    }


def sweep(
    run_dir: str,
    data_root: str,
    *,
    split: str = "serving_ci",
    clips: int = 24,
    seeds: int = 10,
    steps: int = 50,
    split_seed: int = 2,
    reuse: bool = False,
) -> dict:
    """Exact-vs-serving eval over ``seeds`` generation seeds on ``split``
    (generated if absent); returns the serving_quality dict."""
    import jax

    from conductor_tpu.cli.evaluate import main as eval_main
    from conductor_tpu.data.dataset import make_synthetic_dataset

    if not os.path.isdir(os.path.join(data_root, split)):
        make_synthetic_dataset(
            data_root, split, num_clips=clips, seed=split_seed, correlated=True
        )

    reps = []
    for seed in range(seeds):
        pair = {}
        for kind, extra in (
            ("exact", []),
            ("serving", ["--layer_impl", "pallas_fused",
                         "--compute_dtype", "bfloat16", "--adaln_int8"]),
        ):
            sfx = f"_{kind}_s{seed}"
            out_json = os.path.join(run_dir, f"eval_{split}{sfx}.json")
            if not (reuse and os.path.exists(out_json)):
                # each per-seed eval is deterministic in (checkpoint, split,
                # seed, impl), so --reuse makes an interrupted sweep resume
                eval_main([
                    "--run_dir", run_dir, "--data_root", data_root,
                    "--split", split, "--steps", str(steps),
                    "--batch_size", str(clips), "--seed", str(seed),
                    "--out_suffix", sfx, *extra,
                ])
            with open(out_json) as f:
                pair[kind] = json.load(f)
        reps.append(pair)
        print(f"[serving_delta_ci] seed {seed}: " + "  ".join(
            f"{k} {100.0 * (pair['serving'][m] - pair['exact'][m]) / max(abs(pair['exact'][m]), 1e-9):+.3f}%"
            for k, m in METRICS.items()
        ))

    out = {
        "n_seeds": seeds,
        "clips_per_seed": clips,
        "split": split,
        "ddim_steps": steps,
        "device": str(jax.devices()[0]),
    }
    for key, metric in METRICS.items():
        out[key] = _delta_ci([
            100.0 * (r["serving"][metric] - r["exact"][metric])
            / max(abs(r["exact"][metric]), 1e-9)
            for r in reps
        ])
    return out


def update_run_meta(run_meta_path: str, quality: dict) -> None:
    with open(run_meta_path) as f:
        meta = json.load(f)
    meta["serving_fgd_delta_pct"] = quality["fgd_delta"]["mean_pct"]
    meta["serving_fgd_delta_ci95_pct"] = quality["fgd_delta"]["ci95_pct"]
    meta["serving_bc_delta_pct"] = quality["bc_delta"]["mean_pct"]
    meta["serving_bc_delta_ci95_pct"] = quality["bc_delta"]["ci95_pct"]
    meta["serving_ci_provenance"] = (
        f"{quality['n_seeds']} seeds x {quality['clips_per_seed']} clips "
        f"({quality['split']} split) on {quality['device']} "
        "(scripts/serving_delta_ci.py)"
    )
    with open(run_meta_path, "w") as f:
        json.dump(meta, f, indent=2)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--split", default="serving_ci")
    p.add_argument("--clips", type=int, default=24)
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default=None)
    p.add_argument("--run_meta", default=None,
                   help="run_meta.json whose serving_* keys to refresh")
    p.add_argument("--reuse", action="store_true",
                   help="reuse existing per-seed eval_<split>_*.json files "
                        "(resume an interrupted sweep)")
    args = p.parse_args()

    quality = sweep(
        args.run_dir, args.data_root, split=args.split,
        clips=args.clips, seeds=args.seeds, steps=args.steps,
        reuse=args.reuse,
    )
    print(json.dumps(quality, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(quality, f, indent=2)
    if args.run_meta:
        update_run_meta(args.run_meta, quality)


if __name__ == "__main__":
    main()
