"""Generate golden cross-framework parity fixtures from the reference
PyTorch models (run manually; requires torch + the reference checkout).

    python tests/fixtures/make_torch_fixtures.py [--reference /root/reference]

Weights are NOT committed: the fixture stores the state-dict manifest
(key -> shape) and torch activations computed on weights synthesized by
`conductor_tpu.interop.synth.synth_state_dict` — the test re-synthesizes
identical weights from the manifest and compares flax outputs against the
recorded torch outputs.  See synth.py for the determinism contract.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from conductor_tpu.interop.synth import manifest_to_json, synth_state_dict  # noqa: E402

SEED_WEIGHTS = 0
SEED_INPUTS = 123
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def _to_torch(sd):
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}


def make_m2snet(reference: str):
    import torch

    sys.path.insert(0, os.path.join(reference, "Contrastive_Stage"))
    from models.M2SNet import M2SNet  # type: ignore

    model = M2SNet()
    manifest = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    sd = synth_state_dict(manifest, SEED_WEIGHTS)
    model.load_state_dict(_to_torch(sd), strict=True)
    model.eval()

    rng = np.random.RandomState(SEED_INPUTS)
    mel = rng.uniform(0, 1, size=(2, 180, 128)).astype(np.float32)
    motion = rng.uniform(0, 1, size=(2, 60, 13, 2)).astype(np.float32)
    with torch.no_grad():
        hx = model.music_encoder(torch.from_numpy(mel))
        hy = model.motion_encoder(torch.from_numpy(motion))
        out = model(torch.from_numpy(mel), torch.from_numpy(motion))

    # the true reference adjacency, to pin build_adjacency against
    ref_A = model.motion_encoder.st_gcn.A.numpy()

    np.savez_compressed(
        os.path.join(OUT_DIR, "torch_m2snet.npz"),
        manifest=np.frombuffer(manifest_to_json(manifest).encode(), np.uint8),
        mel=mel,
        motion=motion,
        hx=hx.numpy(),
        hy=hy.numpy(),
        out=out.numpy(),
        ref_adjacency=ref_A,
    )
    print("torch_m2snet.npz:", hx.shape, hy.shape, out.shape)


def make_transformer(reference: str):
    import torch

    # purge the Contrastive_Stage 'models' package so the Diffusion_Stage one
    # resolves fresh
    for mod in [m for m in sys.modules if m == "models" or m.startswith("models.")]:
        del sys.modules[mod]
    sys.path.insert(0, os.path.join(reference, "Diffusion_Stage"))
    from models.transformer import MotionTransformer  # type: ignore

    # latent_dim must be 128: the reference hard-codes Linear(64, 512) for the
    # music projection and adds it to the 4*latent-wide time embedding
    # (`transformer.py:404,482`), which only broadcasts at latent 128.
    model = MotionTransformer(
        input_feats=26, num_frames=30, latent_dim=128, ff_size=64,
        num_layers=2, num_heads=8, dropout=0, no_eff=False,
        music_model_path=None, device="cpu",
    )
    manifest = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    sd = synth_state_dict(manifest, SEED_WEIGHTS)
    model.load_state_dict(_to_torch(sd), strict=True)
    model.eval()

    rng = np.random.RandomState(SEED_INPUTS)
    mel = rng.uniform(0, 1, size=(2, 90, 128)).astype(np.float32)
    x = rng.normal(0, 1, size=(2, 30, 26)).astype(np.float32)
    t = np.array([7, 341], np.int64)

    with torch.no_grad():
        xf_proj, xf_out = model.encode_music(torch.from_numpy(mel), "cpu")
        out_full = model(
            torch.from_numpy(x), torch.from_numpy(t), length=[30, 30],
            text=torch.from_numpy(mel),
        )
        out_masked = model(
            torch.from_numpy(x), torch.from_numpy(t), length=[30, 10],
            text=torch.from_numpy(mel),
        )

    # no_eff (quadratic attention) variant: same state-dict key names, so
    # the same synthesized weights load; full-length mask (where the
    # reference's query-side mask quirk is a no-op, see
    # ops/linear_attention.py) -> outputs must coincide with our fixed
    # key-side mask formulation
    model_q = MotionTransformer(
        input_feats=26, num_frames=30, latent_dim=128, ff_size=64,
        num_layers=2, num_heads=8, dropout=0, no_eff=True,
        music_model_path=None, device="cpu",
    )
    model_q.load_state_dict(_to_torch(sd), strict=True)
    model_q.eval()
    with torch.no_grad():
        out_quad = model_q(
            torch.from_numpy(x), torch.from_numpy(t), length=[30, 30],
            text=torch.from_numpy(mel),
        )

    np.savez_compressed(
        os.path.join(OUT_DIR, "torch_transformer.npz"),
        manifest=np.frombuffer(manifest_to_json(manifest).encode(), np.uint8),
        out_quad=out_quad.numpy(),
        mel=mel,
        x=x,
        t=t.astype(np.int32),
        xf_proj=xf_proj.numpy(),
        xf_out=xf_out.numpy(),
        out_full=out_full.numpy(),
        out_masked=out_masked.numpy(),
        masked_lengths=np.array([30, 10], np.int32),
    )
    print("torch_transformer.npz:", xf_proj.shape, out_full.shape)


def make_ddim_trajectory(reference: str):
    """Record the reference's FULL DDIM sampling chain — float64 schedule
    tables, posterior coefficients, per-step update (`gaussian_diffusion.py:
    328-379,783-965`) — on the synthesized tiny transformer: 50 linear steps
    (the scaled-linear schedule is invalid below ~20 steps: beta_end > 1),
    per-step x_t recorded.  Pins the whole sampler chain, not just the
    per-call denoiser parity of torch_transformer.npz."""
    import torch

    for mod in [m for m in sys.modules if m == "models" or m.startswith("models.")]:
        del sys.modules[mod]
    sys.path.insert(0, os.path.join(reference, "Diffusion_Stage"))
    from models.gaussian_diffusion import (  # type: ignore
        GaussianDiffusion, LossType, ModelMeanType, ModelVarType,
        get_named_beta_schedule,
    )
    from models.transformer import MotionTransformer  # type: ignore

    model = MotionTransformer(
        input_feats=26, num_frames=30, latent_dim=128, ff_size=64,
        num_layers=2, num_heads=8, dropout=0, no_eff=False,
        music_model_path=None, device="cpu",
    )
    manifest = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    sd = synth_state_dict(manifest, SEED_WEIGHTS)
    model.load_state_dict(_to_torch(sd), strict=True)
    model.eval()

    steps = 50
    diffusion = GaussianDiffusion(
        betas=get_named_beta_schedule("linear", steps),
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )

    rng = np.random.RandomState(SEED_INPUTS)
    mel = rng.uniform(0, 1, size=(2, 90, 128)).astype(np.float32)
    noise = rng.normal(0, 1, size=(2, 30, 26)).astype(np.float32)
    with torch.no_grad():
        xf_proj, xf_out = model.encode_music(torch.from_numpy(mel), "cpu")
        traj = []
        for out in diffusion.ddim_sample_loop_progressive(
            model, noise.shape, noise=torch.from_numpy(noise),
            clip_denoised=False,  # the trainer's setting (ddpm_trainer.py:173)
            model_kwargs={
                "xf_proj": xf_proj, "xf_out": xf_out,
                "length": torch.LongTensor([30, 30]),
            },
        ):
            traj.append(out["sample"].numpy())
    trajectory = np.stack(traj)  # (steps, 2, 30, 26), t = steps-1 .. 0

    np.savez_compressed(
        os.path.join(OUT_DIR, "torch_ddim_trajectory.npz"),
        manifest=np.frombuffer(manifest_to_json(manifest).encode(), np.uint8),
        mel=mel,
        noise=noise,
        steps=np.int32(steps),
        trajectory=trajectory,
    )
    print("torch_ddim_trajectory.npz:", trajectory.shape)


def make_m2sgan(reference: str):
    import torch

    for mod in [m for m in sys.modules if m == "models" or m.startswith("models.")]:
        del sys.modules[mod]
    # Diffusion_Stage/models is a REGULAR package (has __init__) and beats
    # Contrastive_Stage's namespace package regardless of path order — drop it
    sys.path[:] = [p for p in sys.path if "Diffusion_Stage" not in p]
    sys.path.insert(0, os.path.join(reference, "Contrastive_Stage"))
    from models.Discriminator import Discriminator_1DCNN  # type: ignore
    from models.Generator import Generator  # type: ignore

    g, d = Generator(), Discriminator_1DCNN()
    g_manifest = {k: tuple(v.shape) for k, v in g.state_dict().items()}
    d_manifest = {k: tuple(v.shape) for k, v in d.state_dict().items()}
    g.load_state_dict(_to_torch(synth_state_dict(g_manifest, SEED_WEIGHTS)), strict=True)
    d.load_state_dict(_to_torch(synth_state_dict(d_manifest, SEED_WEIGHTS + 1)), strict=True)
    g.eval(); d.eval()

    rng = np.random.RandomState(SEED_INPUTS)
    # 10 s: the TCN's dilation-32 reflect pads need T30 > 128 frames
    mel = rng.uniform(0, 1, size=(2, 900, 128)).astype(np.float32)
    noise = rng.normal(0, 1, size=(2, 10, 8)).astype(np.float32)
    motion = rng.uniform(0, 1, size=(2, 300, 13, 2)).astype(np.float32)
    with torch.no_grad():
        fake = g(torch.from_numpy(mel), torch.from_numpy(noise))
        hidden = g.features(torch.from_numpy(mel), torch.from_numpy(noise))
        score = d(torch.from_numpy(motion))

    np.savez_compressed(
        os.path.join(OUT_DIR, "torch_m2sgan.npz"),
        g_manifest=np.frombuffer(manifest_to_json(g_manifest).encode(), np.uint8),
        d_manifest=np.frombuffer(manifest_to_json(d_manifest).encode(), np.uint8),
        mel=mel, noise=noise, motion=motion,
        fake=fake.numpy(), hidden=hidden.numpy(), score=score.numpy(),
    )
    print("torch_m2sgan.npz:", fake.shape, hidden.shape, score.shape)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    make_m2snet(args.reference)
    make_transformer(args.reference)
    make_ddim_trajectory(args.reference)
    make_m2sgan(args.reference)
