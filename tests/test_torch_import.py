"""Cross-framework golden parity: reference PyTorch weights -> flax.

The fixtures (tests/fixtures/torch_*.npz, built by make_torch_fixtures.py
against the real reference models) carry the torch state-dict manifest and
torch activations on deterministically synthesized weights; here we
re-synthesize the identical weights, run them through
`conductor_tpu.interop` and the flax models, and pin the outputs.  This is
the numeric half of the north star: a published reference checkpoint loads
into this framework and produces the same activations.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conductor_tpu.interop import (
    import_m2snet,
    import_motion_transformer,
    music_encoder_from_m2snet,
)
from conductor_tpu.interop.synth import manifest_from_json, synth_state_dict
from conductor_tpu.interop.torch_import import assert_matches_template
from conductor_tpu.models import MotionTransformer, generate_src_mask
from conductor_tpu.models.graph import build_adjacency
from conductor_tpu.models.m2snet import M2SNet
from conductor_tpu.models.music_encoder import MusicEncoder

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    fx = np.load(os.path.join(FIXTURES, name))
    manifest = manifest_from_json(bytes(fx["manifest"]).decode())
    return fx, synth_state_dict(manifest, seed=0)


@pytest.fixture(scope="module")
def m2snet_fixture():
    return _load("torch_m2snet.npz")


@pytest.fixture(scope="module")
def transformer_fixture():
    return _load("torch_transformer.npz")


def test_adjacency_matches_reference(m2snet_fixture):
    """build_adjacency reproduces the reference Graph.A buffer exactly."""
    fx, _ = m2snet_fixture
    ours = build_adjacency("ConductorMotionX", "uniform")
    np.testing.assert_allclose(ours, fx["ref_adjacency"], atol=1e-6)


def test_m2snet_import_structure(m2snet_fixture):
    _, sd = m2snet_fixture
    variables = import_m2snet(sd)
    model = M2SNet()
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 90, 128)),
        jnp.zeros((1, 30, 13, 2)),
    )
    assert_matches_template(variables, template)


def test_m2snet_activation_parity(m2snet_fixture):
    """Music latents, motion latents, and sync probs match torch to ~1e-4."""
    fx, sd = m2snet_fixture
    variables = jax.tree.map(jnp.asarray, import_m2snet(sd))
    model = M2SNet()
    mel, motion = jnp.asarray(fx["mel"]), jnp.asarray(fx["motion"])

    hx, hy = model.apply(variables, mel, motion, method=model.encode)
    np.testing.assert_allclose(np.asarray(hx), fx["hx"], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(hy), fx["hy"], atol=2e-4, rtol=1e-3)

    out = model.apply(variables, mel, motion)
    np.testing.assert_allclose(np.asarray(out), fx["out"], atol=1e-5, rtol=1e-4)


def test_music_encoder_graft_parity(m2snet_fixture):
    """The stage-2 contract: module.music_encoder.* grafts standalone
    (`transformer.py:394-401`) and reproduces the same latents."""
    fx, sd = m2snet_fixture
    wrapped = {f"module.{k}": v for k, v in sd.items()}  # DataParallel form
    variables = jax.tree.map(jnp.asarray, music_encoder_from_m2snet(wrapped))
    enc = MusicEncoder()
    hx = enc.apply(variables, jnp.asarray(fx["mel"]))
    np.testing.assert_allclose(np.asarray(hx), fx["hx"], atol=2e-4, rtol=1e-3)


def _make_flax_transformer():
    return MotionTransformer(
        input_feats=26, num_frames=30, latent_dim=128, ff_size=64,
        num_layers=2, num_heads=8, dropout=0.0, efficient=True,
    )


def test_transformer_import_structure(transformer_fixture):
    _, sd = transformer_fixture
    variables = import_motion_transformer(sd)
    model = _make_flax_transformer()
    template = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 90, 128)),
        jnp.zeros((1, 30, 26)),
        jnp.zeros((1,), jnp.int32),
        method=model.init_with_music,
    )
    assert_matches_template(variables, template)


def test_transformer_activation_parity(transformer_fixture):
    """Denoiser outputs match torch end-to-end (music encoding + 2 decoder
    layers + AdaLN packing), full and partial src_mask."""
    fx, sd = transformer_fixture
    variables = jax.tree.map(jnp.asarray, import_motion_transformer(sd))
    model = _make_flax_transformer()

    mel = jnp.asarray(fx["mel"])
    x = jnp.asarray(fx["x"])
    t = jnp.asarray(fx["t"])

    xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)
    np.testing.assert_allclose(
        np.asarray(xf_proj), fx["xf_proj"], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(xf_out), fx["xf_out"], atol=2e-4, rtol=1e-3
    )

    out = model.apply(variables, x, t, xf_proj, xf_out)
    np.testing.assert_allclose(
        np.asarray(out), fx["out_full"], atol=5e-4, rtol=1e-3
    )

    mask = generate_src_mask(30, jnp.asarray(fx["masked_lengths"]))
    out_m = model.apply(variables, x, t, xf_proj, xf_out, mask)
    np.testing.assert_allclose(
        np.asarray(out_m), fx["out_masked"], atol=5e-4, rtol=1e-3
    )


def test_ddim_trajectory_parity():
    """The FULL sampling chain — float64 schedule tables, posterior
    coefficients, 50 DDIM updates (`gaussian_diffusion.py:328-379,783-965`)
    — against a recorded torch trajectory on the same synthesized weights
    and the same initial noise.  Closes the last numeric-parity link: model
    parity (above) x sampler-chain parity = end-to-end generation parity."""
    from conductor_tpu.diffusion.sampling import ddim_sample_loop
    from conductor_tpu.diffusion.schedule import make_schedule

    fx, sd = _load("torch_ddim_trajectory.npz")
    variables = jax.tree.map(jnp.asarray, import_motion_transformer(sd))
    model = MotionTransformer(
        input_feats=26, num_frames=30, latent_dim=128, ff_size=64,
        num_layers=2, num_heads=8, dropout=0.0, efficient=True,
    )
    mel = jnp.asarray(fx["mel"])
    noise = jnp.asarray(fx["noise"])
    steps = int(fx["steps"])
    xf_proj, xf_out = model.apply(variables, mel, method=model.encode_music)

    def model_fn(x, t):
        return model.apply(variables, x, t, xf_proj, xf_out)

    sched = make_schedule("linear", steps)
    _, traj = ddim_sample_loop(
        sched, model_fn, noise.shape, jax.random.PRNGKey(0),
        clip_denoised=False, noise=noise, return_trajectory=True,
    )
    want = fx["trajectory"]  # (steps, 2, 30, 26), t = steps-1 .. 0
    assert traj.shape == want.shape
    # drift accumulates over the 50-step chain; bound both the early steps
    # (tight) and the final sample
    np.testing.assert_allclose(
        np.asarray(traj[:10]), want[:10], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(traj[-1]), want[-1], atol=1e-3, rtol=1e-3
    )
    for s in range(steps):
        scale = max(float(np.abs(want[s]).max()), 1.0)
        assert float(np.abs(np.asarray(traj[s]) - want[s]).max()) < 2e-3 * scale, s


def test_torch_file_roundtrip(tmp_path, m2snet_fixture):
    """The actual .pt / .tar loading path (requires torch, present in CI)."""
    torch = pytest.importorskip("torch")
    from conductor_tpu.interop import load_diffusion_tar, load_torch_state_dict

    _, sd = m2snet_fixture
    pt = tmp_path / "M2SNet_last.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)
    loaded = load_torch_state_dict(str(pt))
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(loaded["fuse_layer.0.bias"], sd["fuse_layer.0.bias"])

    tar = tmp_path / "latest.tar"
    torch.save(
        {
            "encoder": {"w": torch.ones(3)},
            "opt_encoder": {},
            "ep": 4,
            "total_it": 1234,
        },
        tar,
    )
    enc, meta = load_diffusion_tar(str(tar))
    assert meta == {"ep": 4, "total_it": 1234}
    np.testing.assert_array_equal(enc["w"], np.ones(3))


def test_m2snet_feature_stack_parity(m2snet_fixture):
    """features() stacks line up in count and final-latent values — the
    perceptual path (SyncLoss / FGD) sees reference-identical features."""
    fx, sd = m2snet_fixture
    variables = jax.tree.map(jnp.asarray, import_m2snet(sd))
    model = M2SNet()
    mel, motion = jnp.asarray(fx["mel"]), jnp.asarray(fx["motion"])
    mfeats, yfeats = model.apply(
        variables, mel, motion, method=model.features
    )
    assert len(mfeats) == 5   # mel, h1, h2, h3, h4 (`MusicEncoder.py:55-70`)
    assert len(yfeats) == 12  # data_bn + 10 blocks + projection
    np.testing.assert_allclose(
        np.asarray(mfeats[-1]), fx["hx"], atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(yfeats[-1]), fx["hy"], atol=2e-4, rtol=1e-3
    )


def test_import_cli_m2snet(tmp_path, m2snet_fixture):
    """End-to-end: .pt file -> import CLI -> orbax ckpt consumable as
    --stage1_ckpt by the stage-2 trainer."""
    torch = pytest.importorskip("torch")
    from conductor_tpu.cli.import_torch import main as import_main
    from conductor_tpu.train.checkpoints import restore_raw

    _, sd = m2snet_fixture
    pt = tmp_path / "M2SNet_last.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)
    out = tmp_path / "imported"
    import_main(["m2snet", "--input", str(pt), "--output", str(out)])

    restored = restore_raw(str(out / "ckpt"))
    assert "music_encoder" in restored["params"]
    assert "motion_encoder" in restored["params"]
    np.testing.assert_allclose(
        restored["params"]["fuse1"]["bias"], sd["fuse_layer.0.bias"], atol=0
    )


def test_import_cli_diffusion(tmp_path, transformer_fixture):
    """End-to-end: latest.tar -> import CLI -> run dir that generates motion."""
    torch = pytest.importorskip("torch")
    from conductor_tpu.cli.import_torch import main as import_main
    from conductor_tpu.config import Config
    from conductor_tpu.train.checkpoints import CheckpointManager
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    fx, sd = transformer_fixture
    tar = tmp_path / "latest.tar"
    torch.save(
        {
            "encoder": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            "opt_encoder": {},
            "ep": 2,
            "total_it": 77,
        },
        tar,
    )
    out = tmp_path / "run"
    import_main(["diffusion", "--input", str(tar), "--output", str(out)])

    cfg = Config.load(str(out / "config.json"))
    assert cfg.denoiser.latent_dim == 128 and cfg.denoiser.num_layers == 2
    trainer = DDPMTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = CheckpointManager(str(out / "ckpt")).restore(state)
    assert int(state.step) == 77

    # the restored weights drive the flax model to the torch outputs
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = trainer.model
    xf_proj, xf_out = model.apply(
        variables, jnp.asarray(fx["mel"]), method=model.encode_music
    )
    out_full = model.apply(
        variables, jnp.asarray(fx["x"]), jnp.asarray(fx["t"]), xf_proj, xf_out
    )
    np.testing.assert_allclose(
        np.asarray(out_full), fx["out_full"], atol=5e-4, rtol=1e-3
    )


def test_opt_txt_reader(tmp_path):
    """`read_opt_txt` reproduces the reference's typed coercion
    (`utils/get_opt.py:36-49`), plus None and scientific notation."""
    from conductor_tpu.interop.opt_txt import read_opt_txt

    p = tmp_path / "opt.txt"
    p.write_text(
        "------------ Options -------------\n"
        "batch_size: 32\n"
        "dataset_name: ConductorMotion100\n"
        "diffusion_steps: 1000\n"
        "distributed: False\n"
        "feat_bias: 25.0\n"
        "gpu_id: -1\n"
        "is_continue: True\n"
        "lr: 0.0002\n"
        "times: 25\n"
        "weight_decay: 2e-05\n"
        "decomp_name: Decomp_SP001_SM001_H512\n"
        "text_enc_mod: None\n"
        "-------------- End ----------------\n"
    )
    opt = read_opt_txt(str(p))
    assert opt["batch_size"] == 32 and isinstance(opt["batch_size"], int)
    assert opt["dataset_name"] == "ConductorMotion100"
    assert opt["distributed"] is False and opt["is_continue"] is True
    assert opt["lr"] == 0.0002 and isinstance(opt["lr"], float)
    assert opt["feat_bias"] == 25.0 and isinstance(opt["feat_bias"], float)
    assert opt["gpu_id"] == -1 and opt["times"] == 25
    assert opt["weight_decay"] == 2e-05
    assert opt["text_enc_mod"] is None
    assert opt["decomp_name"] == "Decomp_SP001_SM001_H512"


def test_import_cli_diffusion_run_dir(tmp_path, transformer_fixture):
    """A full reference run directory (opt.txt + model/latest.tar) imports
    verbatim: architecture from the weights, hyperparameters from opt.txt
    (VERDICT r2 Missing #4; reference layout `tools/train.py:41-45`,
    `base_options.py:77-89`)."""
    torch = pytest.importorskip("torch")
    from conductor_tpu.cli.import_torch import main as import_main
    from conductor_tpu.config import Config

    _, sd = transformer_fixture
    run = tmp_path / "checkpoints" / "ConductorMotion100" / "ref_run"
    (run / "model").mkdir(parents=True)
    (run / "opt.txt").write_text(
        "------------ Options -------------\n"
        "batch_size: 16\n"
        "dataset_name: ConductorMotion100\n"
        "diffusion_steps: 1000\n"
        "latent_dim: 128\n"
        "log_every: 50\n"
        "lr: 0.0001\n"
        "no_eff: False\n"
        "num_epochs: 400\n"
        "num_layers: 2\n"
        "save_every_e: 5\n"
        "save_latest: 500\n"
        "-------------- End ----------------\n"
    )
    torch.save(
        {
            "encoder": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            "opt_encoder": {},
            "ep": 1,
            "total_it": 42,
        },
        run / "model" / "latest.tar",
    )
    out = tmp_path / "run"
    import_main(["diffusion", "--input", str(run), "--output", str(out)])
    cfg = Config.load(str(out / "config.json"))
    assert cfg.train.lr == 1e-4 and cfg.train.batch_size == 16
    assert cfg.train.num_epochs == 400 and cfg.train.log_every == 50
    assert cfg.denoiser.num_layers == 2 and cfg.denoiser.efficient_attention
    meta = json.load(open(out / "import_meta.json"))
    assert meta["opt_txt"]["lr"] == 1e-4 and meta["total_it"] == 42

    # architecture cross-check fails loudly on a mismatched run dir
    bad = tmp_path / "checkpoints" / "ConductorMotion100" / "bad_run"
    (bad / "model").mkdir(parents=True)
    (bad / "opt.txt").write_text("num_layers: 8\nlatent_dim: 128\n")
    os.link(run / "model" / "latest.tar", bad / "model" / "latest.tar")
    with pytest.raises(ValueError, match="num_layers"):
        import_main(["diffusion", "--input", str(bad), "--output", str(tmp_path / "x")])


def test_adam_state_import(transformer_fixture):
    """Optimizer resume from the stage-2 tar: torch Adam moments land on the
    matching flax leaves with the weight-layout transforms applied
    (`ddpm_trainer.py:303-319` restores optimizer state on resume)."""
    from conductor_tpu.interop.torch_import import (
        import_adam_state,
        parameter_names,
    )

    _, sd = transformer_fixture
    names = parameter_names(sd)
    # synthesize distinctive moments: exp_avg = weight + 1, exp_avg_sq = |weight|
    state = {}
    for i, name in enumerate(names):
        if name.startswith("music_encoder."):
            continue  # frozen: torch never materializes state for these
        state[i] = {
            "step": np.int64(7),
            "exp_avg": np.asarray(sd[name]) + 1.0,
            "exp_avg_sq": np.abs(np.asarray(sd[name])),
        }
    opt_sd = {"state": state, "param_groups": [{"params": list(range(len(names)))}]}

    mu, nu, count = import_adam_state(opt_sd, sd)
    assert count == 7
    # transposed like the weight importer
    np.testing.assert_allclose(
        mu["joint_embed"]["kernel"],
        (np.asarray(sd["joint_embed.weight"]) + 1.0).T,
    )
    np.testing.assert_allclose(
        nu["out"]["kernel"], np.abs(np.asarray(sd["out.weight"])).T
    )
    # AdaLN packing: layer 0 self-attn emb slice
    span = 2 * 128
    np.testing.assert_allclose(
        mu["adaln_kernel"][:, :span],
        (
            np.asarray(
                sd["temporal_decoder_blocks.0.sa_block.proj_out.emb_layers.1.weight"]
            )
            + 1.0
        ).T,
    )
    # frozen music encoder moments are zero
    assert float(np.abs(mu["music_encoder"]["proj"]["kernel"]).max()) == 0.0

    # grafts into the trainer's optax chain and the step still runs
    import dataclasses

    from conductor_tpu.config import Config, DiffusionConfig, TrainConfig
    from conductor_tpu.cli.import_torch import denoiser_config_from_state_dict
    from conductor_tpu.interop.torch_import import graft_adam_state
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    cfg = Config(
        denoiser=denoiser_config_from_state_dict(sd),
        diffusion=DiffusionConfig(steps=8, schedule="cosine"),
        train=TrainConfig(sample_length=1, batch_size=2),
    )
    trainer = DDPMTrainer(cfg)
    st = trainer.init_state(jax.random.PRNGKey(0))
    st = st.replace(opt_state=graft_adam_state(st.opt_state, mu, nu, count))
    import optax

    adam = [
        s for s in jax.tree.leaves(
            st.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        )
        if isinstance(x := s, optax.ScaleByAdamState)
    ]
    assert adam and int(adam[0].count) == 7

    batch = (
        jnp.zeros((2, 90, 128)),
        jnp.zeros((2, 30, 13, 2)),
        jnp.full((2,), 30, jnp.int32),
    )
    st2, metrics = trainer.train_step(st, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_adam_step_round_trip_vs_torch(transformer_fixture):
    """One optimizer step on imported moments matches torch.optim.Adam
    (VERDICT r2 #10): same weights, same moments, same grads -> same post-step
    weights to ≤1e-5.  Pins that torch's and optax's bias-correction and eps
    conventions line up, so a resumed run continues the reference's optimizer
    trajectory rather than silently restarting it
    (`trainers/ddpm_trainer.py:303-319`)."""
    torch = pytest.importorskip("torch")
    import optax

    from conductor_tpu.interop.torch_import import (
        graft_adam_state,
        import_adam_state,
        parameter_names,
    )

    _, sd = transformer_fixture
    names = parameter_names(sd)
    trainable = [n for n in names if not n.startswith("music_encoder.")]
    rs = np.random.RandomState(3)
    moments = {
        n: (
            rs.randn(*np.shape(sd[n])).astype(np.float32) * 1e-2,
            rs.rand(*np.shape(sd[n])).astype(np.float32) * 1e-4,
        )
        for n in trainable
    }
    grads_sd = {
        n: rs.randn(*np.shape(sd[n])).astype(np.float32) * 0.1 for n in trainable
    }
    lr, step0 = 2e-4, 7

    # ---- torch side: real torch.optim.Adam, preloaded state, one step
    # (.copy() everywhere: from_numpy shares memory and opt.step() mutates
    # params AND moments in place — without copies the optax side below would
    # read post-step moments and the module-scoped sd fixture would corrupt)
    params_t = {
        n: torch.nn.Parameter(torch.from_numpy(np.asarray(sd[n], np.float32).copy()))
        for n in trainable
    }
    opt = torch.optim.Adam(params_t.values(), lr=lr)
    osd = opt.state_dict()
    osd["state"] = {
        i: {
            "step": torch.tensor(float(step0)),
            "exp_avg": torch.from_numpy(moments[n][0].copy()),
            "exp_avg_sq": torch.from_numpy(moments[n][1].copy()),
        }
        for i, n in enumerate(trainable)
    }
    opt.load_state_dict(osd)
    for n, p in params_t.items():
        p.grad = torch.from_numpy(grads_sd[n])
    opt.step()
    post_sd = dict(sd)
    post_sd.update({n: p.detach().numpy() for n, p in params_t.items()})

    # ---- optax side: import weights + moments, apply the SAME grads
    opt_sd = {
        "state": {
            names.index(n): {
                "step": np.float32(step0),
                "exp_avg": moments[n][0],
                "exp_avg_sq": moments[n][1],
            }
            for n in trainable
        },
        "param_groups": [{"params": list(range(len(names)))}],
    }
    mu, nu, count = import_adam_state(opt_sd, sd)
    assert count == step0
    params0 = jax.tree.map(jnp.asarray, import_motion_transformer(sd)["params"])
    g_sd = {
        k: grads_sd.get(k, np.zeros_like(np.asarray(v))) for k, v in sd.items()
    }
    grads = jax.tree.map(jnp.asarray, import_motion_transformer(g_sd)["params"])

    tx = optax.adam(lr)  # torch defaults: b1=.9 b2=.999 eps=1e-8, eps_root=0
    opt_state = graft_adam_state(tx.init(params0), mu, nu, count)
    updates, _ = tx.update(grads, opt_state, params0)
    params1 = optax.apply_updates(params0, updates)

    expected = import_motion_transformer(post_sd)["params"]
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        ),
        params1, expected,
    )
    # frozen music-encoder weights never move (zero grads + zero moments)
    np.testing.assert_array_equal(
        np.asarray(params1["music_encoder"]["proj"]["kernel"]),
        np.asarray(params0["music_encoder"]["proj"]["kernel"]),
    )


@pytest.fixture(scope="module")
def m2sgan_fixture():
    fx = np.load(os.path.join(FIXTURES, "torch_m2sgan.npz"))
    g_sd = synth_state_dict(
        manifest_from_json(bytes(fx["g_manifest"]).decode()), seed=0
    )
    d_sd = synth_state_dict(
        manifest_from_json(bytes(fx["d_manifest"]).decode()), seed=1
    )
    return fx, g_sd, d_sd


def test_generator_import_parity(m2sgan_fixture):
    """M2SGAN Generator (weight-normed TCN + ConvTranspose noise path +
    frozen music encoder) reproduces torch outputs end-to-end."""
    from conductor_tpu.interop.torch_import import import_generator
    from conductor_tpu.models.generator import Generator

    fx, g_sd, _ = m2sgan_fixture
    variables = jax.tree.map(jnp.asarray, import_generator(g_sd))
    model = Generator()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 90, 128)), jnp.zeros((1, 1, 8))
    )
    assert_matches_template(variables, template)

    mel, noise = jnp.asarray(fx["mel"]), jnp.asarray(fx["noise"])
    hidden = model.apply(variables, mel, noise, method=model.features)
    np.testing.assert_allclose(
        np.asarray(hidden), fx["hidden"], atol=2e-4, rtol=1e-3
    )
    fake = model.apply(variables, mel, noise)
    np.testing.assert_allclose(np.asarray(fake), fx["fake"], atol=5e-4, rtol=1e-3)


def test_discriminator_import_parity(m2sgan_fixture):
    from conductor_tpu.interop.torch_import import import_discriminator
    from conductor_tpu.models.generator import Discriminator1DCNN

    fx, _, d_sd = m2sgan_fixture
    variables = jax.tree.map(jnp.asarray, import_discriminator(d_sd))
    model = Discriminator1DCNN()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 90, 13, 2)))
    assert_matches_template(variables, template)

    score = model.apply(variables, jnp.asarray(fx["motion"]))
    np.testing.assert_allclose(
        np.asarray(score), fx["score"], atol=1e-4, rtol=1e-3
    )


def test_import_cli_m2sgan(tmp_path, m2sgan_fixture):
    torch = pytest.importorskip("torch")
    from conductor_tpu.cli.import_torch import main as import_main
    from conductor_tpu.train.checkpoints import restore_raw

    _, g_sd, d_sd = m2sgan_fixture
    gp = tmp_path / "M2SGAN_G.pt"
    dp = tmp_path / "M2SGAN_D.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in g_sd.items()}, gp)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in d_sd.items()}, dp)
    out = tmp_path / "gan"
    import_main([
        "m2sgan", "--input", str(gp), "--discriminator", str(dp),
        "--output", str(out),
    ])
    restored = restore_raw(str(out / "ckpt"))
    assert "decoder" in restored["g_params"]
    assert "Conv_0" in restored["d_params"]


def test_transformer_no_eff_parity(transformer_fixture):
    """The quadratic (`--no_eff`) variant: same state-dict key names load via
    the same importer, and the flax quadratic path matches torch under a
    full mask (where the reference's query-side mask quirk is a no-op —
    ops/linear_attention.py docstring)."""
    fx, sd = transformer_fixture
    if "out_quad" not in fx:
        pytest.skip("fixture predates no_eff outputs")
    variables = jax.tree.map(jnp.asarray, import_motion_transformer(sd))
    model = MotionTransformer(
        input_feats=26, num_frames=30, latent_dim=128, ff_size=64,
        num_layers=2, num_heads=8, dropout=0.0, efficient=False,
    )
    template = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 90, 128)), jnp.zeros((1, 30, 26)),
        jnp.zeros((1,), jnp.int32), method=model.init_with_music,
    )
    assert_matches_template(variables, template)

    xf_proj, xf_out = model.apply(
        variables, jnp.asarray(fx["mel"]), method=model.encode_music
    )
    out = model.apply(
        variables, jnp.asarray(fx["x"]), jnp.asarray(fx["t"]), xf_proj, xf_out
    )
    np.testing.assert_allclose(
        np.asarray(out), fx["out_quad"], atol=5e-4, rtol=1e-3
    )
