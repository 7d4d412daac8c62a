"""Backend-resolved "auto" implementation defaults + the faithful preset.

The TPU-first polarity decision (VERDICT r4 #2): `Config()`'s impl knobs
default to "auto" — the parity-pinned fast paths on TPU hardware, the
portable (reference-exact) XLA/flax f32 paths elsewhere — and
`Config.faithful()` pins everything reference-exact on any backend.
"""

import dataclasses

from conductor_tpu.config import Config, pin_faithful, resolve_auto, resolve_impl


def test_auto_resolves_fast_on_tpu():
    cfg = resolve_auto(Config(), backend="tpu")
    d = cfg.denoiser
    assert d.attention_impl == "pallas"
    assert d.compute_dtype == "bfloat16"
    assert d.layer_impl == "pallas_fused"
    assert d.train_layer_impl == "pallas_fused"
    assert d.music_encoder_impl == "pallas"
    assert cfg.train.feat_impl == "pallas"
    # quantization levers stay opt-in even on TPU
    assert d.sampler_adaln_int8 is False
    assert d.sampler_vpu_dtype == "float32"


def test_auto_resolves_portable_off_tpu():
    cfg = resolve_auto(Config(), backend="cpu")
    d = cfg.denoiser
    assert d.attention_impl == "xla"
    assert d.compute_dtype == "float32"
    assert d.layer_impl == "flax"
    assert d.train_layer_impl == "flax"
    assert d.music_encoder_impl == "flax"
    assert cfg.train.feat_impl == "flax"


def test_explicit_values_survive_resolution():
    cfg = Config()
    cfg = cfg.replace(
        denoiser=dataclasses.replace(
            cfg.denoiser, attention_impl="xla", compute_dtype="bfloat16"
        )
    )
    out = resolve_auto(cfg, backend="tpu")
    assert out.denoiser.attention_impl == "xla"       # explicit wins
    assert out.denoiser.compute_dtype == "bfloat16"
    assert out.denoiser.layer_impl == "pallas_fused"  # auto still resolves


def test_auto_train_layers_downgrade_when_constraints_fail():
    # the fused training kernels require dropout 0 / full src_mask /
    # linear attention; "auto" must fall back rather than hit the assert
    cfg = Config()
    cfg = cfg.replace(
        denoiser=dataclasses.replace(cfg.denoiser, dropout=0.1)
    )
    assert resolve_auto(cfg, backend="tpu").denoiser.train_layer_impl == "flax"

    cfg = Config()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, replicate_reference_mask=True)
    )
    assert resolve_auto(cfg, backend="tpu").denoiser.train_layer_impl == "flax"

    cfg = Config()
    cfg = cfg.replace(
        denoiser=dataclasses.replace(cfg.denoiser, efficient_attention=False)
    )
    out = resolve_auto(cfg, backend="tpu").denoiser
    assert out.train_layer_impl == "flax"   # fused kernels are linear-attn only
    assert out.layer_impl == "flax"
    assert out.attention_impl == "xla"


def test_resolution_is_idempotent():
    once = resolve_auto(Config(), backend="tpu")
    assert resolve_auto(once, backend="cpu") == once  # no "auto" left


def test_faithful_preset_pins_reference_exact():
    cfg = Config.faithful()
    d = cfg.denoiser
    assert d.attention_impl == "xla"
    assert d.compute_dtype == "float32"
    assert d.layer_impl == "flax"
    assert d.train_layer_impl == "flax"
    assert d.music_encoder_impl == "flax"
    assert d.sampler_adaln_int8 is False
    assert cfg.train.feat_impl == "flax"
    # faithful is a fixed point of resolution on every backend
    assert resolve_auto(cfg, backend="tpu") == cfg
    # and hyperparameter sections pass through
    assert Config.faithful().train.lr == 2e-4
    assert pin_faithful(resolve_auto(Config(), backend="tpu")) == Config.faithful()


def test_trainer_resolves_auto_on_cpu():
    """DDPMTrainer under default Config on this (CPU) test backend runs the
    portable paths — CPU CI never lands in Pallas interpret mode by default."""
    from conductor_tpu.train.ddpm_trainer import DDPMTrainer

    trainer = DDPMTrainer(Config())
    assert trainer.cfg.denoiser.layer_impl == "flax"
    assert trainer.cfg.denoiser.compute_dtype == "float32"


def test_stage1_trainers_resolve_auto_on_cpu():
    from conductor_tpu.train.m2sgan_trainer import M2SGANTrainer
    from conductor_tpu.train.m2snet_trainer import M2SNetTrainer

    t = M2SNetTrainer(sample_length=4, clip_length=2)
    assert str(t.model.dtype) == "float32"
    assert t.model.music_conv_impl == "lax"
    g = M2SGANTrainer(sample_length=4)
    assert g.music_encoder_impl == "flax"
    assert g.sync_encoder_impl == "flax"
    # and with train_music_encoder=True, "auto" routes around the
    # frozen-only fused encoder instead of raising
    g2 = M2SGANTrainer(sample_length=4, train_music_encoder=True)
    assert g2.music_encoder_impl == "flax"
    # Generator compute dtype: "auto" stays f32 off-TPU (and, on TPU, only
    # goes bf16 for the trainable-encoder configuration)
    assert g.compute_dtype == "float32"
    assert g2.compute_dtype == "float32"


def test_resolve_impl_passthrough():
    assert resolve_impl("lax", "pallas_train", "lax", backend="tpu") == "lax"
    assert resolve_impl("auto", "pallas_train", "lax", backend="tpu") == "pallas_train"
    assert resolve_impl("auto", "pallas_train", "lax", backend="cpu") == "lax"
