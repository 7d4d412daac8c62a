"""Stage-2 diffusion trainer: jitted SPMD train step + scan-based generation.

Rebuild of reference `Diffusion_Stage/trainers/ddpm_trainer.py:82-370` as a
functional TPU pipeline:

- one jitted, donated `train_step` computing the full 5-term loss
  (`backward_G`, `ddpm_trainer.py:223-258`):
      1·masked-MSE + 1e-6·L1(frozen ST-GCN latents) + 0.1·velocity
      − 0.1·clamp(elbow, ±2e-4) + 0.1·head
  with global-norm clipping 0.5 and Adam lr 2e-4 (`:270-277,324`);
- data parallelism = batch sharding over the mesh's 'data' axis; gradients
  all-reduce implicitly (replacing MMDistributedDataParallel);
- generation = music encoded once, then the whole DDIM ladder as one
  `lax.scan` (replacing the reference's 1000 host-dispatched denoiser calls
  per clip, `generate_music_motion`, `:183-201`), with optional timestep
  respacing and classifier-free guidance the reference lacks;
- the frozen stage-1 ST-GCN feature network (`MotionPretrain`, `:66-79`) is a
  separate variable collection, never optimized.

Quirk handling (SURVEY.md §7.4): the reference's `m_lens` is 60 — seconds of
the full file, not frames of the window — so for 30-s/900-frame windows the
reconstruction mask covers only the first 60 frames (`datasets/dataset.py:448`,
`ddpm_trainer.py:143,161-163`).  `TrainConfig.replicate_reference_mask`
toggles byte-for-byte replication; the default supervises every frame.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..diffusion import (
    DiffusionSchedule,
    LossKind,
    MeanType,
    VarType,
    ddim_sample_loop,
    make_schedule,
    p_sample_loop,
    respaced_schedule,
    space_timesteps,
    training_losses,
)
from ..diffusion import timestep_samplers as ts
from ..models import MotionTransformer, generate_src_mask, guided_denoiser
from ..models.stgcn import MotionEncoderSTGCN


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any          # frozen music-encoder BN stats
    feat_variables: Any       # frozen stage-1 ST-GCN (params + batch_stats)
    opt_state: Any
    sampler_state: Optional[ts.SamplerState] = None


def make_denoiser(cfg: Config) -> MotionTransformer:
    from ..config import resolve_auto

    d = resolve_auto(cfg).denoiser  # "auto" impls -> this backend's paths
    return MotionTransformer(
        input_feats=d.input_feats,
        num_frames=d.num_frames,
        latent_dim=d.latent_dim,
        ff_size=d.ff_size,
        num_layers=d.num_layers,
        num_heads=d.num_heads,
        dropout=d.dropout,
        cond_mask_prob=d.cond_mask_prob,
        music_latent_dim=d.music_latent_dim,
        music_width=d.music_width,
        efficient=d.efficient_attention,
        attention_impl=d.attention_impl,
        adaln_mode=d.adaln_mode,
        dtype=jnp.dtype(d.compute_dtype),
    )


class DDPMTrainer:
    """Owns the static pieces (model defs, optimizer, schedule) and exposes
    jitted train/generate functions over `TrainState` pytrees."""

    def __init__(self, cfg: Config):
        from ..config import resolve_auto

        cfg = resolve_auto(cfg)  # "auto" impl knobs -> this backend's paths
        self.cfg = cfg
        self.model = make_denoiser(cfg)
        # the frozen perceptual-loss ST-GCN follows the training compute
        # dtype: its matmuls sit on the step's serial critical path
        # (denoiser fwd -> feat fwd -> feat bwd -> denoiser bwd) and the
        # loss term is weighted 1e-6 (`ddpm_trainer.py:244-246`)
        self.feat_model = MotionEncoderSTGCN(
            dtype=jnp.dtype(cfg.denoiser.compute_dtype)
        )
        self.sched = make_schedule(cfg.diffusion.schedule, cfg.diffusion.steps)
        self.mean_type = MeanType(cfg.diffusion.mean_type)
        self.var_type = VarType(cfg.diffusion.var_type)
        self.loss_kind = LossKind(cfg.diffusion.loss_type)
        # The 5-term trainer objective is defined on the MSE family, like the
        # reference trainer (`ddpm_trainer.py:96` LossType.MSE).  KL training
        # and learned variances are engine-level features
        # (diffusion.training_losses handles all four LossKinds).
        assert self.loss_kind in (LossKind.MSE, LossKind.RESCALED_MSE), (
            f"DDPMTrainer supports mse/rescaled_mse; {self.loss_kind} is "
            "available via diffusion.training_losses directly"
        )
        assert self.var_type in (VarType.FIXED_SMALL, VarType.FIXED_LARGE), (
            "learned variances need a 2x-width denoiser head; the reference "
            "uses FIXED_SMALL (`ddpm_trainer.py:95`)"
        )
        if cfg.denoiser.train_layer_impl == "pallas_fused":
            assert cfg.denoiser.efficient_attention, \
                "fused training layers implement linear attention only"
            assert cfg.denoiser.dropout == 0.0, \
                "fused training layers require dropout 0 (the default)"
            assert not cfg.train.replicate_reference_mask, \
                "fused training layers assume the full (fixed) src_mask"
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip),
            optax.adam(cfg.train.lr),
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._generate_cache: dict = {}
        self._feat_pack_cache = None
        self._sampling_pack_cache = None

    # ------------------------------------------------------------------ init

    def init_state(
        self,
        rng: jax.Array,
        *,
        stage1_music_params: Any = None,
        stage1_music_stats: Any = None,
        stage1_motion_variables: Any = None,
    ) -> TrainState:
        """Initialize params; optionally graft the stage-1 encoder subtrees —
        the cross-stage checkpoint contract (`transformer.py:394-401`
        music, `ddpm_trainer.py:71-78` motion).  Without a stage-1 checkpoint
        the encoders stay randomly initialized, matching the reference's
        `strict=False` fallback."""
        ds = self.cfg.dataset
        sl = self.cfg.train.sample_length
        mel = jnp.zeros((1, sl * ds.mel_hz, ds.mel_bins))
        x = jnp.zeros((1, sl * ds.motion_hz, ds.pose_dim))
        t = jnp.zeros((1,), jnp.int32)
        p_rng, f_rng = jax.random.split(rng)
        variables = self.model.init(
            {"params": p_rng}, mel, x, t, method=self.model.init_with_music
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if stage1_music_params is not None:
            params = flax.core.unfreeze(params)
            params["music_encoder"] = stage1_music_params
            if stage1_music_stats is not None:
                batch_stats = flax.core.unfreeze(batch_stats)
                batch_stats["music_encoder"] = stage1_music_stats

        if stage1_motion_variables is None:
            motion = jnp.zeros((1, sl * ds.motion_hz, ds.n_joints, ds.joint_dim))
            feat_variables = self.feat_model.init(f_rng, motion)
        else:
            feat_variables = stage1_motion_variables

        sampler_state = None
        if self.cfg.train.timestep_sampler == "loss-second-moment":
            sampler_state = ts.init_state(self.sched.num_timesteps)

        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            feat_variables=feat_variables,
            opt_state=self.tx.init(params),
            sampler_state=sampler_state,
        )

    # ------------------------------------------------------------- train step

    def _losses(self, params, state: TrainState, batch, t, rng, feat_pack=None):
        """The 5-term objective (`backward_G`, `ddpm_trainer.py:223-258`)."""
        mel, motion, m_lens = batch
        B, T = motion.shape[0], motion.shape[1]
        tcfg = self.cfg.train
        noise_rng, cond_rng = jax.random.split(rng)

        variables = {"params": params, "batch_stats": state.batch_stats}
        cond_method = (
            self.model.cond_from_features
            if tcfg.cached_features
            else self.model.encode_music
        )
        xf_proj, xf_out = self.model.apply(
            variables, mel, True, method=cond_method, rngs={"cond": cond_rng},
        )
        if tcfg.replicate_reference_mask:
            cur_len = jnp.minimum(T, m_lens)
        else:
            cur_len = jnp.full_like(m_lens, T)
        src_mask = generate_src_mask(T, cur_len)

        if self.cfg.denoiser.train_layer_impl == "pallas_fused":
            # whole-layer fused fwd + custom_vjp bwd kernels
            # (ops/pallas_layer_bwd.py); __init__ validated the gating
            from .fused_denoiser import fused_train_denoise

            def model_fn(x, tt):
                return fused_train_denoise(
                    params, self.cfg, x, tt, xf_proj, xf_out
                )
        else:
            def model_fn(x, tt):
                return self.model.apply(
                    variables, x, tt, xf_proj, xf_out, src_mask, True
                )

        noise = jax.random.normal(noise_rng, (B, T, motion.shape[2] * motion.shape[3]))
        terms = training_losses(
            self.sched, model_fn, motion, t,
            noise.reshape(motion.shape), mean_type=self.mean_type,
            var_type=self.var_type, loss_kind=self.loss_kind,
        )
        target, pred = terms["target"], terms["pred"]

        # masked reconstruction (`ddpm_trainer.py:232-234`)
        rec = ((pred - target) ** 2).mean(axis=-1)
        mask2d = src_mask[..., 0]
        loss_rec = (rec * mask2d).sum() / mask2d.sum()

        # frozen ST-GCN latent L1 (`ddpm_trainer.py:228-238`)
        J = self.cfg.dataset.n_joints
        # plain __call__ == features()[-1] (the final 64-d latent) without
        # materializing the 11 intermediate flattened maps; skipped entirely
        # at weight 0 (the reference always computes it, `ddpm_trainer.py:236`,
        # but its default weight is 1e-6)
        if tcfg.lambda_feat == 0.0:
            loss_feat = jnp.zeros(())
        elif tcfg.feat_impl == "pallas":
            # frozen encoder as single fused fwd/bwd kernels; the packed
            # weights arrive precomputed (`_feat_pack`) — packing them here
            # would re-run the constant 10-block einsum/tile/update-slice
            # chain inside every jitted step (round-4 stage-2 profile:
            # the step's dynamic-update-slice tail)
            from ..ops.pallas_stgcn import fused_frozen_stgcn

            pack = feat_pack
            mx = jnp.dtype(self.cfg.denoiser.compute_dtype)
            feat_fake = fused_frozen_stgcn(pred.reshape(B, T, J, 2), pack, mx)
            feat_real = fused_frozen_stgcn(
                jax.lax.stop_gradient(target.reshape(B, T, J, 2)), pack, mx
            )
            loss_feat = jnp.abs(feat_fake - feat_real).mean()
        else:
            feat_fake = self.feat_model.apply(
                state.feat_variables, pred.reshape(B, T, J, 2)
            )
            feat_real = self.feat_model.apply(
                state.feat_variables, target.reshape(B, T, J, 2)
            )
            loss_feat = jnp.abs(feat_fake - feat_real).mean()

        loss_elbow = jnp.clip(
            terms["velocity_elbow"], -tcfg.elbow_clamp, tcfg.elbow_clamp
        )
        loss = (
            tcfg.lambda_rec * loss_rec
            + tcfg.lambda_feat * loss_feat
            + tcfg.lambda_velocity * terms["velocity"]
            - tcfg.lambda_elbow * loss_elbow
            + tcfg.lambda_head * terms["velocity_head"]
        )
        # the reference always computes loss_mot_feat (`ddpm_trainer.py:236`);
        # when lambda_feat == 0 we skip it for speed and log NaN (not a fake
        # 0.0) so the observability deviation is explicit
        feat_metric = (
            jnp.full((), jnp.nan) if tcfg.lambda_feat == 0.0 else loss_feat
        )
        metrics = {
            "loss": loss,
            "loss_mot_rec": loss_rec,
            "loss_mot_feat": feat_metric,
            "loss_velocity": terms["velocity"],
            "loss_elbow": loss_elbow,
            "loss_head": terms["velocity_head"],
            "loss_body": terms["velocity_body"],
            "mse_per_sample": terms["mse"],
        }
        return loss, metrics

    def _train_step_impl(self, state: TrainState, batch, rng: jax.Array,
                         feat_pack=None):
        t_rng, loss_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        B = batch[1].shape[0]
        if state.sampler_state is not None:
            t, weights = ts.loss_aware_sample(state.sampler_state, t_rng, B)
        else:
            t, weights = ts.uniform_sample(t_rng, self.sched.num_timesteps, B)

        grads, metrics = jax.grad(
            lambda p: self._losses(p, state, batch, t, loss_rng, feat_pack),
            has_aux=True,
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        sampler_state = state.sampler_state
        if sampler_state is not None:
            sampler_state = ts.update_state(sampler_state, t, metrics["mse_per_sample"])

        metrics = {k: v for k, v in metrics.items() if k != "mse_per_sample"}
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                sampler_state=sampler_state,
            ),
            metrics,
        )

    def _feat_pack(self, state: TrainState):
        """Packed frozen ST-GCN weights for the Pallas perceptual path,
        built ONCE outside the jitted step: the encoder is frozen, so the
        packing (10 blocks of einsum/tile/update-slice) is constant across
        steps — inside the jit it re-ran every step as a latency-bound
        dynamic-update-slice chain (round-4 stage-2 profile).  Rebuilt only
        when the cache is empty; any restore or swap of ``feat_variables``
        on an already-stepped trainer must call `reset_caches()` (the CLI
        checkpoint-restore path does)."""
        if (self.cfg.train.lambda_feat == 0.0
                or self.cfg.train.feat_impl != "pallas"):
            return None
        if self._feat_pack_cache is None:
            from ..models.graph import build_adjacency
            from ..ops.pallas_stgcn import pack_frozen_stgcn

            self._feat_pack_cache = pack_frozen_stgcn(
                state.feat_variables,
                build_adjacency("ConductorMotionX", "uniform"),
                mxu_dtype=jnp.dtype(self.cfg.denoiser.compute_dtype),
            )
        return self._feat_pack_cache

    def _sampling_pack(self, state: TrainState):
        """Mel- and step-count-independent sampling constants — the fused
        layers' packed/int8-quantized weight stacks and the full temb ladder
        — built OUTSIDE the per-call generate jit: they depend only on the
        params, and rebuilding them inside every serving call cost ~1 ms of
        stack/quantize/update-slice graph per clip (round-5 ddim50 profile).
        Keyed on the IDENTITY of ``state.params``: a server generating from
        one state object hits the cache, while any freshly trained/restored
        state (a new params tree) rebuilds automatically — params are NOT
        frozen, so a content-blind cache would silently serve stale weights."""
        cache = self._sampling_pack_cache
        if cache is not None and cache[0] is state.params:
            return cache[1]

        def build(params, batch_stats):
            out = {
                "temb_table": self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    self.cfg.diffusion.steps,
                    method=self.model.time_embed_table,
                )
            }
            if self.cfg.denoiser.layer_impl == "pallas_fused":
                from .fused_denoiser import FusedDenoiser

                out["fused"] = FusedDenoiser(params, self.cfg).export_pack()
            return out

        pack = jax.jit(build)(state.params, state.batch_stats)
        self._sampling_pack_cache = (state.params, pack)
        return pack

    def reset_caches(self) -> None:
        """Drop derived-weight caches (packed frozen encoders, sampling
        packs).  Call after swapping frozen subtrees or params on an
        already-stepped trainer."""
        self._feat_pack_cache = None
        self._sampling_pack_cache = None

    def train_step(self, state: TrainState, batch, rng: jax.Array):
        """One jitted optimizer step.  ``batch = (mel, motion, m_lens)`` with
        mel (B, T90, 128), motion (B, T30, J, 2), m_lens (B,) int32."""
        return self._train_step(state, batch, rng, self._feat_pack(state))

    # -------------------------------------------------------------- sampling

    def generate(
        self,
        state: TrainState,
        mel: jnp.ndarray,
        rng: jax.Array,
        *,
        num_steps: int | None = None,
        guidance_scale: float = 1.0,
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """mel (B, T90, 128) -> motion (B, T30, 26).

        Replaces `generate_music_motion` (`ddpm_trainer.py:183-201`): encode
        once, then a single scan over the (optionally respaced) ladder.  The
        whole pipeline is jitted (cached per (num_steps, guidance, sampler);
        XLA re-specializes per mel shape) — eager dispatch would cost one
        host round-trip per op, catastrophic over remote/tunneled devices."""
        ds = self.cfg.dataset
        if mel.ndim != 3 or mel.shape[-1] != ds.mel_bins:
            raise ValueError(
                f"mel must be (B, T90, {ds.mel_bins}) — got {mel.shape}. "
                "Extract features with conductor_tpu.data.mel.extract_mel_feature "
                f"(n_mels={ds.mel_bins})."
            )
        key = (num_steps, guidance_scale, sampler)
        if key not in self._generate_cache:
            # the (possibly respaced) schedule must be built OUTSIDE the jit:
            # its tables are host constants (the fused sampler derives numpy
            # affine tables from them; jnp ops inside a trace would make them
            # tracers and break that)
            if num_steps is not None and num_steps < self.sched.num_timesteps:
                sched = respaced_schedule(
                    self.cfg.diffusion.schedule,
                    self.cfg.diffusion.steps,
                    space_timesteps(self.cfg.diffusion.steps, f"ddim{num_steps}"),
                )
            else:
                sched = self.sched
            self._generate_cache[key] = jax.jit(
                partial(
                    self._generate_impl, sched=sched,
                    guidance_scale=guidance_scale, sampler=sampler,
                )
            )
        return self._generate_cache[key](state, mel, rng, self._sampling_pack(state))

    def _generate_impl(
        self,
        state: TrainState,
        mel: jnp.ndarray,
        rng: jax.Array,
        pack: dict,
        *,
        sched: DiffusionSchedule,
        guidance_scale: float,
        sampler: str,
    ) -> jnp.ndarray:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if self.cfg.denoiser.music_encoder_impl == "pallas":
            from ..models.music_encoder import FusedMusicEncoder

            feats = FusedMusicEncoder(
                {
                    "params": state.params["music_encoder"],
                    "batch_stats": state.batch_stats["music_encoder"],
                },
                mxu_dtype=jnp.dtype(self.cfg.denoiser.compute_dtype),
            )(mel)
            xf_proj, xf_out = self.model.apply(
                variables, feats, method=self.model.cond_from_features
            )
        else:
            xf_proj, xf_out = self.model.apply(
                variables, mel, method=self.model.encode_music
            )
        B, T = xf_proj.shape[0], xf_proj.shape[1]
        src_mask = jnp.ones((B, T, 1))

        # Step-invariant conditioning (music projections + per-layer cross-attn
        # KV) hoisted out of the 1000-step scan — see `precompute_cond` — plus
        # the full temb ladder as a table (gather by t inside the scan).
        cond = self.model.apply(
            variables, xf_proj, xf_out, method=self.model.precompute_cond
        )
        temb_table = pack["temb_table"]  # hoisted: params-only constant
        cond = dict(cond, temb_table=temb_table)
        null_cond = None
        if guidance_scale != 1.0:
            xf_proj_n, xf_out_n = self.model.apply(
                variables, B, T, method=self.model.encode_null
            )
            null_cond = self.model.apply(
                variables, xf_proj_n, xf_out_n, method=self.model.precompute_cond
            )
            null_cond = dict(null_cond, temb_table=temb_table)

        if self.cfg.denoiser.layer_impl == "pallas_fused":
            from .fused_denoiser import FusedDenoiser

            fused = FusedDenoiser(state.params, self.cfg, pack=pack["fused"])
            cond = fused.prepare_cond(cond)
            if null_cond is not None:
                null_cond = fused.prepare_cond(null_cond)

            if sampler == "ddim" and guidance_scale == 1.0:
                # all-kernel fast path: glue kernels absorb the per-step
                # embedding/projection/update XLA fusions
                return fused.ddim_sample(
                    cond, sched, (B, T, self.cfg.denoiser.input_feats), rng
                )

            def denoise_fn(x, tt, c, sm):
                return fused(x, tt, c)

        else:

            def denoise_fn(x, tt, c, sm):
                return self.model.apply(
                    variables, x, tt, c, sm, method=self.model.denoise
                )

        model_fn = guided_denoiser(
            denoise_fn, cond, src_mask,
            guidance_scale=guidance_scale, null_cond=null_cond,
        )
        loop = ddim_sample_loop if sampler == "ddim" else p_sample_loop
        return loop(
            sched, model_fn, (B, T, self.cfg.denoiser.input_feats), rng,
            mean_type=self.mean_type, var_type=self.var_type,
            clip_denoised=False,  # `ddpm_trainer.py:173,193`
        )
