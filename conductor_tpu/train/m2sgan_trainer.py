"""Stage-1 WGAN-GP trainer: M2SGAN adversarial motion generation.

Rebuild of reference `Contrastive_Stage/M2SGAN_train.py:36-147` as jitted
steps.  Recipe (`:76-141` + argparse defaults `:168-196`):

- per batch: one fake forward, then 5 critic iterations on the *same* fake
  (detached), then one generator step;
- critic loss = -E[D(real)] + E[D(fake)] + 10 * GP, where GP is the
  'real_fake' interpolation term of `utils/loss.py:114-123`.  Two reference
  quirks replicated exactly: the gradient norm is taken over the WHOLE batch
  tensor (not per-sample), and the penalty center is 0, not 1 (`loss.py:69`)
  — i.e. GP = || dD/dx at interp ||_F^2;
- generator loss = 1*(-E[D(fake)]) + 0.05*SyncLoss + 0*MSE, SyncLoss = L1
  between frozen-M2SNet motion-encoder latents of fake and real
  (`loss.py:30-46`);
- RMSprop lr 5e-4 for both (torch defaults: decay 0.99, eps 1e-8);
- the generator's music encoder is transferred from stage-1 M2SNet and frozen
  (`M2SGAN_train.py:60-64`).

The double-backward the reference needs for GP (`autograd.grad` inside the
loss) is just `jax.grad` of a function that itself calls `jax.grad` —
functionally transparent on TPU.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from . import losses
from ..models.generator import Discriminator1DCNN, Generator
from ..models.stgcn import MotionEncoderSTGCN


class GANState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    sync_variables: Any  # frozen M2SNet motion encoder (params + batch_stats)


class M2SGANTrainer:
    def __init__(
        self,
        sample_length: int = 30,
        lr: float = 5e-4,
        critic_iters: int = 5,
        w_adv: float = 1.0,
        w_sync: float = 0.05,
        w_mse: float = 0.0,
        w_gp: float = 10.0,
        noise_dim: int = 8,
        gp_terms: tuple[str, ...] = ("real_fake",),
        music_encoder_impl: str = "auto",  # "auto" | "flax" | "pallas" (fused bf16)
        sync_encoder_dtype: str = "auto",  # frozen SyncLoss ST-GCN dtype
        sync_encoder_impl: str = "auto",   # "auto" | "flax" | "pallas" (fused kernels)
        train_music_encoder: bool = False,
        music_conv_impl: str = "auto",  # "auto" | "lax" | "pallas_train" (packed kernels)
        compute_dtype: str = "auto",  # Generator dtype when the encoder trains
        cached_features: bool = False,
        cached_sync_latents: bool = False,
    ):
        # "auto" impl knobs: the parity-pinned fast paths on TPU, the
        # reference-exact flax/lax/f32 paths elsewhere (CLI: --faithful pins
        # the latter everywhere).  The frozen-encoder fused path is illegal
        # with train_music_encoder, so "auto" resolves around it.
        from ..config import resolve_impl

        music_encoder_impl = resolve_impl(
            music_encoder_impl, "flax" if train_music_encoder else "pallas", "flax"
        )
        sync_encoder_dtype = resolve_impl(sync_encoder_dtype, "bfloat16", "float32")
        sync_encoder_impl = resolve_impl(sync_encoder_impl, "pallas", "flax")
        music_conv_impl = resolve_impl(
            music_conv_impl, "pallas_train" if train_music_encoder else "lax", "lax"
        )
        # Generator compute dtype (same knob as M2SNetTrainer.compute_dtype,
        # which owns the same conv encoder in stage 1).  "auto" resolves to
        # bf16 on TPU ONLY for the trainable-encoder configuration: there the
        # encoder fwd+bwd dominates the step AND the f32 lane-padded conv
        # temps at the reference batch (55 x 30 s) need 19.2G — over v5e
        # HBM (measured; same wall the M2SNet README notes hit at f32 b32).
        # With the encoder frozen the trainable remainder is small, f32 is
        # ~free, and keeping it preserves the pinned reference numerics.
        compute_dtype = resolve_impl(
            compute_dtype,
            "bfloat16" if train_music_encoder else "float32",
            "float32",
        )
        self.compute_dtype = compute_dtype
        self.sample_length = sample_length
        self.critic_iters = critic_iters
        self.w_adv, self.w_sync, self.w_mse, self.w_gp = w_adv, w_sync, w_mse, w_gp
        self.noise_dim = noise_dim
        self.gp_terms = gp_terms
        self.music_encoder_impl = music_encoder_impl
        self.sync_encoder_impl = sync_encoder_impl
        # reference `--train_music_encoder` (`M2SGAN_train.py:63-64,179`):
        # unfreeze the (usually transferred) music encoder so generator
        # updates reach it.  Incompatible with the hoisted frozen-encoder
        # fast paths below.
        self.train_music_encoder = train_music_encoder
        if train_music_encoder and music_encoder_impl != "flax":
            raise ValueError(
                "music_encoder_impl='pallas' is an inference-only fast path "
                "for the FROZEN encoder; with train_music_encoder use "
                "music_conv_impl='pallas_train' (trainable packed kernels)"
            )
        # Cached frozen-encoder features, the stage-2 `cached_features`
        # design applied to the GAN stage: the reference re-runs the frozen
        # M2SNet music encoder on raw mel every step (`M2SGAN_train.py:55`
        # M2SNet.eval(); round-4 profile: that forward + its layout traffic
        # is over half the step at batch 55).  With the cache the batch
        # carries the precomputed (T30, 64) features; numerics are
        # bit-identical because everything trainable sits after the cache
        # boundary.
        self.cached_features = cached_features
        if cached_features and train_music_encoder:
            raise ValueError(
                "cached_features requires the frozen music encoder "
                "(train_music_encoder=False): a trainable encoder's output "
                "changes every update and cannot be precomputed"
            )
        # Same cache design for the OTHER frozen forward in the step: the
        # SyncLoss latents of REAL motion (the generator-loss target) depend
        # only on the data and the frozen M2SNet motion encoder, so the batch
        # can carry them precomputed — `(cond, real, real_latents)`.  The
        # fake-side latents (and their d(input) backward) stay on-device
        # every step, of course.  Cached per WINDOW, not sliced from a
        # full-clip encode: the ST-GCN's temporal receptive field makes
        # window-encode != clip-encode-then-slice near window borders
        # (`data/feature_cache.py:precompute_sync_latents`).
        self.cached_sync_latents = cached_sync_latents
        self.G = Generator(
            freeze_music_encoder=not train_music_encoder,
            music_conv_impl=music_conv_impl,
            dtype=jnp.dtype(compute_dtype),
        )
        self.D = Discriminator1DCNN()
        # frozen perceptual net: like the stage-2 feature loss, its matmuls
        # sit on the generator-step critical path, so bf16 is offered as an
        # opt-in (f32 default keeps reference-exact numerics)
        self.sync_encoder = MotionEncoderSTGCN(dtype=jnp.dtype(sync_encoder_dtype))
        self.g_tx = optax.rmsprop(lr, decay=0.99, eps=1e-8)
        self.d_tx = optax.rmsprop(lr, decay=0.99, eps=1e-8)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._sync_pack_cache = None

    def init_state(
        self,
        rng: jax.Array,
        *,
        m2snet_music_params: Any = None,
        m2snet_music_stats: Any = None,
        m2snet_motion_variables: Any = None,
    ) -> GANState:
        S = self.sample_length
        mel = jnp.zeros((2, S * 90, 128))
        motion = jnp.zeros((2, S * 30, 13, 2))
        noise = jnp.zeros((2, S, self.noise_dim))
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        g_vars = self.G.init(g_rng, mel, noise)
        d_vars = self.D.init(d_rng, motion)

        g_params = g_vars["params"]
        g_stats = g_vars.get("batch_stats", {})
        if m2snet_music_params is not None:
            # transfer the stage-1 music encoder (`M2SGAN_train.py:61-62`)
            g_params = flax.core.unfreeze(g_params)
            g_params["music_encoder"] = m2snet_music_params
            if m2snet_music_stats is not None:
                g_stats = flax.core.unfreeze(g_stats)
                g_stats["music_encoder"] = m2snet_music_stats

        if m2snet_motion_variables is None:
            sync_vars = self.sync_encoder.init(s_rng, motion)
        else:
            sync_vars = m2snet_motion_variables

        return GANState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_batch_stats=g_stats,
            d_params=d_vars["params"],
            g_opt=self.g_tx.init(g_params),
            d_opt=self.d_tx.init(d_vars["params"]),
            sync_variables=sync_vars,
        )

    # ------------------------------------------------------------------ loss

    def _gradient_penalty(self, d_params, real, fake, rng):
        """WGAN-GP via the shared loss library; default term 'real_fake'
        (`M2SGAN_train.py:99-100`), all five terms available via `gp_terms`."""
        return losses.gradient_penalty(
            lambda x: self.D.apply({"params": d_params}, x),
            real, fake, rng, terms=self.gp_terms,
        )

    def _music_features(self, g_vars, mel):
        """One frozen-encoder forward per step, shared by the fake pass and
        the generator-loss pass (the encoder is transferred + frozen,
        `M2SGAN_train.py:61-64`, so its output is identical in both).  The
        optional Pallas path runs the fused bf16 conv kernels — legal
        because the branch is inference-only."""
        if self.music_encoder_impl == "pallas":
            from ..models.music_encoder import FusedMusicEncoder

            enc = FusedMusicEncoder({
                "params": g_vars["params"]["music_encoder"],
                "batch_stats": g_vars["batch_stats"]["music_encoder"],
            })
            return jax.lax.stop_gradient(enc(mel))
        return jax.lax.stop_gradient(
            self.G.apply(g_vars, mel, method=self.G.encode_music)
        )

    def _train_step_impl(self, state: GANState, batch, rng: jax.Array,
                         sync_pack=None):
        if self.cached_sync_latents:
            mel, real, rf_cached = batch
            rf_cached = jax.lax.stop_gradient(rf_cached)
        else:
            mel, real = batch
            rf_cached = None
        B = real.shape[0]
        step_rng = jax.random.fold_in(rng, state.step)
        noise_rng, gp_rng = jax.random.split(step_rng)
        noise = jax.random.normal(noise_rng, (B, self.sample_length, self.noise_dim))

        # one fake, reused for all critic iterations (`M2SGAN_train.py:85-103`)
        g_vars = {"params": state.g_params, "batch_stats": state.g_batch_stats}
        if self.train_music_encoder:
            hx = None  # no hoisting: encoder output depends on g_params
            fake_detached = jax.lax.stop_gradient(
                self.G.apply(g_vars, mel, noise, False)
            )
        else:
            # with cached_features the batch's first element IS the frozen
            # encoder output (B, T30, 64) — see __init__
            hx = (
                jax.lax.stop_gradient(mel) if self.cached_features
                else self._music_features(g_vars, mel)
            )
            fake_detached = jax.lax.stop_gradient(
                self.G.apply(g_vars, hx, noise, False, method=self.G.decode)
            )

        # ---- critic: `critic_iters` updates -------------------------------
        def d_loss_fn(d_params, gp_key):
            real_out = self.D.apply({"params": d_params}, real)
            fake_out = self.D.apply({"params": d_params}, fake_detached)
            gp = self._gradient_penalty(d_params, real, fake_detached, gp_key)
            loss = -real_out.mean() + fake_out.mean() + self.w_gp * gp
            return loss, (real_out.mean(), fake_out.mean(), gp)

        def critic_body(i, carry):
            d_params, d_opt, _ = carry
            key = jax.random.fold_in(gp_rng, i)
            grads, aux = jax.grad(d_loss_fn, has_aux=True)(d_params, key)
            updates, d_opt = self.d_tx.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            return d_params, d_opt, aux

        init_aux = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        d_params, d_opt, (real_m, fake_m, gp) = jax.lax.fori_loop(
            0, self.critic_iters, critic_body, (state.d_params, state.d_opt, init_aux)
        )

        # ---- generator -----------------------------------------------------
        def g_loss_fn(g_params):
            if self.train_music_encoder:
                out, mut = self.G.apply(
                    {"params": g_params, "batch_stats": state.g_batch_stats},
                    mel, noise, True, mutable=["batch_stats"],
                )
            else:
                out, mut = self.G.apply(
                    {"params": g_params, "batch_stats": state.g_batch_stats},
                    hx, noise, True, mutable=["batch_stats"],
                    method=self.G.decode,
                )
            adv = -self.D.apply({"params": d_params}, out).mean()
            sync = self._sync_loss(
                state.sync_variables, out, real, rf_cached, sync_pack
            )
            mse = ((out - real) ** 2).mean()
            loss = self.w_adv * adv + self.w_sync * sync + self.w_mse * mse
            return loss, (mut["batch_stats"], adv, sync, mse)

        grads, (g_stats, adv, sync, mse) = jax.grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        updates, g_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)

        metrics = {
            "w_distance": real_m - fake_m,
            "gp": gp,
            "loss_adv": adv,
            "loss_sync": sync,
            "loss_mse": mse,
        }
        return (
            state.replace(
                step=state.step + 1,
                g_params=g_params, g_batch_stats=g_stats,
                d_params=d_params, g_opt=g_opt, d_opt=d_opt,
            ),
            metrics,
        )

    def sync_latent_fn(self, sync_vars, pack=None):
        """motion (B, T30, 13, 2) -> frozen SyncLoss latents (B, T30, 64) —
        the exact function the in-step rf path runs (so a precomputed cache
        reproduces the uncached numerics).  sync_encoder_impl='pallas' runs
        the whole frozen ST-GCN as fused fwd/bwd kernels
        (`ops/pallas_stgcn.py`); ``pack`` supplies prebuilt packed weights
        (the jitted step hands the hoisted `_sync_pack`), else they are
        packed here."""
        if self.sync_encoder_impl == "pallas":
            from ..models.graph import build_adjacency
            from ..ops.pallas_stgcn import fused_frozen_stgcn, pack_frozen_stgcn

            mx = jnp.dtype(self.sync_encoder.dtype)
            if pack is None:
                pack = pack_frozen_stgcn(
                    sync_vars, build_adjacency("ConductorMotionX", "uniform"),
                    mxu_dtype=mx,
                )
            return lambda motion: fused_frozen_stgcn(motion, pack, mx)
        return lambda motion: self.sync_encoder.apply(sync_vars, motion)

    def _sync_pack(self, state: GANState):
        """Packed frozen SyncLoss ST-GCN weights, built ONCE outside the
        jitted step (same hoist as `DDPMTrainer._feat_pack`: the encoder is
        frozen, so packing inside the jit re-ran a constant
        einsum/tile/update-slice chain every step).  Any restore or swap of
        ``sync_variables`` on an already-stepped trainer must call
        `reset_caches()` (the CLI checkpoint-restore path does)."""
        if self.sync_encoder_impl != "pallas":
            return None
        if self._sync_pack_cache is None:
            from ..models.graph import build_adjacency
            from ..ops.pallas_stgcn import pack_frozen_stgcn

            self._sync_pack_cache = pack_frozen_stgcn(
                state.sync_variables,
                build_adjacency("ConductorMotionX", "uniform"),
                mxu_dtype=jnp.dtype(self.sync_encoder.dtype),
            )
        return self._sync_pack_cache

    def reset_caches(self) -> None:
        """Drop derived-weight caches (packed frozen encoders).  Call after
        swapping frozen subtrees on an already-stepped trainer."""
        self._sync_pack_cache = None

    def _sync_loss(self, sync_vars, fake, real, rf_cached=None, pack=None):
        """L1 between frozen motion-encoder latents (`utils/loss.py:30-46`).
        Plain __call__ == features()[-1] without the 11 intermediate maps.
        ``rf_cached``: precomputed real-motion latents (cached_sync_latents);
        the cache stores f32 of whatever the latent fn produced, so casting
        back to ff's dtype is exact."""
        latent = self.sync_latent_fn(sync_vars, pack)
        ff = latent(fake)
        if rf_cached is not None:
            rf = rf_cached.astype(ff.dtype)
        else:
            rf = jax.lax.stop_gradient(latent(jax.lax.stop_gradient(real)))
        return jnp.abs(ff - rf).mean()

    def train_step(self, state: GANState, batch, rng: jax.Array):
        """batch = (cond, real_motion (B, S*30, 13, 2)[, real_latents]):
        cond is mel (B, S*90, 128), or the precomputed frozen-encoder
        features (B, S*30, 64) under cached_features; real_latents
        (B, S*30, 64) is required (only) under cached_sync_latents."""
        return self._train_step(state, batch, rng, self._sync_pack(state))

    def generate(self, state: GANState, cond: jnp.ndarray, rng: jax.Array,
                 *, from_features: bool = False):
        """cond = mel (B, S*90, 128), or precomputed frozen-encoder features
        (B, S*30, 64) with ``from_features=True`` (the cached-features
        training loop's plotting path hands those)."""
        B = cond.shape[0]
        noise = jax.random.normal(rng, (B, self.sample_length, self.noise_dim))
        g_vars = {"params": state.g_params, "batch_stats": state.g_batch_stats}
        if from_features:
            return self.G.apply(g_vars, cond, noise, False, method=self.G.decode)
        return self.G.apply(g_vars, cond, noise, False)
