"""Stage-1 contrastive trainer: M2SNet sync learning.

Rebuild of reference `Contrastive_Stage/M2SNet_train.py:35-180` as one jitted
step: pair sampling (easy/hard/super_hard) happens *inside* the step via
`conductor_tpu.data.pairs`, the four M2SNet forwards and the 4-term BCE run
fused, and data parallelism is batch sharding (replacing
`torch.nn.DataParallel`, `M2SNet_train.py:60`).

Loss (`M2SNet_train.py:92-96`): BCE of per-sample mean sync probability,
pred_11 -> 1, pred_12 -> 0, pred_22 -> 1, pred_21 -> 0.  Adam lr 1e-3.
Epoch 0 always trains with easy negatives (`:81-86`); the caller selects the
strategy per epoch.  `hard_test` mode (training on the test split to obtain
the MPE measuring network, `:119-124`) is the same step on a different split.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from ..data.pairs import STRATEGIES, build_pairs
from ..models import M2SNet


class M2SNetState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class M2SNetTrainer:
    def __init__(
        self,
        sample_length: int = 30,
        clip_length: int = 10,
        lr: float = 1e-3,
        latent_dim: int = 64,
        compute_dtype: str = "auto",
        share_encodes: bool = False,
        remat: bool = False,
        microbatch: int = 1,
        music_conv_impl: str = "auto",
    ):
        """``compute_dtype="bfloat16"`` runs the conv encoders in bf16
        (params/BN stats stay f32); ``music_conv_impl="pallas_train"`` runs
        the music-encoder conv stages as packed trainable Pallas kernels
        (`ops/conv_train.py`).  Both default to "auto": the fast path on
        TPU, the reference-exact lax/f32 path elsewhere — pass explicit
        "float32"/"lax" (CLI: --faithful) for byte-exact reference numerics
        on TPU.  ``share_encodes=True`` encodes each distinct music/motion
        ONCE per step and fuses the 4 pair combinations from the latents —
        the reference re-encodes per pair (`M2SNet_train.py:88-91`), so its
        BN running stats see 4 sequential updates/step instead of 2; that
        changes BN batch composition, so it stays opt-in.  In eval mode
        (frozen BN stats) shared and unshared forwards are identical
        (`test_stage1.test_share_encodes_eval_parity`)."""
        from ..config import resolve_impl

        compute_dtype = resolve_impl(compute_dtype, "bfloat16", "float32")
        music_conv_impl = resolve_impl(music_conv_impl, "pallas_train", "lax")
        # ``remat=True`` wraps each encoder forward in `jax.checkpoint`: the
        # backward pass recomputes the conv activations instead of keeping
        # them resident.  The music-encoder temps are the HBM hot spot — XLA
        # lane-pads the NHWC conv maps 4-8x (C < 128 lanes; measured: f32
        # batch 32 x 30 s needs 17.9G without further chunking).  Same math,
        # ~1.3x step FLOPs; loss parity (and grad parity up to float
        # reassociation) pinned in `test_stage1.test_remat_step_parity`.
        # Combine with ``microbatch`` (below) for the exact-f32 big-batch
        # configs.
        # ``microbatch=k`` splits each step into k grad-accumulation chunks
        # (pairs are built over the FULL batch first, then chunked): the
        # lane-padded conv temps scale with the live chunk, so peak HBM drops
        # ~k-fold; gradients are the exact full-batch mean.  BatchNorm batch
        # statistics are computed per chunk (B/k clips) — the same
        # granularity the reference gets from `torch.nn.DataParallel` over k
        # GPUs (`M2SNet_train.py:60`, per-replica BN), and the running stats
        # chain across all chunks (torch DP keeps only replica 0's).
        self.sample_length = sample_length
        self.clip_length = clip_length
        self.share_encodes = share_encodes
        self.remat = remat
        self.microbatch = microbatch
        self.model = M2SNet(
            latent_dim=latent_dim, dtype=jnp.dtype(compute_dtype),
            music_conv_impl=music_conv_impl,
        )
        self.tx = optax.adam(lr)

        def encode_train(params, stats, mel, mot):
            return self.model.apply(
                {"params": params, "batch_stats": stats}, mel, mot, True,
                method=self.model.encode, mutable=["batch_stats"],
            )

        def apply_train(params, stats, mel, mot):
            return self.model.apply(
                {"params": params, "batch_stats": stats}, mel, mot, True,
                mutable=["batch_stats"],
            )

        if remat:
            encode_train = jax.checkpoint(encode_train)
            apply_train = jax.checkpoint(apply_train)
        self._encode_train = encode_train
        self._apply_train = apply_train
        self._steps = {
            s: jax.jit(partial(self._train_step_impl, strategy=s), donate_argnums=(0,))
            for s in STRATEGIES
        }
        self._acc = jax.jit(partial(self._accuracy_impl))

    def init_state(self, rng: jax.Array) -> M2SNetState:
        c30 = self.clip_length * 30
        mel = jnp.zeros((2, c30 * 3, 128))
        motion = jnp.zeros((2, c30, 13, 2))
        variables = self.model.init(rng, mel, motion)
        return M2SNetState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
        )

    # ----------------------------------------------------------------- step

    def _forward4(self, params, batch_stats, pairs, train: bool):
        """Four M2SNet passes, chaining BN running stats like the reference's
        sequential calls (`M2SNet_train.py:88-91`).  With ``share_encodes``
        each distinct music/motion is encoded once (halving encoder work)
        and the four predictions come from latent-space fusion."""
        m1, m2, p1, p2 = pairs
        stats = batch_stats
        if self.share_encodes:
            lat = {}
            for key, mel, mot in (("1", m1, p1), ("2", m2, p2)):
                if train:
                    (hx, hy), mut = self._encode_train(params, stats, mel, mot)
                    stats = mut["batch_stats"]
                else:
                    hx, hy = self.model.apply(
                        {"params": params, "batch_stats": stats}, mel, mot,
                        False, method=self.model.encode,
                    )
                lat[f"x{key}"], lat[f"y{key}"] = hx, hy
            preds = [
                self.model.apply(
                    {"params": params, "batch_stats": stats},
                    lat[a], lat[b], method=self.model.fuse,
                )
                for a, b in (("x1", "y1"), ("x1", "y2"), ("x2", "y2"), ("x2", "y1"))
            ]
            return preds, stats
        preds = []
        for mel, mot in ((m1, p1), (m1, p2), (m2, p2), (m2, p1)):
            if train:
                out, mut = self._apply_train(params, stats, mel, mot)
                stats = mut["batch_stats"]
            else:
                out = self.model.apply(
                    {"params": params, "batch_stats": stats}, mel, mot, False
                )
            preds.append(out)
        return preds, stats

    @staticmethod
    def _bce(pred: jnp.ndarray, target: float) -> jnp.ndarray:
        p = jnp.clip(pred.mean(axis=1), 1e-7, 1 - 1e-7)  # per-sample mean prob
        t = jnp.full_like(p, target)
        return -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p)).mean()

    def _train_step_impl(self, state: M2SNetState, batch, rng, *, strategy: str):
        music, motion = batch
        pair_rng = jax.random.fold_in(rng, state.step)
        pairs = build_pairs(
            pair_rng, music, motion, strategy, self.sample_length, self.clip_length
        )

        def loss_fn(params, in_stats, chunk):
            (p11, p12, p22, p21), stats = self._forward4(
                params, in_stats, chunk, train=True
            )
            loss = (
                self._bce(p11, 1.0) + self._bce(p12, 0.0)
                + self._bce(p22, 1.0) + self._bce(p21, 0.0)
            )
            B = p11.shape[0]
            tp = (p11 > 0.5).sum()
            tf = (p12 < 0.5).sum()
            acc = (tp + tf) / (B * self.clip_length * 2 * 30)
            metrics = {
                "loss": loss,
                "accuracy": acc,
                "sync_prob": p11.mean(),
                "non_sync_prob": p12.mean(),
            }
            return loss, (stats, metrics)

        k = self.microbatch
        if k == 1:
            grads, (stats, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, pairs
            )
        else:
            B = music.shape[0]
            if B % k:
                raise ValueError(f"batch {B} not divisible by microbatch {k}")
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape(k, B // k, *x.shape[1:]), pairs
            )

            def body(carry, chunk):
                stats, gsum, msum = carry
                grads, (stats, metrics) = jax.grad(loss_fn, has_aux=True)(
                    state.params, stats, chunk
                )
                gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
                msum = jax.tree_util.tree_map(jnp.add, msum, metrics)
                return (stats, gsum, msum), None

            zeros_like = lambda t: jax.tree_util.tree_map(
                lambda x: jnp.zeros(jnp.shape(x), jnp.result_type(x)), t
            )
            g0 = zeros_like(state.params)
            # metrics carry init derived from loss_fn itself (eval_shape is
            # trace-only) so new metrics keys can't desync the scan carry
            chunk0 = jax.tree_util.tree_map(lambda x: x[0], chunks)
            _, (_, m_shape) = jax.eval_shape(
                loss_fn, state.params, state.batch_stats, chunk0
            )
            m0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), m_shape
            )
            (stats, gsum, msum), _ = jax.lax.scan(
                body, (state.batch_stats, g0, m0), chunks
            )
            # equal chunk sizes: the mean of per-chunk mean-reduced losses /
            # grads IS the full-batch mean
            grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
            metrics = jax.tree_util.tree_map(lambda m: m / k, msum)

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=params,
                batch_stats=stats, opt_state=opt_state,
            ),
            metrics,
        )

    def train_step(self, state, batch, rng, strategy: str = "hard"):
        """batch = (music (B, S*90, 128), motion (B, S*30, 13, 2))."""
        return self._steps[strategy](state, batch, rng)

    # ----------------------------------------------------------------- eval

    def _accuracy_impl(self, state: M2SNetState, pairs):
        (p11, p12, p22, p21), _ = self._forward4(
            state.params, state.batch_stats, pairs, train=False
        )
        B = p11.shape[0]
        tp = (p11 > 0.5).sum()
        tf = (p12 < 0.5).sum()
        acc = (tp + tf) / (B * self.clip_length * 2 * 30)
        return {"accuracy": acc, "sync_prob": p11.mean(), "non_sync_prob": p12.mean()}

    def evaluate(self, state, batch, rng, strategy: str):
        """One eval batch at a given difficulty (`M2SNet_eval.py:34-121`)."""
        music, motion = batch
        pairs = build_pairs(
            rng, jnp.asarray(music), jnp.asarray(motion), strategy,
            self.sample_length, self.clip_length,
        )
        return {k: float(v) for k, v in self._accuracy_impl(state, pairs).items()}

    # ----------------------------------------------------- BN recalibration

    def recalibrate_batch_stats(self, state: M2SNetState, batches) -> M2SNetState:
        """Precise-BN: replace the momentum-lagged running statistics with
        the aggregate batch statistics over a calibration set.

        Short runs leave BatchNorm running stats (momentum 0.99) far from
        the activation distribution the trained weights produce, so
        eval-mode accuracy sits at chance while train-mode accuracy is high
        — the reference inherits the same torch-BN lag and simply trains
        long enough (~36 h) to hide it.  Each train-mode forward exposes the
        exact per-batch statistics through the running-stat update
        (batch_stat = (new - m*old) / (1-m)); aggregating them the
        precise-BN way (mean of means; E[var_i + mu_i^2] - global_mean^2)
        gives running stats consistent with one full-calibration-set batch.
        """
        momentum = 0.99  # flax nn.BatchNorm / _PackedBatchNorm default
        old = state.batch_stats
        if not hasattr(self, "_recal_fwd"):
            # one jitted train-mode forward returning the recovered batch
            # statistics (un-jitted apply dispatches op-by-op — pathological
            # over a remote-TPU link)
            def _fwd(params, stats, mel, mot):
                _, mut = self.model.apply(
                    {"params": params, "batch_stats": stats}, mel, mot, True,
                    mutable=["batch_stats"],
                )
                return jax.tree_util.tree_map(
                    lambda new, o: (new - momentum * o) / (1.0 - momentum),
                    mut["batch_stats"], stats,
                )
            self._recal_fwd = jax.jit(_fwd)
        recovered = []
        for batch in batches:
            music, motion = batch
            recovered.append(self._recal_fwd(
                state.params, old, jnp.asarray(music), jnp.asarray(motion)
            ))

        def agg(nodes):
            first = nodes[0]
            if hasattr(first, "keys"):
                if set(first.keys()) == {"mean", "var"}:
                    n = len(nodes)
                    mean = sum(s["mean"] for s in nodes) / n
                    e2 = sum(s["var"] + s["mean"] ** 2 for s in nodes) / n
                    return {"mean": mean, "var": jnp.maximum(e2 - mean**2, 0.0)}
                return {k: agg([s[k] for s in nodes]) for k in first.keys()}
            return sum(nodes) / len(nodes)

        return state.replace(batch_stats=agg(recovered))
