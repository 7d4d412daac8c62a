"""Reflect-padded 3x3 conv as full-width halo matmuls — trainable, plain jnp.

The music encoder's conv stages run 1-32 channels at full (T90, 128-mel)
resolution: an XLA conv fills 16/128 MXU lanes and is the M2SNet training
bottleneck (measured: the encoder fwd+bwd is ~85 % of the 170 ms step).
`ops/pallas_conv.py` already reformulates the conv as lane-filling matmuls
for the frozen/inference paths; this module is the SAME formulation
(including `build_wbig`'s halo weight layout) written in differentiable
jnp, so `jax.grad` produces the backward for free.

MEASURED RESULT (v5e, M2SNet step B=10 x 30 s): NEUTRAL-TO-SLOWER — 170 ->
192 ms (bf16+share_encodes), 466 -> 512 ms (f32).  The step is NOT
MXU-bound: profiling (NOTES.md "M2SNet encoder profile") shows XLA stores
these C=16/32 NHWC arrays with C in the minor/lane dim (8x HBM tile
padding), so pool backward (31 %), BN stat reductions (19 %) and the
pad/elementwise fusions dominate; swapping the conv for matmuls adds
traffic without touching any of that.  Kept as an opt-in: the param-tree
compatibility and halo assembly here are the tested groundwork for FUSED
training kernels (the actual fix — the inference kernels already prove
~8x on the forward), and other backends lay out small-C convs
differently.  Design notes:

- frequency is split into blocks of G with G*Cin ≈ 128; the kernel halo
  layout turns the 3x3 conv into three (T-shifted) dot_generals of
  z (B, T, F/G, (G+2)*Cin) against Wbig (3, (G+2)*Cin, G*Cout);
- the (G+2)/3 flop inflation buys ~8x lane utilization — net win measured
  on v5e (see README / NOTES);
- Cin == 1 (the very first conv) stays a plain lax conv: its contraction
  is 9 flops/output and a G=128 halo build would bloat the trace.

`HaloConv` is a drop-in for the `nn.Conv(features, (3, 3), padding=VALID)`
on reflect-padded input used by `Conv2dResBlock`: same parameter names
("kernel" HWIO, "bias") and initializers, so checkpoints (and the torch
importers) are interchangeable between impls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pallas_conv import build_wbig


def pick_group(f: int, cin: int) -> int:
    """Frequency block size: G*Cin ~ 128 lanes, G | F."""
    g = max(1, 128 // max(cin, 1))
    while g > 1 and f % g:
        g //= 2
    return g


def halo_conv3x3_reflect(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """x (B, T, F, Cin), kernel (3, 3, Cin, Cout) HWIO -> (B, T, F, Cout);
    numerically a reflect-padded VALID 3x3 conv (up to float reassociation)."""
    B, T, F, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    if cin == 1:
        return (
            jax.lax.conv_general_dilated(
                xp.astype(dtype), kernel.astype(dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias.astype(dtype)
        )

    g = pick_group(F, cin)
    wbig = build_wbig(kernel.astype(dtype), g)  # (3, (G+2)*Cin, G*Cout)
    xp = xp.astype(dtype)
    nf = F // g
    z = jnp.stack(
        [xp[:, :, fb * g : fb * g + g + 2, :] for fb in range(nf)], axis=2
    ).reshape(B, T + 2, nf, (g + 2) * cin)
    y = None
    for dt in range(3):
        term = jax.lax.dot_general(
            z[:, dt : dt + T], wbig[dt], (((3,), (0,)), ((), ()))
        )
        y = term if y is None else y + term
    return y.reshape(B, T, F, cout) + bias.astype(dtype)


class HaloConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), padding="VALID")`` applied to
    reflect-padded input (the pad happens INSIDE, unlike the nn.Conv path
    where the caller pads): identical param tree, halo-matmul compute."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return halo_conv3x3_reflect(x, kernel, bias, dtype=self.dtype)
