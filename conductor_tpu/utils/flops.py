"""Analytic FLOP counts for the hot surfaces, used to report MFU.

The sampling-step count enumerates the matmuls of one fused decoder layer
(`ops/pallas_layer.py::_layer_body` — the same math as the XLA path in
`models/transformer.py`):

  - the AdaLN modulation matmul, (T, E) @ (E, 6D)          [int8-eligible]
  - 12 (T, D) @ (D, D) matmuls: self q/k/v, the two segment-softmax
    normalizers, the (D, T)x(T, D) KV contraction, q_sm @ kv, cross q,
    qc_sm @ kvc, and the three stylization output projections
  - the FFN pair, (T, D) @ (D, F) and (T, F) @ (F, D)

Per-ladder one-offs (music encoding, DDIM prologue/epilogue, the joint
embed / output head) are < 1 % of a 1000-step ladder and are not counted —
the reported MFU is thereby a slight *under*estimate, never flattering.

Peaks are the v5e datasheet numbers; MFU is
``ideal_seconds / measured_seconds`` where ideal time prices each matmul at
the peak of the precision it actually runs at (int8 AdaLN at the int8 peak,
everything else at bf16).  NOTES.md "Sampling MFU investigation" derives
why the practical ceiling for this architecture sits well below 100 %:
at small D every matmul is on the serial dependency chain and ~12
serialized VPU stages per layer cannot hide.
"""

from __future__ import annotations

from dataclasses import dataclass

PEAK_BF16_FLOPS = 197e12  # v5e per chip
PEAK_INT8_FLOPS = 394e12


@dataclass(frozen=True)
class StepFlops:
    adaln: float  # int8-eligible modulation matmul FLOPs
    other: float  # everything else (bf16 MXU)

    @property
    def total(self) -> float:
        return self.adaln + self.other

    def ideal_seconds(self, *, adaln_int8: bool) -> float:
        adaln_peak = PEAK_INT8_FLOPS if adaln_int8 else PEAK_BF16_FLOPS
        return self.adaln / adaln_peak + self.other / PEAK_BF16_FLOPS


def denoiser_forward_flops(cfg, batch: int, t30: int) -> StepFlops:
    """Matmul FLOPs of one denoiser forward (== one sampling step) at
    batch x t30 motion frames, from the config's model dims."""
    d = cfg.denoiser.latent_dim
    e = cfg.denoiser.time_embed_dim
    f = cfg.denoiser.ff_size
    layers = cfg.denoiser.num_layers
    per_layer_adaln = 2.0 * t30 * e * (6 * d)
    per_layer_other = 2.0 * t30 * (12 * d * d + 2 * d * f)
    return StepFlops(
        adaln=batch * layers * per_layer_adaln,
        other=batch * layers * per_layer_other,
    )


def sampling_mfu(
    cfg, batch: int, t30: int, steps: int, seconds: float, *,
    n_chips: int = 1, adaln_int8: bool | None = None,
) -> dict:
    """{'achieved_tflops', 'mfu_pct'} for a measured ladder.

    ``achieved_tflops`` is per chip; ``mfu_pct`` prices the int8 AdaLN at
    the int8 peak so quantization cannot inflate the efficiency number.
    """
    if adaln_int8 is None:
        adaln_int8 = bool(getattr(cfg.denoiser, "sampler_adaln_int8", False))
    per_step = denoiser_forward_flops(cfg, batch, t30)
    total = per_step.total * steps
    ideal = per_step.ideal_seconds(adaln_int8=adaln_int8) * steps
    return {
        "achieved_tflops": round(total / seconds / n_chips / 1e12, 1),
        "mfu_pct": round(100.0 * ideal / (seconds * n_chips), 1),
    }


def train_step_mfu(cfg, batch: int, t30: int, seconds: float) -> dict:
    """MFU of a stage-2 train step: the standard fwd + bwd = 3x forward
    matmul FLOPs for the denoiser stack (the trainable path; the frozen
    perceptual ST-GCN and loss terms are small and uncounted, keeping the
    estimate conservative)."""
    fwd = denoiser_forward_flops(cfg, batch, t30)
    total = 3.0 * fwd.total
    ideal = 3.0 * fwd.ideal_seconds(adaln_int8=False)
    return {
        "achieved_tflops": round(total / seconds / 1e12, 1),
        "mfu_pct": round(100.0 * ideal / seconds, 1),
    }
