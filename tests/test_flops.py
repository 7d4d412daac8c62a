"""Sanity-pins for the analytic MFU FLOP counts (utils/flops.py)."""

import numpy as np

from conductor_tpu.config import Config
from conductor_tpu.utils.flops import (
    PEAK_BF16_FLOPS,
    PEAK_INT8_FLOPS,
    denoiser_forward_flops,
    sampling_mfu,
    train_step_mfu,
)


def test_step_flops_match_notes_derivation():
    """NOTES.md's round-2 hand count: the AdaLN modulation matmul is
    ~11.3 GFLOP of a ~16.5-17.5 GFLOP sampling step at B=1, T=1800
    (8 layers x 2*1800*512*768)."""
    cfg = Config()
    fl = denoiser_forward_flops(cfg, batch=1, t30=1800)
    assert abs(fl.adaln - 8 * 2 * 1800 * 512 * 768) < 1e-6
    np.testing.assert_allclose(fl.adaln / 1e9, 11.3, rtol=0.02)
    assert 15e9 < fl.total < 19e9
    # FLOPs scale linearly in batch and time
    fl2 = denoiser_forward_flops(cfg, batch=4, t30=900)
    np.testing.assert_allclose(fl2.total, 2.0 * fl.total)


def test_mfu_prices_int8_adaln_at_int8_peak():
    """Running at exactly the weighted peak must report 100 % MFU, and the
    int8 configuration must NOT report a higher MFU than f32/bf16 for the
    same wall clock (quantization halves ideal AdaLN time, so it halves the
    credited efficiency, never inflates it)."""
    cfg = Config()
    fl = denoiser_forward_flops(cfg, batch=8, t30=1800)
    ideal_int8 = fl.adaln / PEAK_INT8_FLOPS + fl.other / PEAK_BF16_FLOPS
    out = sampling_mfu(cfg, 8, 1800, 1000, ideal_int8 * 1000, adaln_int8=True)
    np.testing.assert_allclose(out["mfu_pct"], 100.0, atol=0.1)

    same_sec = 1.0
    m_int8 = sampling_mfu(cfg, 8, 1800, 1000, same_sec, adaln_int8=True)
    m_bf16 = sampling_mfu(cfg, 8, 1800, 1000, same_sec, adaln_int8=False)
    assert m_int8["mfu_pct"] < m_bf16["mfu_pct"]
    assert m_int8["achieved_tflops"] == m_bf16["achieved_tflops"]


def test_multichip_normalization():
    """n_chips splits both achieved TFLOP/s and the MFU denominator: the
    same per-chip efficiency reports the same mfu_pct at any chip count."""
    cfg = Config()
    one = sampling_mfu(cfg, 8, 1800, 50, 0.5, n_chips=1)
    eight = sampling_mfu(cfg, 64, 1800, 50, 0.5, n_chips=8)
    np.testing.assert_allclose(one["mfu_pct"], eight["mfu_pct"], rtol=1e-6)
    np.testing.assert_allclose(
        one["achieved_tflops"], eight["achieved_tflops"], rtol=1e-6
    )


def test_train_step_mfu_is_3x_forward():
    cfg = Config()
    fwd = denoiser_forward_flops(cfg, 32, 900)
    out = train_step_mfu(cfg, 32, 900, seconds=0.025)
    np.testing.assert_allclose(
        out["achieved_tflops"], round(3 * fwd.total / 0.025 / 1e12, 1)
    )
