"""Deterministic synthesis of torch-format state dicts from a key manifest.

The golden-parity fixtures (tests/fixtures/torch_*.npz) do NOT commit the
weights themselves: they commit the state-dict *manifest* (key names +
shapes, taken from the real reference model) plus torch activations recorded
on weights synthesized by this module.  The test re-synthesizes the identical
weights from the manifest (numpy RandomState is bit-stable by API contract),
runs them through the importer + flax model, and compares against the
recorded torch activations — so a few hundred KB of fixtures pin full
cross-framework numeric parity.

Rules (must stay in lockstep between fixture generation and tests — any
change invalidates committed fixtures):

- keys are processed in sorted order, one RandomState stream;
- ``running_var`` / BN ``weight`` draw uniform(0.5, 1.5) (positive, far from
  the 0/1 defaults so a mean/var/scale mix-up shows);
- ``num_batches_tracked`` is a constant 0 (unused in eval);
- keys ending in ``.A`` (the ST-GCN adjacency buffer, `ST_GCN.py:39-40`)
  take the true `build_adjacency` value — the graph is data, not a weight;
- everything else draws normal(0, 0.2).
"""

from __future__ import annotations

import json

import numpy as np


def synth_state_dict(
    manifest: dict[str, tuple[int, ...]], seed: int = 0
) -> dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    out: dict[str, np.ndarray] = {}
    for key in sorted(manifest):
        shape = tuple(manifest[key])
        base = key.rsplit(".", 1)[-1]
        if key.endswith(".A") or key.endswith("st_gcn.A"):
            from ..models.graph import build_adjacency

            a = build_adjacency("ConductorMotionX", "uniform").astype(np.float32)
            assert a.shape == shape, (key, a.shape, shape)
            out[key] = a
        elif base == "num_batches_tracked":
            out[key] = np.zeros(shape, np.int64)
        elif base in ("running_var",) or (
            base == "weight" and key.endswith((".1.weight",)) and len(shape) == 1
        ):
            # 1-D `.1.weight` keys are BatchNorm/LayerNorm scales in every
            # reference module (Sequential index 1 after a conv/linear)
            out[key] = rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
        else:
            # std 0.05 keeps deep-stack activations O(1-10): synthetic weights
            # are worse-conditioned than trained ones, and exploding
            # magnitudes turn f32 reduction-order noise into false failures
            out[key] = rng.normal(0.0, 0.05, size=shape).astype(np.float32)
    return out


def manifest_to_json(manifest: dict[str, tuple[int, ...]]) -> str:
    return json.dumps({k: list(v) for k, v in manifest.items()}, sort_keys=True)


def manifest_from_json(s: str | bytes) -> dict[str, tuple[int, ...]]:
    return {k: tuple(v) for k, v in json.loads(s).items()}
