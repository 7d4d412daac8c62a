"""flax -> torch export: exact round-trip against the reference manifests.

The committed fixtures carry the real reference models' state-dict manifests
(key names + shapes).  Export correctness is pinned two ways:

1. key-set identity: export(import(sd)) emits EXACTLY the manifest's keys;
2. value identity: every exported tensor equals the synthesized original
   (the layout transposes are exact inverses; ``num_batches_tracked`` is
   0 on both sides by the synthesis rules, and the adjacency buffer is
   reconstructed from `build_adjacency`, which
   `test_torch_import.test_adjacency_matches_reference` pins against the
   real reference buffer).
"""

import os

import numpy as np
import pytest

from conductor_tpu.interop.synth import manifest_from_json, synth_state_dict
from conductor_tpu.interop.torch_export import (
    export_m2snet,
    export_motion_transformer,
    save_diffusion_tar,
    save_torch_state_dict,
)
from conductor_tpu.interop.torch_import import (
    import_m2snet,
    import_motion_transformer,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    fx = np.load(os.path.join(FIXTURES, name))
    manifest = manifest_from_json(bytes(fx["manifest"]).decode())
    return manifest, synth_state_dict(manifest, seed=0)


def _assert_roundtrip(sd, exported):
    missing = sorted(set(sd) - set(exported))
    extra = sorted(set(exported) - set(sd))
    assert not missing and not extra, f"missing={missing[:5]} extra={extra[:5]}"
    for k in sd:
        assert tuple(exported[k].shape) == tuple(sd[k].shape), k
        if ".fcn." in k:
            # the reference ST_GCN's dead prediction head: never executed on
            # the M2S path, has no flax counterpart, exported zeroed — only
            # key presence + shape matter for strict load_state_dict
            continue
        np.testing.assert_allclose(
            np.asarray(exported[k], np.float32),
            np.asarray(sd[k], np.float32),
            atol=1e-6, err_msg=k,
        )


class TestM2SNetExport:
    def test_roundtrip_matches_manifest(self):
        manifest, sd = _load("torch_m2snet.npz")
        exported = export_m2snet(import_m2snet(sd))
        _assert_roundtrip(sd, exported)


class TestTransformerExport:
    def test_roundtrip_matches_manifest(self):
        manifest, sd = _load("torch_transformer.npz")
        exported = export_motion_transformer(import_motion_transformer(sd))
        _assert_roundtrip(sd, exported)

    def test_double_roundtrip_is_identity(self):
        """import(export(import(sd))) == import(sd) leaf-for-leaf."""
        import jax

        _, sd = _load("torch_transformer.npz")
        v1 = import_motion_transformer(sd)
        v2 = import_motion_transformer(export_motion_transformer(v1))
        la = jax.tree_util.tree_leaves_with_path(v1)
        lb = {tuple(str(p) for p in k): v
              for k, v in jax.tree_util.tree_leaves_with_path(v2)}
        for k, v in la:
            key = tuple(str(p) for p in k)
            np.testing.assert_allclose(lb[key], v, atol=1e-6, err_msg=str(key))


class TestTorchFileFormats:
    def test_pt_file_loads_in_torch(self, tmp_path):
        torch = pytest.importorskip("torch")
        _, sd = _load("torch_m2snet.npz")
        exported = export_m2snet(import_m2snet(sd))
        path = str(tmp_path / "M2SNet_export.pt")
        save_torch_state_dict(path, exported)
        back = torch.load(path, map_location="cpu", weights_only=True)
        assert set(back) == set(exported)
        np.testing.assert_allclose(
            back["fuse_layer.0.weight"].numpy(), exported["fuse_layer.0.weight"]
        )

    def test_tar_matches_reference_load_contract(self, tmp_path):
        """The exported tar satisfies what `DDPMTrainer.load`
        (`ddpm_trainer.py:303-319`) reads for BOTH is_train branches:
        ``encoder``, ``opt_encoder`` (loadable torch-Adam state dict with the
        right param-group arity), ``ep``, ``total_it``."""
        torch = pytest.importorskip("torch")
        _, sd = _load("torch_transformer.npz")
        exported = export_motion_transformer(import_motion_transformer(sd))
        path = str(tmp_path / "latest.tar")
        save_diffusion_tar(path, exported, ep=7, total_it=1234)
        obj = torch.load(path, map_location="cpu", weights_only=True)
        assert obj["ep"] == 7 and obj["total_it"] == 1234
        assert set(obj["encoder"]) == set(exported)
        n = len(obj["opt_encoder"]["param_groups"][0]["params"])
        n_params = sum(
            1 for k in exported
            if not k.endswith((".running_mean", ".running_var",
                               ".num_batches_tracked", ".A"))
        )
        assert n == n_params
        # an empty-state Adam dict must load into a real torch Adam over a
        # parameter list of that arity
        params = [torch.nn.Parameter(torch.zeros(2)) for _ in range(n)]
        opt = torch.optim.Adam(params, lr=1.0)
        opt.load_state_dict(obj["opt_encoder"])
        assert opt.param_groups[0]["lr"] == 2e-4


class TestExportCLI:
    def test_cli_roundtrip_m2snet(self, tmp_path):
        torch = pytest.importorskip("torch")
        from conductor_tpu.cli.export_torch import main as export_main
        from conductor_tpu.cli.import_torch import main as import_main

        _, sd = _load("torch_m2snet.npz")
        src = str(tmp_path / "M2SNet_last.pt")
        save_torch_state_dict(src, sd)
        run = str(tmp_path / "imported")
        import_main(["m2snet", "--input", src, "--output", run])
        out = str(tmp_path / "M2SNet_export.pt")
        export_main(["m2snet", "--run_dir", run, "--output", out])
        back = {k: v.numpy() for k, v in
                torch.load(out, map_location="cpu", weights_only=True).items()}
        _assert_roundtrip(sd, back)

    def test_cli_roundtrip_diffusion(self, tmp_path):
        torch = pytest.importorskip("torch")
        from conductor_tpu.cli.export_torch import main as export_main
        from conductor_tpu.cli.import_torch import main as import_main

        _, sd = _load("torch_transformer.npz")
        src = str(tmp_path / "latest.tar")
        torch.save(
            {"encoder": {k: torch.from_numpy(v) for k, v in sd.items()},
             "ep": 3, "total_it": 77},
            src,
        )
        run = str(tmp_path / "imported_run")
        import_main(["diffusion", "--input", src, "--output", run])
        out = str(tmp_path / "latest_export.tar")
        export_main(["diffusion", "--run_dir", run, "--output", out])
        obj = torch.load(out, map_location="cpu", weights_only=True)
        assert obj["ep"] == 3 and obj["total_it"] == 77
        back = {k: v.numpy() for k, v in obj["encoder"].items()}
        _assert_roundtrip(sd, back)
