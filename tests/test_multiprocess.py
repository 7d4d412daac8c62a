"""Multi-process (DCN) batch-assembly parity — the one distributed branch a
single-process mesh cannot reach.

`shard_batch`'s `jax.make_array_from_process_local_data` path
(`conductor_tpu/parallel/mesh.py`) and `BatchIterator(host_shard=True)`'s
live `jax.process_index()` wiring only execute when `jax.process_count() >
1`, which needs real separate processes — so this test shells out to
`scripts/multiprocess_check.py`, which runs one stage-2 train step as
2 processes x 2 CPU devices (localhost `jax.distributed.initialize`) and as
a single 4-device process, asserting loss/grad-norm parity.  Matches the
reference's multi-process DDP semantics (`Diffusion_Stage/datasets/
dataloader.py:16-53`, `tools/train.py:64-69`).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SCRIPT = os.path.join(REPO, "scripts", "multiprocess_check.py")


@pytest.mark.slow
def test_two_process_loss_parity():
    proc = subprocess.run(
        [sys.executable, SCRIPT],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"multiprocess check failed:\n{proc.stdout}\n{proc.stderr}"
    )
    assert "multiprocess parity ok" in proc.stdout
