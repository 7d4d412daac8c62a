"""Reference ``opt.txt`` run-directory ingestion.

The reference's rank-0 writes every option as ``key: value`` lines to
``checkpoints/<dataset>/<name>/opt.txt`` (`options/base_options.py:72-89`)
and every downstream tool re-parses it with typed coercion
(`utils/get_opt.py:29-106`).  Checkpoints live beside it in ``model/``
(``latest.tar``, ``ckpt_e%03d.tar`` — `trainers/ddpm_trainer.py:329,363-369`).

`read_opt_txt` reproduces the coercion rules (bool words, float regex,
digit-string ints, everything else a string — plus `None` and scientific
notation, which the reference's regex misses even though `str(2e-05)`
round-trips through opt.txt); `resolve_run_dir` maps a reference run
directory to its (opt dict, tar path) so ``import_torch diffusion`` can
consume it verbatim.
"""

from __future__ import annotations

import os
import re

_FLOAT_RE = re.compile(r"^[-+]?[0-9]+\.[0-9]+$")
_SCI_RE = re.compile(r"^[-+]?[0-9](\.[0-9]+)?e[-+]?[0-9]+$")
_SKIP = ("------------ Options -------------", "-------------- End ----------------")


def _coerce(value: str):
    if value == "True":
        return True
    if value == "False":
        return False
    if value == "None":
        return None
    if _FLOAT_RE.match(value) or _SCI_RE.match(value):
        return float(value)
    if value.lstrip("-+").isdigit():
        return int(value)
    return value


def read_opt_txt(path: str) -> dict:
    """Parse an opt.txt into a typed dict (`utils/get_opt.py:36-49`)."""
    out: dict = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line in _SKIP or ": " not in line:
                continue
            key, value = line.split(": ", 1)
            out[key] = _coerce(value)
    return out


def resolve_run_dir(path: str, which_epoch: str = "latest") -> tuple[dict, str]:
    """Reference run dir -> (opt dict, checkpoint tar path).

    ``which_epoch``: "latest" or an epoch number (reference ``--which_epoch``;
    epoch checkpoints are ``model/ckpt_e%03d.tar``).
    """
    opt_path = os.path.join(path, "opt.txt")
    if not os.path.isfile(opt_path):
        raise FileNotFoundError(
            f"{path} is a directory but has no opt.txt — pass the tar file "
            "directly, or point at a reference run dir "
            "(checkpoints/<dataset>/<name>/)"
        )
    opt = read_opt_txt(opt_path)
    name = (
        "latest.tar" if which_epoch == "latest"
        else "ckpt_e%03d.tar" % int(which_epoch)
    )
    tar = os.path.join(path, "model", name)
    if not os.path.isfile(tar):
        raise FileNotFoundError(f"no checkpoint at {tar}")
    return opt, tar
