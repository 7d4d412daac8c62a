"""PyTorch-checkpoint interop: import reference-format weights into flax.

The reference publishes stage-1 checkpoints as raw ``state_dict`` ``.pt``
files (optionally with a DataParallel ``module.`` prefix,
`Contrastive_Stage/M2SNet_eval.py:118-119`) and stage-2 checkpoints as tar
dicts ``{encoder, opt_encoder, ep, total_it}``
(`Diffusion_Stage/trainers/ddpm_trainer.py:290-319`).  This package maps
those trees weight-for-weight onto the flax module trees, so published
reference weights run on TPU unchanged.
"""

from .torch_export import (
    export_m2snet,
    export_motion_encoder,
    export_motion_transformer,
    export_music_encoder,
    save_diffusion_tar,
    save_torch_state_dict,
)
from .torch_import import (
    import_m2snet,
    import_motion_encoder,
    import_motion_transformer,
    import_music_encoder,
    load_diffusion_tar,
    load_torch_state_dict,
    music_encoder_from_m2snet,
    strip_module_prefix,
)

__all__ = [
    "export_m2snet",
    "export_motion_encoder",
    "export_motion_transformer",
    "export_music_encoder",
    "import_m2snet",
    "import_motion_encoder",
    "import_motion_transformer",
    "import_music_encoder",
    "load_diffusion_tar",
    "load_torch_state_dict",
    "music_encoder_from_m2snet",
    "save_diffusion_tar",
    "save_torch_state_dict",
    "strip_module_prefix",
]
