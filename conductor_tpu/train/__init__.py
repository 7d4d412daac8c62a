from .checkpoints import CheckpointManager  # noqa: F401
from .ddpm_trainer import DDPMTrainer, TrainState, make_denoiser  # noqa: F401
from .m2sgan_trainer import GANState, M2SGANTrainer  # noqa: F401
from .m2snet_trainer import M2SNetState, M2SNetTrainer  # noqa: F401
