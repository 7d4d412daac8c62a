"""conductor-tpu: TPU-native music-driven conducting-motion generation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
viiika/Diffusion-Conductor (see SURVEY.md for the blueprint): contrastive
music-motion sync learning (M2SNet / M2SGAN) and x0-supervised motion
diffusion (MotionTransformer + DDIM), over ConductorMotion100.
"""

__version__ = "0.1.0"

from .config import Config, DatasetSpec, DenoiserConfig, DiffusionConfig, TrainConfig  # noqa: F401
