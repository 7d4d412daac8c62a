from .generator import (  # noqa: F401
    Discriminator1DCNN,
    Generator,
    GeneratorCVPRLSTM,
    PoseDecoderBiLSTM,
    PoseDecoderTCN,
)
from .graph import build_adjacency  # noqa: F401
from .tcn import DilatedTCN, TemporalBlock  # noqa: F401
from .m2snet import M2SNet  # noqa: F401
from .music_encoder import MusicEncoder  # noqa: F401
from .stgcn import STGCN, MotionEncoderSTGCN  # noqa: F401
from .transformer import (  # noqa: F401
    MotionTransformer,
    generate_src_mask,
    guided_denoiser,
    timestep_embedding,
)
