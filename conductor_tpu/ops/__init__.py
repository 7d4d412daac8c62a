from .linear_attention import (  # noqa: F401
    linear_attention,
    qk_softmax,
    quadratic_self_attention,
    temporal_linear_attention,
)
from .pallas_attention import fused_linear_attention  # noqa: F401
from .pallas_conv import fused_conv_block  # noqa: F401
from .pallas_layer import fused_decoder_layer  # noqa: F401
from .pallas_layer_bwd import fused_decoder_layer_train  # noqa: F401
from .pallas_pool import fused_max_pool  # noqa: F401
from .pallas_stgcn import fused_frozen_stgcn, pack_frozen_stgcn  # noqa: F401
