from .linear_attention import (  # noqa: F401
    linear_attention,
    qk_softmax,
    quadratic_self_attention,
    temporal_linear_attention,
)
from .pallas_attention import fused_linear_attention  # noqa: F401
