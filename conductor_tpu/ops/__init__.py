from .linear_attention import (  # noqa: F401
    linear_attention,
    qk_softmax,
    quadratic_self_attention,
)
