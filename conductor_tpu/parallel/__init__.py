from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
from .context import cp_linear_attention  # noqa: F401
