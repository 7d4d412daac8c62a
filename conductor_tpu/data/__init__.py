from .dataset import (  # noqa: F401
    BatchIterator,
    ClipIndex,
    ConductorMotionDataset,
    make_synthetic_dataset,
    scan_split,
)
