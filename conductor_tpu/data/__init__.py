from .dataset import (  # noqa: F401
    BatchIterator,
    ClipIndex,
    ConductorMotionDataset,
    make_synthetic_dataset,
    scan_split,
)
from .mel import extract_mel_feature, mel_filterbank, melspectrogram  # noqa: F401
from .pairs import build_pairs  # noqa: F401
