"""Legacy text-to-motion (HumanML3D/KIT) support inherited from MotionDiffuse.

The reference keeps the full t2m stack alongside the music path (SURVEY.md
D3/D13/D15): quaternion algebra, FK/IK skeleton, RIC motion features,
kinematic chains, GloVe word vectorizer, 3-D plotting, and the BiGRU
co-embedding evaluator models.  Rebuilt here as vmappable/jittable JAX ops
(quaternion/skeleton/features) and flax modules (evaluator nets).
"""

from . import param_util, quaternion  # noqa: F401
from .motion_process import (  # noqa: F401
    extract_ric_features,
    recover_from_ric,
    recover_from_rot,
    recover_root_rot_pos,
)
from .skeleton import Skeleton  # noqa: F401
from .word_vectorizer import POS_ENUMERATOR, WordVectorizer  # noqa: F401
