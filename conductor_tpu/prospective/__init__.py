from .baselines import CNNLSTMGenerator, PlainGenerator  # noqa: F401
from .evaluator import ProspectiveEvaluator  # noqa: F401
from .unseen import cached_mel, generate_long  # noqa: F401
