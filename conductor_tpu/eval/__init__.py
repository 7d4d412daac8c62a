from . import beat, metrics  # noqa: F401
from .evaluator import DiffusionEvaluator, EvalResult  # noqa: F401
