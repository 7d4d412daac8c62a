from .logging import MetricLogger, format_time  # noqa: F401
from .profiling import StepTimer, annotate, trace  # noqa: F401
