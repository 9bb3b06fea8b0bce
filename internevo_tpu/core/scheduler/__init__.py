from .hooks import SchedulerHook, SchedulerMetricHook
from .no_pipeline import make_eval_step, make_train_step
from .pipeline import make_pipeline_train_step

__all__ = [
    "SchedulerHook",
    "SchedulerMetricHook",
    "make_eval_step",
    "make_train_step",
    "make_pipeline_train_step",
]
