"""InternEvo-TPU: a TPU-native LLM pretraining framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of InternLM/InternEvo
(reference under /root/reference): hybrid-parallel pretraining of
InternLM/InternLM2/Llama2/MoE transformers driven by executable python configs.
"""

__version__ = "0.1.0"

from .core.config import Config, read_base
from .core.context import ParallelContext, ParallelMode, global_context, gpc


def initialize_distributed_env(*args, **kwargs):
    """Reference surface: ``internlm.initialize_distributed_env``."""
    from .initialize.launch import initialize_distributed_env as _f

    return _f(*args, **kwargs)


def launch_from_torch(config, seed: int = 1024, **kwargs):
    """Reference surface: ``internlm.launch_from_torch`` (env-driven launch)."""
    from .initialize.launch import launch

    return launch(config, seed=seed)


def initialize_trainer(model, params, opt_state, lr_scheduler, beta2_scheduler=None, **kwargs):
    """Reference surface: ``internlm.initialize_trainer``."""
    from .train.pipeline import initialize_trainer as _f

    return _f(model, params, opt_state, lr_scheduler, beta2_scheduler)


__all__ = [
    "Config",
    "read_base",
    "ParallelContext",
    "ParallelMode",
    "global_context",
    "gpc",
    "initialize_distributed_env",
    "launch_from_torch",
    "initialize_trainer",
]
