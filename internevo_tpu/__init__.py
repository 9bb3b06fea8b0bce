"""InternEvo-TPU: a TPU-native LLM pretraining framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of InternLM/InternEvo
(reference under /root/reference): hybrid-parallel pretraining of
InternLM/InternLM2/Llama2/MoE transformers driven by executable python configs.
"""

__version__ = "0.1.0"

from .core.config import Config, read_base
from .core.context import ParallelContext, ParallelMode, global_context, gpc

__all__ = [
    "Config",
    "read_base",
    "ParallelContext",
    "ParallelMode",
    "global_context",
    "gpc",
]
