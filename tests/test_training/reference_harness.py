"""Harness to run the REFERENCE InternEvo model on torch-cpu for parity tests.

The reference only supports cuda/npu accelerators; we inject a minimal CPU
accelerator module before importing it (study-only: no reference code is
copied, we execute the installed reference as a black box oracle).
"""

from __future__ import annotations

import enum
import os
import sys
import types

REFERENCE_PATH = "/root/reference"


class _AcceleratorType(enum.Enum):
    GPU = 1
    NPU = 2
    CPU = 3
    DIPU = 4
    DITORCH = 5


class _CpuAccelerator:
    def get_accelerator_type(self):
        return _AcceleratorType.CPU

    def get_accelerator_backend(self):
        return _AcceleratorType.CPU

    def is_available(self):
        return True  # CPU RNG stands in for device RNG in the seed manager

    def device_count(self):
        return 1

    def current_device(self):
        return 0

    def set_device(self, *_a, **_k):
        pass

    def device_name(self, *_a):
        return "cpu"

    def get_device_name(self, *_a):
        return "cpu"

    def current_device_name(self):
        return "cpu"

    def synchronize(self, *_a, **_k):
        pass

    def empty_cache(self):
        pass

    def memory_allocated(self, *_a, **_k):
        return 0

    def max_memory_allocated(self, *_a, **_k):
        return 0

    def reset_peak_memory_stats(self, *_a, **_k):
        pass

    def memory_reserved(self, *_a, **_k):
        return 0

    def max_memory_reserved(self, *_a, **_k):
        return 0

    def communication_backend_name(self):
        return "gloo"

    @property
    def amp(self):
        import functools
        import types as _types

        import torch

        ns = _types.SimpleNamespace()
        ns.custom_fwd = functools.partial(torch.amp.custom_fwd, device_type="cpu")
        ns.custom_bwd = functools.partial(torch.amp.custom_bwd, device_type="cpu")
        ns.autocast = functools.partial(torch.autocast, device_type="cpu")
        return ns

    def set_allow_tf32(self, *_a, **_k):
        pass

    def return_custom_bwd(self):
        import functools

        import torch

        return functools.partial(torch.amp.custom_bwd, device_type="cpu")

    def return_custom_fwd(self):
        import functools

        import torch

        return functools.partial(torch.amp.custom_fwd, device_type="cpu")

    def random(self):
        import torch

        return torch.random

    def manual_seed(self, seed):
        import torch

        torch.manual_seed(seed)

    def get_rng_state(self):
        import torch

        return torch.get_rng_state()

    def set_rng_state(self, state):
        import torch

        torch.set_rng_state(state)

    class _Stream:
        def __init__(self, *a, **k):
            pass

    def Stream(self, *a, **k):
        return self._Stream()

    def stream(self, *_a, **_k):
        import contextlib

        return contextlib.nullcontext()

    def current_stream(self):
        return self._Stream()


def install_reference(monkeypatch=None) -> None:
    """Make `import internlm` resolve to the reference with a CPU accelerator."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "internlm.accelerator" in sys.modules:
        return
    fake = types.ModuleType("internlm.accelerator")
    acc = _CpuAccelerator()
    fake.AcceleratorType = _AcceleratorType
    fake.get_accelerator = lambda: acc
    fake.internlm_accelerator = acc
    sys.modules["internlm.accelerator"] = fake
    # some modules import the submodule path directly
    sub = types.ModuleType("internlm.accelerator.abstract_accelerator")
    sub.AcceleratorType = _AcceleratorType
    sub.get_accelerator = lambda: acc
    sys.modules["internlm.accelerator.abstract_accelerator"] = sub


def reference_config(vocab=256, hidden=64, heads=4, layers=2, seq=32):
    import torch

    return dict(
        model_type="INTERNLM",
        model=dict(checkpoint=False, num_attention_heads=heads, embed_split_hidden=True,
                   vocab_size=vocab, embed_grad_scale=1, parallel_output=False,
                   hidden_size=hidden, num_layers=layers, mlp_ratio=8 / 3,
                   apply_post_layer_norm=False, dtype=torch.float32,
                   norm_type="rmsnorm", layer_norm_epsilon=1e-5,
                   use_flash_attn=False, num_chunks=1),
        parallel=dict(zero1=dict(size=-1, fsdp=False), tensor=dict(size=1, mode="mtp"),
                      pipeline=dict(size=1, interleaved_overlap=True),
                      weight=dict(size=1, overlap=True, memory_pool=True)),
        data=dict(seq_len=seq, micro_num=1, micro_bsz=1, pack_sample_into_one=False,
                  use_packed_dataset=True, total_steps=4, packed_length=seq),
        ckpt=dict(), loss=dict(label_smoothing=0),
        adam=dict(lr=1e-4, adam_beta1=0.9, adam_beta2=0.95, adam_beta2_c=0,
                  adam_eps=1e-8, weight_decay=0.01),
        grad_scaler=dict(fp16=dict(initial_scale=1, min_scale=1, growth_interval=1000),
                         growth_factor=2, backoff_factor=0.5, max_scale=2**24, hysteresis=2),
        hybrid_zero_optimizer=dict(overlap_sync_grad=False, overlap_sync_param=False,
                                   reduce_bucket_size=512 * 1024 * 1024, clip_grad_norm=1.0),
        lr_scheduler=dict(total_steps=4, init_steps=0, warmup_ratio=0.01, eta_min=1e-5),
        beta2_scheduler=dict(init_beta2=0.95, c=0, cur_iter=-1),
        cudnn_deterministic=True, cudnn_benchmark=False,
        monitor=dict(alert=dict(enable_feishu_alert=False, feishu_alert_address=None,
                                light_monitor_address=None)),
    )


def launch_reference(config) -> None:
    os.environ.setdefault("MASTER_ADDR", "localhost")  # tcp://[IPv4] brackets break py3.12 urlsplit
    os.environ.setdefault("MASTER_PORT", "29517")
    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("LOCAL_RANK", "0")
    install_reference()
    import torch.distributed as dist

    # the reference formats init_method as tcp://[host]:port; brackets around a
    # non-IPv6 host are rejected by python 3.12's urlsplit — strip them
    if not getattr(dist, "_ievo_patched", False):
        orig = dist.init_process_group

        def patched(*args, **kwargs):
            im = kwargs.get("init_method")
            if im and "[" in im:
                kwargs["init_method"] = im.replace("[", "").replace("]", "")
            return orig(*args, **kwargs)

        dist.init_process_group = patched
        dist._ievo_patched = True

    from internlm.initialize.launch import launch_from_torch

    launch_from_torch(config=config, backend="gloo", seed=1024)
