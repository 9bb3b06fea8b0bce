"""Engine: bundles params, optimizer state, schedulers and the compiled step.

Parity: reference ``internlm/core/engine.py:19-196`` — the reference Engine
wires model/optimizer/criterion/lr+beta2 schedulers/gradient handlers and its
``step()`` does reduce -> clip -> optim.step -> scheduler.step.  Here the whole
of that is inside the jitted train step; Engine owns the host-side state and
scheduler evaluation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from ..solver.lr_scheduler import Beta2Scheduler, CosineAnnealingWarmupLR


class Engine:
    def __init__(
        self,
        model,                      # ModelDef
        params,
        opt_state,
        train_step_fn: Callable,
        lr_scheduler: CosineAnnealingWarmupLR,
        beta2_scheduler: Optional[Beta2Scheduler] = None,
        eval_step_fn: Optional[Callable] = None,
        scheduler_hooks: Optional[list] = None,
    ):
        self.model = model
        self.params = params
        self.opt_state = opt_state
        self.train_step_fn = train_step_fn
        self.eval_step_fn = eval_step_fn
        self.lr_scheduler = lr_scheduler
        self.beta2_scheduler = beta2_scheduler
        self.scheduler_hooks = scheduler_hooks or []
        self._training = True
        self.current_lr = 0.0
        # host-side mirror of opt_state["step"]: reading the device value every
        # step would block async dispatch; incremented optimistically and
        # corrected via note_overflow() when a step was skipped
        self._host_step: Optional[int] = None

    def train(self):
        self._training = True

    def eval(self):
        self._training = False

    @property
    def step_count(self) -> int:
        if self._host_step is None:
            self._host_step = int(self.opt_state["step"])
        return self._host_step

    def note_overflow(self) -> None:
        """The dispatched step turned out to be skipped (non-finite grads)."""
        if self._host_step is not None and self._host_step > 0:
            self._host_step -= 1

    def reset_step_count(self) -> None:
        """Force re-read from device state (after checkpoint load etc.)."""
        self._host_step = None

    def run_step(self, batch: dict) -> dict:
        """One global step: evaluate schedules on host, run the compiled step."""
        step = self.step_count
        self._host_step = step + 1  # optimistic; corrected by note_overflow
        lr = self.lr_scheduler.get_lr(step)
        beta2 = self.beta2_scheduler.get_beta2(step + 1) if self.beta2_scheduler else None
        self.current_lr = lr
        for hook in self.scheduler_hooks:
            hook.before_forward(self, batch)
        self.params, self.opt_state, metrics = self.train_step_fn(
            self.params, self.opt_state, batch, lr, beta2
        )
        for hook in self.scheduler_hooks:
            hook.after_backward(self, None)
            hook.post_helper_func(self, metrics)
        return metrics

    def run_eval_step(self, batch: dict) -> dict:
        assert self.eval_step_fn is not None
        return self.eval_step_fn(self.params, batch)

    def lower_step(self, batch: dict):
        """Compiled object for the current train step (memory reports): hits
        the jit compile cache, traces by aval only — no execution, no donation."""
        step = self.step_count
        lr = self.lr_scheduler.get_lr(step)
        beta2 = self.beta2_scheduler.get_beta2(step + 1) if self.beta2_scheduler else None
        return self.train_step_fn.lower(self.params, self.opt_state, batch, lr, beta2).compile()
