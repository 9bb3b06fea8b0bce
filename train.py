#!/usr/bin/env python
"""Training entry point.

Parity: reference ``train.py`` — same CLI surface
(``--config --launcher --port --seed --profiling``) and the same main-loop
phases: initialize env/model/optimizer/dataloaders, auto-resume, train loop with
metrics recording, periodic eval and checkpointing.
"""

from __future__ import annotations

import gc
import os
import time
import traceback

import jax

# The sandbox's TPU plugin pins jax_platforms at import time; IEVO_PLATFORM
# lets CI/smoke runs redirect to the 8-device virtual CPU mesh.
if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])

import numpy as np

from internevo_tpu.core.context import gpc
from internevo_tpu.data.build_dataloader import (
    build_train_loader_with_data_type,
    build_valid_loader_with_data_type,
)
from internevo_tpu.core.trainer import TrainState
from internevo_tpu.checkpoint.checkpoint_manager import CheckpointManager
from internevo_tpu.eval.evaluation import evaluate_on_val_dls
from internevo_tpu.initialize.launch import initialize_distributed_env
from internevo_tpu.monitor.monitor import initialize_monitor_manager, send_alert_message
from internevo_tpu.train.pipeline import (
    batch_to_device,
    get_tflops_func_builder,
    initialize_model,
    initialize_optimizer,
    initialize_trainer,
    load_new_batch,
    record_current_batch_training_metrics,
)
from internevo_tpu.utils.common import BatchSkipper, parse_args
from internevo_tpu.utils.logger import get_logger
from internevo_tpu.utils.simple_memory_profiler import SimpleMemoryProfiler
from internevo_tpu.utils.timers import megatron_timer as timer
from internevo_tpu.utils.tpudiag import empty_cache_and_diag, warmup_collectives
from internevo_tpu.utils.writer import Writer

logger = get_logger(__name__)


def main(args):
    total_steps = gpc.config.data.total_steps
    valid_every = gpc.config.data.valid_every
    skip_batches = gpc.config.data.skip_batches

    model, params = initialize_model()
    opt_state, lr_scheduler, beta2_scheduler = initialize_optimizer(model, params)

    train_dl, dataset_types = build_train_loader_with_data_type()
    train_state = TrainState(gpc.config, train_dl.batch_sampler)

    trainer = initialize_trainer(model, params, opt_state, lr_scheduler, beta2_scheduler)
    engine = trainer.engine

    ckpt_manager = CheckpointManager(
        ckpt_config=gpc.config.ckpt,
        engine=engine,
        train_state=train_state,
        train_dl=train_dl,
        model_config=gpc.config.model,
    )
    ckpt_manager.try_resume_training(train_state)

    writer = Writer(
        job_name=gpc.config.get("JOB_NAME", "internevo_tpu"),
        launch_time=time.strftime("%m-%d-%H:%M:%S"),
        tensorboard_folder=gpc.config.get("tensorboard_folder", None),
        enable_tb=gpc.config.get("enable_tb", True),
    ) if gpc.is_rank_for_log() else None

    get_tflops_func = get_tflops_func_builder()
    batch_skipper = BatchSkipper(skip_batches)
    micro_num = gpc.config.data.micro_num
    diag_interval = gpc.config.data.get("empty_cache_and_diag_interval", 0)
    memory_profiler = None
    if gpc.config.get("enable_memory_profiling", False):
        memory_profiler = SimpleMemoryProfiler(
            engine.params, engine.opt_state,
            activation_config=dict(
                hidden_size=gpc.config.model.hidden_size,
                mlp_hidden=int(gpc.config.model.hidden_size * gpc.config.model.get("mlp_ratio", 4)),
                num_layers=gpc.config.model.num_layers,
                tokens_per_device=gpc.config.data.packed_length,
            ),
        )
    warmup_collectives(gpc.mesh)

    train_iter = iter(train_dl)
    gc.disable()
    gc.collect()

    # --profiling: jax profiler traces (reference torch.profiler wrapper,
    # train/pipeline.py:417-459); TB-compatible trace in the profiling folder
    profiling = getattr(args, "profiling", False)
    profile_dir = f"RUN/{gpc.config.get('JOB_NAME', 'job')}/jax_trace"
    profile_schedule = (3, 7)  # (start_batch, stop_batch)

    logger.info("start training from batch_count=%d", train_state.batch_count)
    with initialize_monitor_manager(
        job_name=gpc.config.get("JOB_NAME", "internevo_tpu"),
        alert_address=gpc.config.monitor.alert.get("feishu_alert_address", None),
    ):
        last_step_time = None
        # Metric reads block on the device; handling them is DEFERRED by one
        # iteration so the next batch's host prep + dispatch overlaps the
        # running step (the async-dispatch analogue of the reference's comm/
        # compute overlap).  pending = (batch_count, device_batch, metrics,
        # start_time).
        pending = None

        last_handle_time = [time.time()]

        def handle_pending():
            nonlocal last_step_time, pending
            if pending is None:
                return False
            p_count, p_batch, p_metrics, p_start, p_counters = pending
            pending = None
            loss = float(p_metrics["loss"])
            grad_norm = float(p_metrics["grad_norm"])
            success_update = not bool(p_metrics["found_inf"])
            if success_update:
                train_state.step_count += 1
            else:
                train_state.inf_nan_skip_batches += 1
                engine.note_overflow()
                if gpc.is_rank_for_log():
                    logger.warning("overflow detected at step %d, skipping update", p_count)
                    send_alert_message(message=f"inf/nan grad at step {p_count}, skipped")
            # overlapped windows would double-count: charge this step only the
            # wall time since the previous step was settled
            now = time.time()
            last_step_time = now - max(p_start, last_handle_time[0])
            last_handle_time[0] = now
            p_start = now - last_step_time
            if memory_profiler is not None:
                memory_profiler.step()
                if memory_profiler._step == 1:
                    # one-time XLA-exact report: arg/temp/peak bytes + the
                    # top-5 live buffers of the compiled step (compile-cache
                    # hit, trace-only — no execution)
                    memory_profiler.note_compiled(engine.lower_step(p_batch))
            record_current_batch_training_metrics(
                get_tflops_func=get_tflops_func,
                logger_obj=logger,
                writer=writer,
                success_update=success_update,
                batch_count=p_count,
                batch=p_batch,
                train_state=train_state,
                engine=engine,
                start_time=p_start,
                loss=loss,
                grad_norm=grad_norm,
                metrics=p_metrics,
            )
            if valid_every > 0 and train_state.step_count % valid_every == 0:
                evaluate_on_val_dls(trainer, build_valid_loader_with_data_type()[0],
                                    writer, train_state.step_count)
            # the save must describe the state as of batch p_count, but the NEXT
            # batch was already loaded (its consumption counted); swap in the
            # dispatch-time counter snapshot around the save decision
            live = {k: getattr(train_state, k) for k in p_counters}
            for k, v in p_counters.items():
                setattr(train_state, k, v)
            should_stop = ckpt_manager.try_save_checkpoint(train_state)
            for k, v in live.items():
                setattr(train_state, k, v)
            return should_stop

        for batch_count in range(train_state.batch_count, total_steps):
            if profiling and batch_count == profile_schedule[0]:
                jax.profiler.start_trace(profile_dir)
            if profiling and batch_count == profile_schedule[1]:
                jax.effects_barrier()
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", profile_dir)
            start_time = time.time()
            timer("one-batch").start()

            # host-side batch prep overlaps the in-flight device step
            batch, train_iter = load_new_batch(train_dl, train_iter, train_state)
            train_state.batch_count = batch_count
            train_state.num_consumed_tokens += int(np.asarray(batch[0]["input_ids"]).size)
            if batch_skipper(batch_count):
                logger.info("skip batch %d", batch_count)
                continue
            device_batch = batch_to_device(batch, micro_num=_infer_micro_num(batch, micro_num))

            # settle the previous step (counters, metrics, ckpt/eval decisions)
            if handle_pending():
                break
            empty_cache_and_diag(batch_count, interval=diag_interval, step_time=last_step_time)

            timer("fwd-bwd").start()
            metrics = trainer.execute_schedule(device_batch)  # async dispatch
            timer("fwd-bwd").stop()
            timer("one-batch").stop()
            counters = dict(
                batch_count=train_state.batch_count,
                num_consumed_tokens=train_state.num_consumed_tokens,
                sampler_consumed_batches=train_state.sampler_consumed_batches,
                sampler_consumed_samples=train_state.sampler_consumed_samples,
                num_consumed_samples_in_epoch=train_state.num_consumed_samples_in_epoch,
            )
            pending = (batch_count, device_batch, metrics, start_time, counters)

        handle_pending()

    ckpt_manager.wait_async_upload_finish()


def _infer_micro_num(batch, micro_num: int) -> int:
    """During batch-size rampup the sampler yields fewer packs; the micro axis
    shrinks accordingly (reference varies micro_num the same way)."""
    total_rows = batch[0]["input_ids"].shape[0]
    from internevo_tpu.core.context import gpc as _gpc

    dp = _gpc.sizes.dp_total if _gpc.sizes else 1
    assert total_rows % dp == 0, (total_rows, dp)
    return total_rows // dp


if __name__ == "__main__":
    args = parse_args()
    initialize_distributed_env(config=args.config, launcher=args.launcher,
                               master_port=args.port, seed=args.seed)
    assert hasattr(gpc, "config") and gpc.config is not None
    try:
        main(args)
    except Exception:
        logger.error("Raise exception from %s:\n%s", jax.process_index(), traceback.format_exc())
        send_alert_message(message=f"train.py exception: {traceback.format_exc(limit=3)}")
        raise
