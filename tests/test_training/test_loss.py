"""End-to-end training loss tests.

Parity: reference ``tests/test_training/test_loss.py`` — train N steps of a
fixed-seed config and assert the loss curve against a golden list with spike /
deviation limits, across parallel topologies.  Here the topologies run on the
8-device CPU mesh in one process; cross-topology equivalence is the strongest
correctness check GSPMD gives us (same math, different shardings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

from internevo_tpu.core.context import gpc
from internevo_tpu.data.build_dataloader import build_train_loader_with_data_type
from internevo_tpu.initialize.launch import launch
from internevo_tpu.ops.attention import set_use_pallas
from internevo_tpu.train.pipeline import (
    batch_to_device,
    initialize_model,
    initialize_optimizer,
    initialize_trainer,
)

TOTAL_STEPS = 8
LOSS_SPIKE_LIMIT = 1.5
LOSS_DEVIATION_LIMIT = 0.2


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def demo_config(**overrides):
    cfg = dict(
        model_type="INTERNLM",
        data=dict(seq_len=128, micro_num=2, micro_bsz=2, total_steps=TOTAL_STEPS,
                  rampup_batch_size="", pack_sample_into_one=False, train_folder=None,
                  num_random_samples=2000, fixed_random_dataset_seqlen=True),
        model=dict(checkpoint=False, num_attention_heads=4, vocab_size=1024,
                   embed_grad_scale=1, parallel_output=True, hidden_size=64,
                   num_layers=2, mlp_ratio=8 / 3, dtype="torch.float32",
                   norm_type="rmsnorm", layer_norm_epsilon=1e-5),
        adam=dict(lr=1e-4, adam_beta1=0.9, adam_beta2=0.95, adam_beta2_c=0,
                  adam_eps=1e-8, weight_decay=0.01),
        lr_scheduler=dict(total_steps=TOTAL_STEPS, init_steps=0, warmup_ratio=0.25, eta_min=1e-5),
        parallel=dict(zero1=dict(size=-1), tensor=dict(size=1, mode="mtp"),
                      pipeline=dict(size=1), weight=dict(size=1)),
    )
    for k, v in overrides.items():
        if isinstance(v, dict) and k in cfg:
            cfg[k].update(v)
        else:
            cfg[k] = v
    return cfg


def run_training(config, steps=TOTAL_STEPS, seed=1024, n_devices=None):
    devices = jax.devices()[:n_devices] if n_devices else None
    launch(config, seed=seed, devices=devices)
    model, params = initialize_model()
    opt_state, lr_sched, beta2_sched = initialize_optimizer(model, params)
    trainer = initialize_trainer(model, params, opt_state, lr_sched, beta2_sched)
    train_dl, _ = build_train_loader_with_data_type()
    micro_num = gpc.config.data.micro_num
    losses, grad_norms = [], []
    it = iter(train_dl)
    for _ in range(steps):
        batch = next(it)
        rows = batch[0]["input_ids"].shape[0]
        dp = gpc.sizes.dp_total
        device_batch = batch_to_device(batch, micro_num=rows // dp)
        metrics = trainer.execute_schedule(device_batch)
        losses.append(float(metrics["loss"]))
        grad_norms.append(float(metrics["grad_norm"]))
    return losses, grad_norms


def test_loss_curve_decreases_dp8():
    losses, grad_norms = run_training(demo_config())
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    # no spikes
    for a, b in zip(losses, losses[1:]):
        assert b < a * LOSS_SPIKE_LIMIT + 1e-3, losses


def _baseline_4dp(steps=4):
    """Pure dp=4 on a 4-device submesh: same global batch as every 8-device
    dp4 x tp2 topology below."""
    return run_training(demo_config(), steps=steps, n_devices=4)


def test_topology_equivalence_dp_vs_tp():
    """Same seed + data + global batch => same loss under different mesh
    shardings (the TPU analogue of reference cross-topology tests, SURVEY §4)."""
    losses_dp, _ = _baseline_4dp()
    losses_tp, _ = run_training(
        demo_config(parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="mtp"),
                                  pipeline=dict(size=1), weight=dict(size=1))),
        steps=4,
    )
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4, atol=2e-5)


def test_topology_equivalence_msp():
    losses_dp, _ = _baseline_4dp()
    losses_msp, _ = run_training(
        demo_config(parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="msp"),
                                  pipeline=dict(size=1), weight=dict(size=1))),
        steps=4,
    )
    np.testing.assert_allclose(losses_dp, losses_msp, rtol=2e-4, atol=2e-5)


def test_topology_equivalence_isp():
    losses_dp, _ = _baseline_4dp()
    losses_isp, _ = run_training(
        demo_config(parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="isp"),
                                  pipeline=dict(size=1), weight=dict(size=1))),
        steps=4,
    )
    np.testing.assert_allclose(losses_dp, losses_isp, rtol=2e-4, atol=2e-5)


def test_grad_accum_equivalence():
    """Swapping micro_num x micro_bsz must keep loss AND grad-norm (reference
    ``test_swap_nb_loss_and_gradnorm.py``, which feeds IDENTICAL pre-saved
    batches to both layouts).  The same per-step sample pool is laid out as
    micro_num 4 x micro_bsz 1 and micro_num 2 x micro_bsz 2 (two samples
    packed per row, segment ids 1|2, positions restarting)."""
    import jax.numpy as jnp

    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import (
        initialize_model, initialize_optimizer, initialize_trainer,
    )

    S, V, steps = 128, 1024, 3
    rng = np.random.RandomState(7)
    pool = rng.randint(1, V, (steps, 4, S), dtype=np.int32)  # 4 samples/step

    def run(micro_num, micro_bsz):
        cfg = demo_config(data=dict(micro_num=micro_num, micro_bsz=micro_bsz, seq_len=S))
        launch(cfg, seed=1024, devices=jax.devices()[:1])
        model, params = initialize_model()
        opt_state, lrs, b2 = initialize_optimizer(model, params)
        trainer = initialize_trainer(model, params, opt_state, lrs, b2)
        P_len = S * micro_bsz
        losses, gns = [], []
        for step in range(steps):
            rows = pool[step].reshape(micro_num, 1, P_len)
            labels = np.full_like(rows, -100)
            # next-token labels within each packed sample
            lab = np.concatenate([pool[step][:, 1:], np.full((4, 1), -100, np.int32)], 1)
            labels = lab.reshape(micro_num, 1, P_len)
            seg = np.tile(np.repeat(np.arange(1, micro_bsz + 1, dtype=np.int32), S),
                          (micro_num, 1, 1))
            pos = np.tile(np.arange(S, dtype=np.int32), (micro_num, 1, micro_bsz))
            batch = {
                "input_ids": jnp.asarray(rows),
                "segment_ids": jnp.asarray(seg),
                "indexes": jnp.asarray(pos),
                "labels": jnp.asarray(labels),
            }
            m = trainer.execute_schedule(batch)
            losses.append(float(m["loss"]))
            gns.append(float(m["grad_norm"]))
        return losses, gns

    losses_a, gn_a = run(4, 1)
    losses_b, gn_b = run(2, 2)
    np.testing.assert_allclose(losses_a, losses_b, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(gn_a, gn_b, rtol=2e-3, atol=2e-4)


def test_topology_equivalence_fsdp():
    """zero1.fsdp=True (ZeRO-3 param sharding) must keep the loss curve."""
    losses_dp, _ = run_training(demo_config(), steps=3)
    losses_fsdp, _ = run_training(
        demo_config(parallel=dict(zero1=dict(size=-1, fsdp=True),
                                  tensor=dict(size=1, mode="mtp"),
                                  pipeline=dict(size=1), weight=dict(size=1))),
        steps=3,
    )
    np.testing.assert_allclose(losses_dp, losses_fsdp, rtol=2e-4, atol=2e-5)


def test_topology_equivalence_rsp():
    """rsp (ring sequence parallel, TPU-native extension) must keep the curve."""
    losses_dp, _ = _baseline_4dp(steps=3)
    losses_rsp, _ = run_training(
        demo_config(parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="rsp"),
                                  pipeline=dict(size=1), weight=dict(size=1))),
        steps=3,
    )
    np.testing.assert_allclose(losses_dp, losses_rsp, rtol=2e-4, atol=2e-5)


# Golden 8-step loss curve for demo_config() at seed 1024 on the 8-device mesh
# (the reference pins hard-coded per-step losses the same way,
# tests/test_training/test_loss.py:32-43). Regenerate deliberately if the
# numerics change on purpose.
GOLDEN_LOSSES = [6.92842, 6.9183, 6.90708, 6.89012, 6.87695, 6.86553, 6.85577, 6.85183]


def test_loss_curve_pinned_to_golden():
    losses, _ = run_training(demo_config(), steps=8)
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=1e-3, atol=5e-4)
