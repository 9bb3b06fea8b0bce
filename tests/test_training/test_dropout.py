"""Dropout semantics under sharding.

Parity: reference ``core/context/random.py`` keeps per-ParallelMode RNG streams
(tp-OFFSET seeds) so tp ranks draw decorrelated dropout masks.  The TPU-native
answer is stronger: with ``jax_threefry_partitionable`` every mask bit is a
function of the LOGICAL element index, so the mask — and therefore the whole
loss curve — is identical across tp/sp topologies, not merely decorrelated.
Streams are keyed on (base seed, optimizer step, micro index, layer index).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

from internevo_tpu.ops.attention import set_use_pallas
from tests.test_training.test_loss import demo_config, run_training


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def _drop_cfg(tp=1, mode="mtp", drop=0.2):
    par = dict(zero1=dict(size=-1 if tp == 1 else 2),
               tensor=dict(size=tp, mode=mode),
               pipeline=dict(size=1), weight=dict(size=1))
    return demo_config(model=dict(drop_rate=drop), parallel=par)


def test_dropout_is_active_and_deterministic():
    """drop_rate>0 changes the loss curve; same seed reproduces it exactly."""
    base, _ = run_training(demo_config(), steps=3)
    dropped, _ = run_training(_drop_cfg(), steps=3)
    again, _ = run_training(_drop_cfg(), steps=3)
    assert not np.allclose(base, dropped, rtol=1e-4), (base, dropped)
    np.testing.assert_allclose(dropped, again, rtol=0, atol=0)


def test_dropout_partition_invariance_msp():
    """tp=2 msp with dropout reproduces the tp=1 loss curve (threefry
    partitionable draws are a function of the logical element index) — the
    reference can only offer decorrelation, not invariance.  Masks are keyed
    per (step, micro index, layer), so the comparison holds the batch layout
    fixed: tp=1 on 4 devices and tp=2 on 8 both give dp_total=4."""
    losses_tp1, gn_tp1 = run_training(_drop_cfg(tp=1), steps=3, n_devices=4)
    losses_tp2, gn_tp2 = run_training(_drop_cfg(tp=2, mode="msp"), steps=3)
    np.testing.assert_allclose(losses_tp1, losses_tp2, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(gn_tp1, gn_tp2, rtol=2e-3, atol=2e-4)


def test_dropout_partition_invariance_isp():
    losses_tp1, _ = run_training(_drop_cfg(tp=1), steps=3, n_devices=4)
    losses_isp, _ = run_training(_drop_cfg(tp=2, mode="isp"), steps=3)
    np.testing.assert_allclose(losses_tp1, losses_isp, rtol=2e-4, atol=2e-5)


def test_dropout_layers_decorrelated():
    """Each layer folds its index into the stream: a 2-layer model must not
    apply the same mask twice (compare against a 1-layer double-width proxy is
    overkill — instead check the mask draw differs layer to layer directly)."""
    import jax
    import jax.numpy as jnp

    from internevo_tpu.models.base import ModelConfig, block_forward, init_block_params

    cfg = ModelConfig(num_layers=2, hidden_size=64, num_attention_heads=4,
                      vocab_size=256, drop_rate=0.5, dtype="float32")
    key = jax.random.PRNGKey(0)
    layer = jax.tree.map(lambda a: a[0], init_block_params(cfg, key))
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 16, 64), jnp.float32)
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    seg = jnp.ones((1, 16), jnp.int32)
    out_a = block_forward(cfg, layer, x, pos, seg, jax.random.fold_in(key, 10), True)
    out_b = block_forward(cfg, layer, x, pos, seg, jax.random.fold_in(key, 11), True)
    out_a2 = block_forward(cfg, layer, x, pos, seg, jax.random.fold_in(key, 10), True)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_a2))


def test_eval_ignores_dropout():
    """Validation runs with train=False: the eval loss must be identical with
    and without drop_rate (reference NaiveAMP eval / model.eval())."""
    import jax
    import jax.numpy as jnp

    from internevo_tpu.core.context import gpc  # noqa: F401
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model, initialize_optimizer, initialize_trainer

    rng = np.random.RandomState(0)
    batch = None
    evals = []
    for drop in (0.0, 0.4):
        launch(demo_config(model=dict(drop_rate=drop)), seed=1024)
        model, params = initialize_model()
        opt_state, lrs, b2 = initialize_optimizer(model, params)
        trainer = initialize_trainer(model, params, opt_state, lrs, b2)
        if batch is None:
            ids = rng.randint(1, 1024, (1, 256), dtype=np.int32)
            batch = {
                "input_ids": jnp.asarray(ids),
                "segment_ids": jnp.ones((1, 256), jnp.int32),
                "indexes": jnp.tile(jnp.arange(128, dtype=jnp.int32), (1, 2)),
                "labels": jnp.asarray(rng.randint(1, 1024, (1, 256), dtype=np.int32)),
            }
        evals.append(float(trainer.engine.run_eval_step(batch)["loss"]))
    assert evals[0] == pytest.approx(evals[1], rel=1e-6), evals


def test_attn_dropout_active_and_deterministic():
    """attn_drop_rate>0 changes the loss curve (the mask actually applies) and
    the counter-hash mask is reproducible run to run (reference flash-attn
    dropout_p, ``modules/multi_head_attention.py``)."""
    base, _ = run_training(demo_config(), steps=3)
    dropped, _ = run_training(demo_config(model=dict(attn_drop_rate=0.3)), steps=3)
    again, _ = run_training(demo_config(model=dict(attn_drop_rate=0.3)), steps=3)
    # at random init the CE loss is ~log V regardless of small logit
    # perturbations, so the signal is exact inequality (training is otherwise
    # bit-reproducible — see the identical `again` run), not a tolerance
    assert not np.array_equal(base, dropped), (base, dropped)
    np.testing.assert_allclose(dropped, again, rtol=0, atol=0)


def test_attn_dropout_partition_invariance_rsp():
    """Attention dropout under ring attention (rsp): every ring leg hashes
    GLOBAL (q row, kv col) coordinates, so the tp=2 rsp loss curve equals the
    tp=1 curve exactly like the residual-dropout invariance above (the dense
    oracle path shares the kernel's counter hash)."""
    cfg_drop = dict(attn_drop_rate=0.25)
    losses_tp1, _ = run_training(demo_config(model=cfg_drop), steps=3, n_devices=4)
    par = dict(zero1=dict(size=2), tensor=dict(size=2, mode="rsp"),
               pipeline=dict(size=1), weight=dict(size=1))
    losses_rsp, _ = run_training(demo_config(model=cfg_drop, parallel=par), steps=3)
    np.testing.assert_allclose(losses_tp1, losses_rsp, rtol=2e-4, atol=2e-5)


def test_dropout_pp2_matches_pp1():
    """Residual dropout through the manual 1F1B pipeline: the rng stream is
    keyed (seed, step, micro, GLOBAL layer, tag) in both paths, so at
    dp_total=1 the pp=2 masks are BIT-COMPATIBLE with pp=1 and the loss curves
    match (reference runs dropout under every schedule via SeedManager capture,
    ``solver/activation_checkpoint.py:40-176``).  At dp>1 the pipeline folds
    the batch-shard index (per-shard decorrelated streams — the reference's
    per-RANK SeedManager semantics), which the partition-invariant GSPMD path
    deliberately does not, so the curves only agree at dp_total=1."""
    losses_pp1, gn_pp1 = run_training(
        demo_config(model=dict(drop_rate=0.2), data=dict(micro_num=4)),
        steps=3, n_devices=1)
    losses_pp2, gn_pp2 = run_training(
        demo_config(model=dict(drop_rate=0.2), data=dict(micro_num=4),
                    parallel=dict(zero1=dict(size=1), tensor=dict(size=1, mode="mtp"),
                                  pipeline=dict(size=2), weight=dict(size=1))),
        steps=3, n_devices=2)
    np.testing.assert_allclose(losses_pp1, losses_pp2, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(gn_pp1, gn_pp2, rtol=2e-3, atol=2e-4)


def test_dropout_pp2_deterministic_and_active():
    """Same-seed reproducibility and activity under the pipeline schedule."""
    cfg = lambda drop: demo_config(  # noqa: E731
        model=dict(drop_rate=drop), data=dict(micro_num=4),
        parallel=dict(zero1=dict(size=4), tensor=dict(size=1, mode="mtp"),
                      pipeline=dict(size=2), weight=dict(size=1)))
    base, _ = run_training(cfg(0.0), steps=2)
    dropped, _ = run_training(cfg(0.2), steps=2)
    again, _ = run_training(cfg(0.2), steps=2)
    assert not np.allclose(base, dropped, rtol=1e-4), (base, dropped)
    np.testing.assert_allclose(dropped, again, rtol=0, atol=0)
