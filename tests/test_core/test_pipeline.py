"""Pipeline parallelism: loss equivalence vs non-pipeline execution.

Parity: reference ``tests/test_core/test_pipeline.py`` compares pipeline
scheduler output+grads against a plain sequential model.
"""

import jax
import numpy as np
import pytest

from internevo_tpu.ops.attention import set_use_pallas


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def _run(config, steps, n_devices=None):
    from tests.test_training.test_loss import run_training

    return run_training(config, steps=steps, n_devices=n_devices)


def _cfg(**overrides):
    from tests.test_training.test_loss import demo_config

    return demo_config(**overrides)


def test_pp2_matches_dp_baseline():
    """pp=2 x dp=4 must reproduce the pure dp=4 loss curve (same global batch)."""
    losses_dp, gn_dp = _run(_cfg(data=dict(micro_num=4)), steps=3, n_devices=4)
    losses_pp, gn_pp = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=4), tensor=dict(size=1, mode="mtp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=3,
    )
    np.testing.assert_allclose(losses_dp, losses_pp, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(gn_dp, gn_pp, rtol=2e-3, atol=2e-4)


def test_pp4_matches_dp_baseline():
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4), model=dict(num_layers=4)), steps=2, n_devices=2)
    losses_pp, _ = _run(
        _cfg(data=dict(micro_num=4), model=dict(num_layers=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=1, mode="mtp"),
                           pipeline=dict(size=4), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_pp, rtol=3e-4, atol=3e-5)


def test_pp2_with_tp2():
    """pp x tp x dp combined topology."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4)), steps=2, n_devices=2)
    losses_mix, _ = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="mtp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_mix, rtol=3e-4, atol=3e-5)


def test_interleaved_pp2_chunks2():
    """Interleaved (virtual-chunk) schedule must match the dp baseline too.
    4 layers over pp=2 x chunks=2 -> 1 layer per (stage, chunk)."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4), model=dict(num_layers=4)), steps=2, n_devices=4)
    losses_il, _ = _run(
        _cfg(data=dict(micro_num=4), model=dict(num_layers=4, num_chunks=2),
             parallel=dict(zero1=dict(size=4), tensor=dict(size=1, mode="mtp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_il, rtol=3e-4, atol=3e-5)


def test_interleaved_pp2_chunks2_tp2():
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4), model=dict(num_layers=4)), steps=2, n_devices=2)
    losses_il, _ = _run(
        _cfg(data=dict(micro_num=4), model=dict(num_layers=4, num_chunks=2),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="mtp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_il, rtol=3e-4, atol=3e-5)


def test_pp2_msp2_sequence_parallel():
    """msp inside the pipeline: sequence-sharded ring, gather/scatter at the
    matmuls — must still match the dp baseline."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4)), steps=2, n_devices=2)
    losses_msp, _ = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="msp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_msp, rtol=3e-4, atol=3e-5)
