"""Optimizer parity vs torch AdamW + grad scaler semantics.

Parity: reference ``tests/test_solver/test_optimizer.py`` compares
HybridZeroOptimizer against torch DDP+AdamW with assert_close over steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.solver.lr_scheduler import Beta2Scheduler, CosineAnnealingWarmupLR
from internevo_tpu.solver.optimizer import (
    AdamWConfig,
    GradScalerConfig,
    global_norm,
    init_optimizer_state,
    optimizer_step,
)


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w0 = rng.randn(16, 8).astype(np.float32)
    b0 = rng.randn(8).astype(np.float32)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    cfg = AdamWConfig(lr=1e-2, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.01,
                      clip_grad_norm=1e9)  # disable clipping for parity
    state = init_optimizer_state(params)

    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    topt = torch.optim.AdamW([tw, tb], lr=1e-2, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.01)

    for step in range(5):
        gw = rng.randn(16, 8).astype(np.float32)
        gb = rng.randn(8).astype(np.float32)
        grads = {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
        params, state, stats = optimizer_step(params, grads, state, lr=1e-2, adam_cfg=cfg,
                                              param_dtype=jnp.float32)
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                                   rtol=2e-5, atol=2e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                                   rtol=2e-5, atol=2e-6)


def test_clip_grad_norm():
    params = {"w": jnp.ones((4, 4))}
    state = init_optimizer_state(params)
    big = {"w": jnp.full((4, 4), 100.0)}
    cfg = AdamWConfig(lr=0.0, clip_grad_norm=1.0, weight_decay=0.0)
    _, _, stats = optimizer_step(params, big, state, lr=0.0, adam_cfg=cfg)
    assert float(stats["grad_norm"]) == pytest.approx(400.0, rel=1e-5)


def test_overflow_skips_step_and_backs_off():
    params = {"w": jnp.ones((4, 4))}
    scaler = GradScalerConfig(initial_scale=2.0**8, hysteresis=1)
    state = init_optimizer_state(params, scaler)
    inf_grads = {"w": jnp.full((4, 4), jnp.inf)}
    cfg = AdamWConfig(lr=1e-2)
    new_params, new_state, stats = optimizer_step(params, inf_grads, state, lr=1e-2,
                                                  adam_cfg=cfg, scaler_cfg=scaler)
    assert bool(stats["found_inf"])
    np.testing.assert_array_equal(np.asarray(new_params["w"]), np.ones((4, 4)))
    assert int(new_state["step"]) == 0
    assert float(new_state["grad_scale"]) == 2.0**7  # backoff 0.5
    assert int(new_state["num_skipped"]) == 1

    # finite grads afterwards: step proceeds
    ok = {"w": jnp.ones((4, 4))}
    p2, s2, st2 = optimizer_step(new_params, ok, new_state, lr=1e-2, adam_cfg=cfg, scaler_cfg=scaler)
    assert not bool(st2["found_inf"]) and int(s2["step"]) == 1


def test_scaler_growth():
    params = {"w": jnp.ones((2, 2))}
    scaler = GradScalerConfig(initial_scale=4.0, growth_interval=2, growth_factor=2.0)
    state = init_optimizer_state(params, scaler)
    cfg = AdamWConfig(lr=0.0)
    for i in range(2):
        _, state, _ = optimizer_step(params, {"w": jnp.ones((2, 2))}, state, lr=0.0,
                                     adam_cfg=cfg, scaler_cfg=scaler)
    assert float(state["grad_scale"]) == 8.0  # grew after growth_interval steps


def test_beta2_anneal_and_lr_schedule():
    lrs = CosineAnnealingWarmupLR(lr=1e-3, total_steps=100, warmup_steps=10, eta_min=1e-5)
    assert lrs.get_lr(0) == pytest.approx(1e-4)
    assert lrs.get_lr(9) == pytest.approx(1e-3)
    assert lrs.get_lr(99) == pytest.approx(1e-5, rel=5e-2)
    b2 = Beta2Scheduler(init_beta2=0.95, c=0.8)
    assert b2.get_beta2(1) == 0.95  # max(0.95, 0)
    assert b2.get_beta2(10**6) > 0.95
    b2_off = Beta2Scheduler(init_beta2=0.95, c=0)
    assert b2_off.get_beta2(100) == 0.95


def test_global_norm():
    tree = {"a": jnp.asarray([3.0]), "b": jnp.asarray([4.0])}
    assert float(global_norm(tree)) == pytest.approx(5.0)


def test_param_group_norms_match_reference_grouping():
    """Per-group grad norms (reference create_param_groups, train/utils.py:11-84
    + the per-step grad_norm dict): groups partition the tree and their norms
    recombine to the global norm."""
    import jax.numpy as jnp
    from internevo_tpu.solver.optimizer import global_norm, param_group_norms

    tree = {
        "embedding": {"weight": jnp.full((4, 4), 2.0)},
        "head": {"kernel": jnp.full((4, 2), 1.0)},
        "norm": jnp.full((4,), 3.0),
        "blocks": {
            "norm1": jnp.full((2, 4), 1.0),
            "wqkv": {"kernel": jnp.full((2, 4, 4), 0.5)},
            "moe": {"experts": {"w1": jnp.full((2, 2, 4, 4), 0.25)}},
        },
    }
    groups = param_group_norms(tree)
    assert set(groups) == {"embed_head", "fp32", "default", "moe"}
    total = jnp.sqrt(sum(jnp.square(v) for v in groups.values()))
    np.testing.assert_allclose(total, global_norm(tree), rtol=1e-6)
    np.testing.assert_allclose(groups["moe"], jnp.sqrt(64 * 0.25**2), rtol=1e-6)
    np.testing.assert_allclose(groups["embed_head"], jnp.sqrt(16 * 4.0 + 8 * 1.0), rtol=1e-6)


def test_param_group_classification_by_exact_segments():
    """Classification is by exact tree-key segments, not substrings (advisory:
    substring matching silently regroups params whose names merely contain
    'norm'/'moe'/'head'); the residual-MoE coefficient is a dense-branch param
    (ref moe/moe.py:66-99, not IS_EXPERT_PARAM) and must stay 'default'."""
    from internevo_tpu.solver.optimizer import param_group_of

    assert param_group_of("['blocks']['moe']['coefficient']") == "default"
    assert param_group_of("['blocks']['moe']['experts']['w2']") == "moe"
    assert param_group_of("['blocks']['moe']['gate']") == "moe"
    # substrings must NOT trigger grouping
    assert param_group_of("['blocks']['renormalizer']['kernel']") == "default"
    assert param_group_of("['blocks']['overhead']['kernel']") == "default"
    assert param_group_of("['blocks']['norm2_bias']") == "fp32"


def test_scaler_hysteresis_reference_semantics():
    """Ref utils.py:484-522: hysteresis_step counts UP per overflow; once it
    reaches hysteresis, EVERY further overflow backs off (no reset after a
    backoff); a growth event resets the counter."""
    params = {"w": jnp.ones((2, 2))}
    scaler = GradScalerConfig(initial_scale=2.0**8, hysteresis=2,
                              growth_interval=1, growth_factor=2.0, max_scale=2.0**20)
    state = init_optimizer_state(params, scaler)
    cfg = AdamWConfig(lr=0.0)
    inf_g = {"w": jnp.full((2, 2), jnp.inf)}
    ok_g = {"w": jnp.ones((2, 2))}

    # 1st overflow: hysteresis not yet exhausted -> no backoff
    _, state, _ = optimizer_step(params, inf_g, state, lr=0.0, adam_cfg=cfg, scaler_cfg=scaler)
    assert float(state["grad_scale"]) == 2.0**8
    # 2nd overflow: counter hits hysteresis -> backoff
    _, state, _ = optimizer_step(params, inf_g, state, lr=0.0, adam_cfg=cfg, scaler_cfg=scaler)
    assert float(state["grad_scale"]) == 2.0**7
    # 3rd overflow: counter stays exhausted -> backoff again immediately
    _, state, _ = optimizer_step(params, inf_g, state, lr=0.0, adam_cfg=cfg, scaler_cfg=scaler)
    assert float(state["grad_scale"]) == 2.0**6
    # growth event resets the hysteresis counter
    _, state, _ = optimizer_step(params, ok_g, state, lr=0.0, adam_cfg=cfg, scaler_cfg=scaler)
    assert float(state["grad_scale"]) == 2.0**7  # grew (interval 1)
    assert int(state["hysteresis_tracker"]) == 0
    # next single overflow: no backoff again (counter restarted)
    _, state, _ = optimizer_step(params, inf_g, state, lr=0.0, adam_cfg=cfg, scaler_cfg=scaler)
    assert float(state["grad_scale"]) == 2.0**7


def test_clip_zero_disables_clipping():
    """clip_grad_norm == 0 is the reference's clipping-off convention — grads
    must pass through unscaled, not be zeroed."""
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = init_optimizer_state(params)
    big = {"w": jnp.full((4, 4), 100.0)}
    cfg = AdamWConfig(lr=1e-2, clip_grad_norm=0.0, weight_decay=0.0)
    new_params, new_state, stats = optimizer_step(params, big, state, lr=1e-2, adam_cfg=cfg)
    assert int(new_state["step"]) == 1
    # params moved (adam update of a huge grad at lr 1e-2 is ~lr in magnitude)
    assert float(jnp.max(jnp.abs(new_params["w"] - params["w"]))) > 1e-3


def test_grad_norm_inf_nan_sentinels():
    """Reported grad_norm uses the reference sentinels: -1 = inf, -2 = nan."""
    params = {"w": jnp.ones((2, 2))}
    cfg = AdamWConfig(lr=0.0)
    _, _, st_inf = optimizer_step(params, {"w": jnp.full((2, 2), jnp.inf)},
                                  init_optimizer_state(params), lr=0.0, adam_cfg=cfg)
    assert float(st_inf["grad_norm"]) == -1.0
    _, _, st_nan = optimizer_step(params, {"w": jnp.full((2, 2), jnp.nan)},
                                  init_optimizer_state(params), lr=0.0, adam_cfg=cfg)
    assert float(st_nan["grad_norm"]) == -2.0


def test_gshard_capacity_formula():
    """Reference gshard_layer.py:121-130: ceil((tokens/experts)*factor)."""
    from internevo_tpu.models.moe.gshard import _capacity

    assert _capacity(9, 3, 1.2, 1) == 4    # ceil(3*1.2)=4 (not int(ceil(3)*1.2)=3)
    assert _capacity(10, 4, 2.0, 1) == 5   # ceil(2.5*2)=5 (not ceil(2.5)*2=6)
    assert _capacity(8, 4, 1.0, 4) == 4    # min_capacity floor
