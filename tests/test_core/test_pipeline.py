"""Pipeline parallelism: loss equivalence vs non-pipeline execution.

Parity: reference ``tests/test_core/test_pipeline.py`` compares pipeline
scheduler output+grads against a plain sequential model.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

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


def test_pp2_isp2_sequence_parallel():
    """isp (Ulysses) inside the pipeline: stage activations stay seq-sharded
    over tp, attention reshards seq->heads via all-to-all, weights are full.
    Must match the dp baseline (reference runs ISP through both pipeline
    schedulers — ``core/scheduler/pipeline_scheduler.py:40-66``, CI pins
    training_16GPU_4DP2TP2PP_ISP)."""
    losses_dp, gn_dp = _run(_cfg(data=dict(micro_num=4)), steps=2, n_devices=2)
    losses_isp, gn_isp = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="isp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_isp, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(gn_dp, gn_isp, rtol=2e-3, atol=2e-4)


def test_pp2_isp2_wp2_weight_parallel():
    """isp + weight-parallel storage inside the pipeline: params are stored
    wp-sharded and gathered just-in-time per micro inside the vjp (reference
    ``ISPCommunicator`` prefetch, ``core/communication/isp.py:143-527``);
    grads return wp-sharded through the gather transpose.  Loss + grad-norm
    must match the dp baseline."""
    losses_dp, gn_dp = _run(_cfg(data=dict(micro_num=4)), steps=2, n_devices=2)
    losses_wp, gn_wp = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="isp"),
                           pipeline=dict(size=2), weight=dict(size=2))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_wp, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(gn_dp, gn_wp, rtol=2e-3, atol=2e-4)


def test_pp2_rsp2_ring_attention():
    """rsp (ring attention) inside the pipeline: seq-sharded end-to-end with
    kv rotating around the tp ring — head-count-free sequence scaling."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4)), steps=2, n_devices=2)
    losses_rsp, _ = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="rsp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_rsp, rtol=3e-4, atol=3e-5)


def test_interleaved_pp2_isp2():
    """isp composed with the interleaved (virtual-chunk) schedule."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4), model=dict(num_layers=4)),
                        steps=2, n_devices=2)
    losses_il, _ = _run(
        _cfg(data=dict(micro_num=4), model=dict(num_layers=4, num_chunks=2),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="isp"),
                           pipeline=dict(size=2), weight=dict(size=2))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_il, rtol=3e-4, atol=3e-5)


def test_interleaved_params_pipeline_order_and_canonical_ckpt(tmp_path):
    """Interleaved pp stores block params in PIPELINE order in memory (no
    per-step take/un-take resharding — reference holds chunk-local weights,
    ``pipeline_scheduler.py:711+``) while checkpoints hold NATURAL order, so
    they round-trip across pp/num_chunks topologies."""
    import jax
    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.parallel.pipeline import interleaved_layer_layout
    from internevo_tpu.train.pipeline import (
        initialize_model, initialize_optimizer, initialize_trainer,
    )
    from internevo_tpu.checkpoint.checkpoint_manager import (
        CheckpointLoadMask, try_load_internevo_ckpt,
    )
    from internevo_tpu.core.config import Config
    from internevo_tpu.checkpoint.checkpoint_manager import CheckpointManager

    from tests.test_training.test_loss import demo_config

    from internevo_tpu.core.trainer import TrainState

    def build(parallel, n_devices, num_layers=4, chunks=None):
        model_over = dict(num_layers=num_layers)
        if chunks:
            model_over["num_chunks"] = chunks
        cfg = demo_config(model=model_over, parallel=parallel)
        launch(cfg, seed=1024, devices=jax.devices()[:n_devices])
        model, params = initialize_model()
        opt_state, lrs, b2 = initialize_optimizer(model, params)
        trainer = initialize_trainer(model, params, opt_state, lrs, b2)
        return trainer, TrainState(gpc.config)

    il = dict(zero1=dict(size=2), tensor=dict(size=1, mode="mtp"),
              pipeline=dict(size=2), weight=dict(size=1))
    tr_il, ts_il = build(il, 4, chunks=2)
    perm, inv = interleaved_layer_layout(4, 2, 2)
    assert list(perm) != list(range(4))  # layout is actually non-identity
    w_il = np.asarray(tr_il.engine.params["blocks"]["w1"]["kernel"])

    mgr = CheckpointManager(
        Config(dict(enable_save_ckpt=True, save_ckpt_folder=str(tmp_path / "c"),
                    checkpoint_every=5, auto_resume=True, async_upload=False,
                    oss_snapshot_freq=0, load_ckpt_info=None)),
        engine=tr_il.engine, train_state=ts_il, model_config={})
    path = str(tmp_path / "c" / "0")
    mgr.save_checkpoint(path, ts_il)

    # same-topology round trip: loaded params must equal the saved ones
    tr_il2, ts_il2 = build(il, 4, chunks=2)
    try_load_internevo_ckpt(tr_il2.engine, ts_il2, path,
                            CheckpointLoadMask(("model", "optimizer")))
    np.testing.assert_array_equal(
        np.asarray(tr_il2.engine.params["blocks"]["w1"]["kernel"]), w_il)

    # cross-topology: pp=1 init (natural order) must equal the checkpoint as
    # loaded (same seed -> same natural init across topologies)
    pp1 = dict(zero1=dict(size=1), tensor=dict(size=1, mode="mtp"),
               pipeline=dict(size=1), weight=dict(size=1))
    tr_nat, ts_nat = build(pp1, 1)
    w_nat = np.asarray(tr_nat.engine.params["blocks"]["w1"]["kernel"])
    np.testing.assert_array_equal(w_il, w_nat[perm])  # memory is pipeline order
    try_load_internevo_ckpt(tr_nat.engine, ts_nat, path,
                            CheckpointLoadMask(("model",)))
    np.testing.assert_array_equal(
        np.asarray(tr_nat.engine.params["blocks"]["w1"]["kernel"]), w_nat)


def test_1f1b_memory_flat_in_micro_num():
    """True-1F1B criterion (reference pipeline_scheduler.py:375-430 bounds
    in-flight microbatches to O(pp)): compiled temp memory must NOT grow with
    micro_num.  The old GPipe path buffered O(micro_num) stage outputs."""
    import jax.numpy as jnp
    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import (
        initialize_model, initialize_optimizer, initialize_trainer,
    )

    def temp_bytes(micro_num, num_chunks=1):
        seq, vocab = 128, 512
        config = _cfg(
            data=dict(seq_len=seq, micro_num=micro_num, micro_bsz=1),
            model=dict(vocab_size=vocab, hidden_size=64, num_layers=4 * num_chunks,
                       num_attention_heads=4, num_chunks=num_chunks),
            parallel=dict(zero1=dict(size=4), tensor=dict(size=1, mode="mtp"),
                          pipeline=dict(size=2), weight=dict(size=1)),
        )
        launch(config, seed=1024)
        model, params = initialize_model()
        opt_state, lr_sched, beta2_sched = initialize_optimizer(model, params)
        trainer = initialize_trainer(model, params, opt_state, lr_sched, beta2_sched)
        dp = gpc.sizes.dp_total
        rng = np.random.RandomState(0)
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, vocab, (micro_num, dp, seq), dtype=np.int32)),
            "segment_ids": jnp.ones((micro_num, dp, seq), jnp.int32),
            "indexes": jnp.asarray(np.tile(np.arange(seq, dtype=np.int32), (micro_num, dp, 1))),
            "labels": jnp.asarray(rng.randint(0, vocab, (micro_num, dp, seq), dtype=np.int32)),
        }
        comp = trainer.engine.train_step_fn.lower(
            params, opt_state, batch, jnp.zeros(()), jnp.zeros(())).compile()
        return comp.memory_analysis().temp_size_in_bytes

    t2, t8 = temp_bytes(2), temp_bytes(8)
    # batch arrays themselves grow with micro_num; everything else must not
    slack = 6 * 128 * 4 * 4 * 8  # 4 int32 (M,dp,seq) arrays' growth, amortized
    assert t8 <= t2 * 1.10 + slack, (t2, t8)
    # interleaved (num_chunks=2) shares the 1F1B loop: flat as well
    i2, i8 = temp_bytes(2, num_chunks=2), temp_bytes(8, num_chunks=2)
    assert i8 <= i2 * 1.10 + slack, (i2, i8)


def test_tp_grads_match_baseline():
    """Per-PARAMETER grad equality across tp modes vs the tp=1 pipeline.

    Round-1's manual-TP pipeline had a uniform x-tp factor on every grad
    (head psums transposing to psum double-counted replicated cotangents) and
    x-2tp on seq-parallel norm grads — invisible in loss-curve tests because
    Adam updates are scale-invariant.  This pins exact per-tensor equality."""
    import jax
    import jax.numpy as jnp
    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.parallel.pipeline import pipeline_loss_fn
    from internevo_tpu.parallel.sharding import get_rules
    from internevo_tpu.train.pipeline import initialize_model

    def grads_for(tp, mode):
        config = _cfg(
            data=dict(micro_num=4),
            model=dict(num_layers=2, hidden_size=64, num_attention_heads=4, vocab_size=512),
            parallel=dict(zero1=dict(size=2), tensor=dict(size=tp, mode=mode),
                          pipeline=dict(size=2), weight=dict(size=1)),
        )
        launch(config, seed=1024, devices=jax.devices()[: 4 * tp])
        model, params = initialize_model()
        rules = get_rules()
        loss_fn = pipeline_loss_fn(model.config, rules.mesh, 2, 0.0,
                                   num_chunks=1, tp_mode=mode)
        rng = np.random.RandomState(0)
        M, dpb, S = 4, gpc.sizes.dp_total, 128
        batch = {
            "input_ids": jnp.asarray(rng.randint(0, 512, (M, dpb, S), dtype=np.int32)),
            "segment_ids": jnp.ones((M, dpb, S), jnp.int32),
            "indexes": jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (M, dpb, 1))),
            "labels": jnp.asarray(rng.randint(0, 512, (M, dpb, S), dtype=np.int32)),
        }
        grads, _ = jax.jit(jax.grad(lambda p, b: loss_fn(p, b), has_aux=True))(params, batch)
        return jax.device_get(grads)

    g_ref = grads_for(1, "mtp")
    for tp, mode in ((2, "mtp"), (2, "msp")):
        g = grads_for(tp, mode)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat = dict(jax.tree_util.tree_leaves_with_path(g))
        for path, ref_leaf in flat_ref:
            np.testing.assert_allclose(
                flat[path], ref_leaf, rtol=2e-4, atol=1e-6,
                err_msg=f"{mode} tp={tp} {jax.tree_util.keystr(path)}")


def test_pp2_tp4_gqa_group_kv_heads2():
    """tp (4) > num_kv_heads (2): kv weights replicate within the 2-rank GQA
    groups and their grads sum at the boundary (reference Initializer_GQA);
    loss AND grad-norm must match the tp=1 pipeline baseline."""
    model = dict(num_layers=2, hidden_size=64, num_attention_heads=8,
                 num_kv_attention_heads=2, vocab_size=512)
    losses_ref, gn_ref = _run(
        _cfg(data=dict(micro_num=4), model=model,
             parallel=dict(zero1=dict(size=1), tensor=dict(size=1, mode="mtp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2, n_devices=2)
    losses_gqa, gn_gqa = _run(
        _cfg(data=dict(micro_num=4), model=model,
             parallel=dict(zero1=dict(size=1), tensor=dict(size=4, mode="mtp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2)
    np.testing.assert_allclose(losses_ref, losses_gqa, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(gn_ref, gn_gqa, rtol=2e-3, atol=2e-4)


def test_interleaved_pp2_chunks2_rsp2():
    """Interleaved (virtual-chunk) schedule composed with RING sequence
    parallelism: 8 layers over pp=2 x chunks=2 with rsp tp=2 must match the
    dp baseline (the ring's must-execute collectives compose with the
    chunk-interleaved lockstep ticks)."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4), model=dict(num_layers=4)),
                        steps=2, n_devices=2)
    losses_il, _ = _run(
        _cfg(data=dict(micro_num=4), model=dict(num_layers=4, num_chunks=2),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="rsp"),
                           pipeline=dict(size=2), weight=dict(size=1))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_il, rtol=3e-4, atol=3e-5)


def test_pp2_rsp2_wp2_weight_parallel():
    """rsp + weight-parallel storage (beyond-reference composition): ring
    sequence parallelism with wp=2-sharded weight storage through the
    pipeline matches the dp baseline.  The reference ties wp to isp
    (launch.py:383-384); rsp shares the isp just-in-time gather machinery."""
    losses_dp, _ = _run(_cfg(data=dict(micro_num=4)), steps=2, n_devices=2)
    losses_rw, _ = _run(
        _cfg(data=dict(micro_num=4),
             parallel=dict(zero1=dict(size=2), tensor=dict(size=2, mode="rsp"),
                           pipeline=dict(size=2), weight=dict(size=2))),
        steps=2,
    )
    np.testing.assert_allclose(losses_dp, losses_rw, rtol=3e-4, atol=3e-5)
