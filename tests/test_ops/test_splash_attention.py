"""Splash (flattened-grid) attention vs the jnp oracle (interpret mode).

The max_segment_len contract: every packed segment is at most that long
(PackedDatasetWithCut re-splits at max_length_per_sample), which lets the
kernel statically budget kv visits per q block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

from internevo_tpu.ops.attention import attention_reference
from internevo_tpu.ops.pallas.splash_attention import splash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _packed_segments(B, S, max_len, seed=0):
    """Contiguous runs, none longer than max_len, mimicking cut-packing."""
    rng = np.random.RandomState(seed)
    seg = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        pos, sid = 0, 1
        while pos < S:
            n = rng.randint(max(1, max_len // 3), max_len + 1)
            seg[b, pos : pos + n] = sid
            pos += n
            sid += 1
    return jnp.asarray(seg)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("max_seg", [None, 128])
def test_forward_matches_reference(causal, max_seg):
    B, S, H, D = 2, 512, 2, 64
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = _packed_segments(B, S, 128)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=causal)
    out = splash_attention(q, k, v, segment_ids=seg, causal=causal,
                           block_q=128, block_k=128, max_segment_len=max_seg,
                           interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_forward_no_segments():
    B, S, H, D = 1, 512, 2, 64
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    out_ref = attention_reference(q, k, v, causal=True)
    out = splash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gqa", [False, True])
@pytest.mark.parametrize("max_seg", [None, 128])
def test_backward_matches_reference(gqa, max_seg):
    B, S, D = 1, 512, 32
    Hq, Hkv = (4, 2) if gqa else (2, 2)
    q = _rand((B, S, Hq, D), 0)
    k, v = _rand((B, S, Hkv, D), 1), _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)

    def loss_splash(q, k, v):
        out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                               block_q=128, block_k=128, max_segment_len=max_seg,
                               interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, segment_ids=seg, causal=True)
        return jnp.sum(out * jnp.cos(out))

    g_s = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


def test_nonmonotonic_pad_and_uneven_blocks():
    """Eval-style [real | pad-0] rows with the boundary mid-block."""
    B, S, H, D = 1, 256, 2, 32
    n_real = 160
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = np.zeros((B, S), dtype=np.int32)
    seg[:, :n_real] = 1
    seg = jnp.asarray(seg)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                           block_q=64, block_k=64, max_segment_len=256, interpret=True)
    np.testing.assert_allclose(out[:, :n_real], out_ref[:, :n_real], rtol=2e-5, atol=2e-5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_single_long_segment_with_bound():
    """A segment exactly at max_segment_len crossing many blocks."""
    B, S, H, D = 1, 512, 1, 32
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = np.ones((B, S), dtype=np.int32)
    seg[:, 256:] = 2
    seg = jnp.asarray(seg)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                           block_q=64, block_k=64, max_segment_len=256, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_pallas_gspmd_dispatch_shard_map_island():
    """Mosaic kernels cannot be auto-partitioned by GSPMD: on a multi-device
    mesh the dispatcher must wrap the kernel in a fully-manual shard_map
    island (batch over dp/zero, heads over tp, gather fallback when
    tp > kv_heads) with fwd AND grads matching the reference."""
    from jax.sharding import Mesh

    from internevo_tpu.core.context import MESH_AXES
    from internevo_tpu.ops.attention import flash_attention, set_use_pallas
    from internevo_tpu.parallel import sharding as shmod

    set_use_pallas(True)  # pallas path; interpret mode on CPU
    devs = np.array(jax.devices()[:4]).reshape(1, 2, 1, 1, 2)
    mesh = Mesh(devs, MESH_AXES)
    old_rules = shmod.get_rules()
    shmod.set_rules(shmod.ShardingRules(mesh=mesh, tp_mode="mtp"))
    try:
        for Hq, Hkv in ((4, 4), (4, 1)):  # tp-sharded heads; tp>kv gather fallback
            B, S, D = 2, 256, 32
            q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Hq, D), jnp.float32)
            k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D), jnp.float32)
            v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D), jnp.float32)
            seg = jnp.asarray(np.repeat([1, 2], S // 2)[None].repeat(B, 0).astype(np.int32))

            def loss_fl(q, k, v):
                o = flash_attention(q, k, v, segment_ids=seg, causal=True,
                                    max_segment_len=S // 2)
                return jnp.sum(o * jnp.cos(o))

            def loss_ref(q, k, v):
                o = attention_reference(q, k, v, segment_ids=seg, causal=True)
                return jnp.sum(o * jnp.cos(o))

            lf, gf = jax.jit(jax.value_and_grad(loss_fl, argnums=(0, 1, 2)))(q, k, v)
            lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
            np.testing.assert_allclose(lf, lr, rtol=1e-5)
            for a, b, n in zip(gf, gr, "qkv"):
                np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5,
                                           err_msg=f"Hkv={Hkv} d{n}")
    finally:
        set_use_pallas(None)
        shmod.set_rules(old_rules)


def test_non_divisible_block_autofit():
    """S not divisible by the default 1024 block: the wrapper must shrink to a
    dividing block (1536 -> 512) instead of crashing (review finding r2)."""
    B, S, H, D = 1, 1536, 2, 32
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = _packed_segments(B, S, 512)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                           max_segment_len=512, interpret=True)  # default blocks
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_pathological_length_falls_back():
    """A length with no sublane-aligned divisor must route to the jnp
    reference rather than fail."""
    B, S, H, D = 1, 129, 2, 32  # prime-ish: no divisor multiple of 8
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    out_ref = attention_reference(q, k, v, causal=True)
    out = splash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_backward_chunked_wide_gqa(monkeypatch):
    """q_per_kv > 8 (MQA-ish) must route through the chunked-backward path
    (dk/dv summed over q-head subsets) and still match the reference grads."""
    from internevo_tpu.ops.pallas import splash_attention as sa

    B, S, D = 1, 256, 32
    Hq, Hkv = 16, 1  # q_per_kv = 16 > the 8-chain cap -> chunked
    q = _rand((B, S, Hq, D), 0)
    k, v = _rand((B, S, Hkv, D), 1), _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)

    gk, qc = sa._pick_bwd_partition(Hkv, Hq // Hkv, S, 128, 128, D)
    assert qc < Hq // Hkv, (gk, qc)  # the partition really chunks

    def loss_splash(q, k, v):
        out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                               block_q=128, block_k=128, max_segment_len=128,
                               interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, segment_ids=seg, causal=True)
        return jnp.sum(out * jnp.cos(out))

    g_s = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


def test_backward_chunked_by_vmem_budget(monkeypatch):
    """A tiny VMEM budget must force q-head chunking on an ordinary GQA shape
    without changing the grads."""
    monkeypatch.setenv("IEVO_FLASH_VMEM_MB_BWD", "0")
    from internevo_tpu.ops.pallas import splash_attention as sa

    B, S, D = 1, 256, 32
    Hq, Hkv = 4, 2
    gk, qc = sa._pick_bwd_partition(Hkv, Hq // Hkv, S, 128, 128, D)
    assert (gk, qc) == (1, 1), (gk, qc)

    q = _rand((B, S, Hq, D), 0)
    k, v = _rand((B, S, Hkv, D), 1), _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)

    def loss_splash(q, k, v):
        out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                               block_q=128, block_k=128, max_segment_len=128,
                               interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, segment_ids=seg, causal=True)
        return jnp.sum(out * jnp.cos(out))

    g_s = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


# ------------------------------------------------------------ attention dropout


def _aligned_segments(B, S, seg_len):
    n = S // seg_len
    seg = np.repeat(np.arange(1, n + 1, dtype=np.int32), seg_len)
    return jnp.asarray(np.tile(seg, (B, 1)))


def _recover_dropped_probs(B, S, Hq, seg_len, rate, seed, causal=True):
    """With 128-aligned segments and v = tiled identity, each q row attends
    only inside its own 128-token segment, so out rows ARE the dropped
    probability rows D = dropout(softmax(s)) — recoverable exactly."""
    D = seg_len  # = LANES so the identity trick is exact
    q = _rand((B, S, Hq, D), 3)
    k = _rand((B, S, Hq, D), 4)
    v = jnp.asarray(np.tile(np.eye(D, dtype=np.float32), (B, S // D, 1)).reshape(B, S, 1, D))
    v = jnp.broadcast_to(v, (B, S, Hq, D))
    seg = _aligned_segments(B, S, seg_len)
    out = splash_attention(q, k, v, segment_ids=seg, causal=causal,
                           block_q=128, block_k=128, max_segment_len=seg_len,
                           interpret=True, dropout_rate=rate,
                           dropout_seed=jnp.asarray(seed, jnp.int32))
    ref = attention_reference(q, k, v, segment_ids=seg, causal=causal)
    return q, k, v, seg, np.asarray(out, np.float64), np.asarray(ref, np.float64)


def test_attention_dropout_zeroes_probs_and_scales():
    """Dropout entries are either 0 or ref/(1-rate); the keep fraction matches
    the rate; the mask is deterministic in the seed and varies across seeds."""
    B, S, Hq, seg_len, rate = 1, 512, 2, 128, 0.4
    q, k, v, seg, out, ref = _recover_dropped_probs(B, S, Hq, seg_len, rate, 7)
    scaled = ref / (1.0 - rate)
    # rows of `out` are dropped prob rows: each entry ~0 or ~scaled
    is_zero = np.abs(out) < 1e-6
    is_kept = np.abs(out - scaled) < 1e-3 * np.maximum(1.0, np.abs(scaled))
    assert np.all(is_zero | is_kept)
    # keep fraction over entries with non-negligible prob mass
    sig = np.abs(scaled) > 1e-4
    keep_frac = np.mean(is_kept[sig])
    assert abs(keep_frac - (1 - rate)) < 0.03, keep_frac
    # deterministic per seed; different seed -> different mask
    _, _, _, _, out2, _ = _recover_dropped_probs(B, S, Hq, seg_len, rate, 7)
    np.testing.assert_array_equal(out, out2)
    _, _, _, _, out3, _ = _recover_dropped_probs(B, S, Hq, seg_len, rate, 8)
    assert not np.array_equal(out, out3)


def test_attention_dropout_grads_match_masked_reference():
    """Backward regenerates the forward's mask: kernel grads must equal jnp
    grads computed with the RECOVERED mask held fixed (flash-attn dropout
    semantics).  GQA + a forced q-head chunk exercise the global-head mask
    indexing across chunked backward calls."""
    import os

    B, S, Hq, Hkv, seg_len, rate, seed = 1, 256, 4, 2, 128, 0.3, 11
    D = seg_len
    q = _rand((B, S, Hq, D), 5)
    k = _rand((B, S, Hkv, D), 6)
    v = jnp.asarray(np.tile(np.eye(D, dtype=np.float32), (B, S // D, 1)).reshape(B, S, 1, D))
    v = jnp.broadcast_to(v, (B, S, Hkv, D))
    seg = _aligned_segments(B, S, seg_len)
    kw = dict(segment_ids=seg, causal=True, block_q=128, block_k=128,
              max_segment_len=seg_len, interpret=True)

    out = splash_attention(q, k, v, dropout_rate=rate,
                           dropout_seed=jnp.asarray(seed, jnp.int32), **kw)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    mask = (np.abs(np.asarray(out, np.float64)) > 1e-6) & (
        np.abs(np.asarray(ref, np.float64)) > 1e-9)
    # mask recovered in (B, S, Hq, Skv-within-segment) identity coordinates ->
    # rebuild the full (B, Hq, S, Skv) keep mask
    keep = np.zeros((B, Hq, S, S), bool)
    for blk in range(S // seg_len):
        rows = slice(blk * seg_len, (blk + 1) * seg_len)
        keep[:, :, rows, rows] = np.transpose(mask[:, rows], (0, 2, 1, 3))
    keep_j = jnp.asarray(keep)

    def loss_kernel(q, k, v):
        o = splash_attention(q, k, v, dropout_rate=rate,
                             dropout_seed=jnp.asarray(seed, jnp.int32), **kw)
        return jnp.sum(o * jnp.cos(o))

    def loss_masked_ref(q, k, v):
        from internevo_tpu.ops.attention import _repeat_kv

        kk = _repeat_kv(k, Hq // Hkv)
        vv = _repeat_kv(v, Hq // Hkv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kk,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        cmask = jnp.tril(jnp.ones((S, S), bool))[None, None]
        smask = (seg[:, None, :, None] == seg[:, None, None, :])
        logits = jnp.where(cmask & smask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.where(keep_j, probs / (1 - rate), 0.0)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vv.dtype), vv)
        return jnp.sum(o * jnp.cos(o))

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_masked_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_k, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")

    # chunked backward (tiny VMEM budget) must reproduce the same grads
    os.environ["IEVO_FLASH_VMEM_MB_BWD"] = "0"
    try:
        from internevo_tpu.ops.pallas import splash_attention as sa

        gk, qc = sa._pick_bwd_partition(Hkv, Hq // Hkv, S, 128, 128, D)
        assert (gk, qc) == (1, 1), (gk, qc)
        g_c = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    finally:
        del os.environ["IEVO_FLASH_VMEM_MB_BWD"]
    for a, b, name in zip(g_c, g_k, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=f"d{name} chunked")


def test_attention_dropout_kernel_matches_dense_fallback():
    """The dense jnp path (attention_reference / the no-aligned-block
    fallback) draws the SAME counter-hash mask as the kernel, so kernel and
    fallback produce the same dropped model (bit-identical masks, fp-equal
    outputs).  GQA shapes; offsets zero."""
    B, S, Hq, Hkv, D = 2, 256, 4, 2, 64
    q = _rand((B, S, Hq, D), 21)
    k = _rand((B, S, Hkv, D), 22)
    v = _rand((B, S, Hkv, D), 23)
    seg = _aligned_segments(B, S, 128)
    rate, seed = 0.35, jnp.asarray(9, jnp.int32)
    out_k = splash_attention(q, k, v, segment_ids=seg, causal=True,
                             block_q=128, block_k=128, max_segment_len=128,
                             interpret=True, dropout_rate=rate, dropout_seed=seed)
    out_d = attention_reference(q, k, v, segment_ids=seg, causal=True,
                                dropout_rate=rate, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_d),
                               rtol=2e-5, atol=2e-5)


def test_stacked_backward_matches_chain_backward(monkeypatch):
    """IEVO_FLASH_BWD_STACKED=1 (whole-GQA-group stacked matmuls, the
    forward's layout) must produce the same grads as the default per-head
    chain schedule — segments + GQA + dropout exercised."""
    B, S, Hq, Hkv, D, rate, seed = 1, 256, 4, 2, 64, 0.2, 13
    q = _rand((B, S, Hq, D), 31)
    k = _rand((B, S, Hkv, D), 32)
    v = _rand((B, S, Hkv, D), 33)
    seg = _aligned_segments(B, S, 128)
    kw = dict(segment_ids=seg, causal=True, block_q=128, block_k=128,
              max_segment_len=128, interpret=True,
              dropout_rate=rate, dropout_seed=jnp.asarray(seed, jnp.int32))

    def loss(q, k, v):
        o = splash_attention(q, k, v, **kw)
        return jnp.sum(o * jnp.cos(o))

    monkeypatch.delenv("IEVO_FLASH_BWD_STACKED", raising=False)
    g_chain = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("IEVO_FLASH_BWD_STACKED", "1")
    g_stacked = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, c, name in zip(g_stacked, g_chain, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5,
                                   atol=1e-6, err_msg=f"d{name}")

    # no-dropout, no-segment variant vs the dense reference
    kw2 = dict(causal=True, block_q=128, block_k=128, interpret=True)

    def loss_s(q, k, v):
        return jnp.sum(jnp.sin(splash_attention(q, k, v, **kw2)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v, causal=True)))

    g_s = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, c, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=5e-5,
                                   atol=5e-5, err_msg=f"d{name} vs ref")


# ------------------------------------------------------------ BSD layout path


@pytest.mark.parametrize("gqa", [False, True])
@pytest.mark.parametrize("max_seg", [None, 128])
def test_bsd_layout_matches_reference(monkeypatch, gqa, max_seg):
    """BSD (B, S, H*D) kernel layout (``_use_bsd``): forward AND gradients
    must match the dense reference — the layout only changes how heads are
    sliced off the lane dimension, not the math."""
    monkeypatch.setenv("IEVO_FLASH_BSD", "1")
    B, S, D = 1, 512, 64
    Hq, Hkv = (4, 2) if gqa else (2, 2)
    q = _rand((B, S, Hq, D), 0)
    k = _rand((B, S, Hkv, D), 1)
    v = _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)
    kw = dict(segment_ids=seg, causal=True, block_q=128, block_k=128,
              max_segment_len=max_seg, interpret=True)

    out = splash_attention(q, k, v, **kw)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)

    def loss_s(q, k, v):
        return jnp.sum(jnp.sin(splash_attention(q, k, v, **kw)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(
            q, k, v, segment_ids=seg, causal=True)))

    g_s = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, c, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=5e-5,
                                   atol=5e-5, err_msg=f"d{name} vs ref")


def test_bsd_matches_head_major_bitwise(monkeypatch):
    """The two layouts run the same math in the same order per head — outputs
    and grads must agree to fp32 tolerance on identical inputs."""
    B, S, Hq, Hkv, D = 1, 512, 4, 2, 64
    q = _rand((B, S, Hq, D), 0)
    k = _rand((B, S, Hkv, D), 1)
    v = _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)
    kw = dict(segment_ids=seg, causal=True, block_q=128, block_k=128,
              max_segment_len=128, interpret=True)

    def loss(q, k, v):
        o = splash_attention(q, k, v, **kw)
        return jnp.sum(o * jnp.cos(o))

    monkeypatch.setenv("IEVO_FLASH_BSD", "0")
    out_hm = splash_attention(q, k, v, **kw)
    g_hm = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("IEVO_FLASH_BSD", "1")
    out_bsd = splash_attention(q, k, v, **kw)
    g_bsd = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out_bsd), np.asarray(out_hm),
                               rtol=1e-6, atol=1e-6)
    for a, c, name in zip(g_bsd, g_hm, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5,
                                   atol=1e-6, err_msg=f"d{name}")


def test_bsd_dropout_matches_dense_fallback(monkeypatch):
    """In-kernel dropout under BSD hashes the same GLOBAL (row, col, head)
    coordinates as the dense mask — bitwise-identical dropped model."""
    monkeypatch.setenv("IEVO_FLASH_BSD", "1")
    from internevo_tpu.ops.pallas.splash_attention import dropout_mask_dense

    B, S, Hq, Hkv, D = 1, 256, 4, 2, 64
    q = _rand((B, S, Hq, D), 3)
    k = _rand((B, S, Hkv, D), 4)
    v = _rand((B, S, Hkv, D), 5)
    seg = _packed_segments(B, S, 128)
    seed = jnp.asarray(7, jnp.int32)
    out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                           block_q=128, block_k=128, max_segment_len=128,
                           interpret=True, dropout_rate=0.3, dropout_seed=seed)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True,
                                  dropout_rate=0.3, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_bsd_chunked_wide_gqa(monkeypatch):
    """BSD + q-head chunking (VMEM-forced): the chunk slicing runs on the
    (B, S, Hkv, q_per_kv, D) grouping instead of head-major."""
    monkeypatch.setenv("IEVO_FLASH_BSD", "1")
    monkeypatch.setenv("IEVO_FLASH_VMEM_MB_BWD", "1")  # force chunking
    B, S, Hkv, qpk, D = 1, 256, 1, 4, 64
    Hq = Hkv * qpk
    q = _rand((B, S, Hq, D), 0)
    k = _rand((B, S, Hkv, D), 1)
    v = _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)
    kw = dict(segment_ids=seg, causal=True, block_q=128, block_k=128,
              max_segment_len=128, interpret=True)

    def loss_s(q, k, v):
        return jnp.sum(jnp.sin(splash_attention(q, k, v, **kw)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(
            q, k, v, segment_ids=seg, causal=True)))

    g_s = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, c, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=5e-5,
                                   atol=5e-5, err_msg=f"d{name} vs ref")
