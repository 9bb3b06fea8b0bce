"""Foundation tests: Config loader, mesh construction, sharding rules.

Parity targets: reference config semantics (`parallel_context.py:39-127`) and
derived-size sanity checks (`parallel_context.py:421-520`).
"""

import textwrap

import jax
import pytest
from jax.sharding import PartitionSpec as P

from internevo_tpu.core.config import Config
from internevo_tpu.core.context import ParallelContext, ParallelMode, _derive_sizes
from internevo_tpu.parallel.sharding import ShardingRules


def test_config_attr_access_and_nesting():
    cfg = Config({"model": {"hidden_size": 64, "sub": {"x": 1}}, "lr": 1e-4})
    assert cfg.model.hidden_size == 64
    assert cfg.model.sub.x == 1
    assert cfg["lr"] == 1e-4
    cfg.model.new_key = {"a": 2}
    assert cfg.model.new_key.a == 2


def test_config_from_file(tmp_path):
    p = tmp_path / "demo_cfg.py"
    p.write_text(
        textwrap.dedent(
            """
            SEQ_LEN = 128
            model = dict(hidden_size=64, num_layers=2)
            parallel = dict(zero1=dict(size=-1), tensor=dict(size=1, mode="mtp"))
            """
        )
    )
    cfg = Config.from_file(p)
    assert cfg.SEQ_LEN == 128
    assert cfg.model.hidden_size == 64
    assert cfg.parallel.tensor.mode == "mtp"


def test_derive_sizes_default():
    s = _derive_sizes(8, Config({"zero1": dict(size=-1), "tensor": dict(size=2), "pipeline": dict(size=2)}))
    assert s.pp == 2 and s.tp == 2 and s.dp_total == 2 and s.zero == 2 and s.dp == 1


def test_derive_sizes_zero_subgroup():
    s = _derive_sizes(8, Config({"zero1": dict(size=2), "tensor": 1, "pipeline": 1}))
    assert s.dp_total == 8 and s.zero == 2 and s.dp == 4


def test_derive_sizes_invalid():
    with pytest.raises(ValueError):
        _derive_sizes(8, Config({"zero1": dict(size=3), "tensor": 1, "pipeline": 1}))
    with pytest.raises(ValueError):
        _derive_sizes(8, Config({"zero1": dict(size=-1), "tensor": 3, "pipeline": 1}))


def test_mesh_build_8_devices():
    ctx = ParallelContext()
    ctx.load_config(Config({"parallel": dict(zero1=dict(size=2), tensor=dict(size=2, mode="msp"), pipeline=dict(size=1))}))
    mesh = ctx.init_parallel_groups(jax.devices())
    assert mesh.shape["tp"] == 2 and mesh.shape["zero"] == 2 and mesh.shape["dp"] == 2 and mesh.shape["pp"] == 1
    assert ctx.get_world_size(ParallelMode.DATA) == 4
    assert ctx.get_world_size(ParallelMode.TENSOR) == 2
    assert ctx.get_world_size(ParallelMode.GLOBAL) == 8
    assert ctx.tensor_mode == "msp"


def test_sharding_rules_mtp():
    rules = ShardingRules(mesh=None, tp_mode="mtp")
    assert rules.param_spec("embed", "qkv") == P(None, "tp")
    assert rules.param_spec("heads_in", "embed") == P("tp")
    assert rules.act_spec("batch", "seq", "act_embed") == P(("dp", "zero"))


def test_sharding_rules_msp_seq():
    rules = ShardingRules(mesh=None, tp_mode="msp")
    assert rules.act_spec("batch", "seq", "act_embed") == P(("dp", "zero"), "tp")


def test_sharding_rules_isp_weights():
    rules = ShardingRules(mesh=None, tp_mode="isp")
    assert rules.param_spec("embed", "mlp") == P(None, ("zero", "tp"))
    # no duplicate mesh-axis use across dims
    spec = rules.param_spec("mlp", "qkv")
    flat = [a for part in spec if part for a in (part if isinstance(part, tuple) else (part,))]
    assert len(flat) == len(set(flat))
