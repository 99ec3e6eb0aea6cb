"""Pallas kernels × device mesh: a bare pallas_call is an opaque custom
call XLA's SPMD partitioner cannot split, so without wrapping every kernel
operand is all-gathered onto each device. ops.configure(mesh=...) wraps the
kernels in shard_map (ops/__init__.py docstring); these tests assert
(a) numerics match the XLA oracle, (b) the compiled HLO holds ZERO
all-gathers, on both a 1-D data mesh and a 2-D (data, model) mesh."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medical_tri_modal_pilot_tpu import ops
from medical_tri_modal_pilot_tpu.models import modules


@pytest.fixture(autouse=True)
def _restore_dispatch():
    yield
    ops.configure(False)


def _mesh_2d():
    return Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))


def _mesh_1d():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


@pytest.mark.parametrize("mesh_fn", [_mesh_1d, _mesh_2d])
def test_wrapped_attention_matches_oracle_no_allgather(mesh_fn):
    mesh = mesh_fn()
    ops.configure(True, mesh=mesh)
    att = ops.current_attention_impl()
    rng = np.random.default_rng(0)
    B, L, H, Dh = 8, 256, 4, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    lens = np.array([30, 256, 100, 250, 7, 64, 128, 200])
    m = jnp.asarray(np.arange(L)[None] >= lens[:, None])
    qs = jax.device_put(q, NamedSharding(
        mesh, P("data", None, "model" if "model" in mesh.axis_names else None)))
    ms = jax.device_put(m, NamedSharding(mesh, P("data")))

    f = jax.jit(lambda q, m: att(q, q, q, m, float(np.sqrt(Dh)), True))
    out = np.asarray(f(qs, ms))
    ref = np.asarray(modules.masked_softmax_attention(
        q, q, q, m, float(np.sqrt(Dh)), True))
    live = ~np.asarray(m)[:, :, None, None]
    assert np.max(np.abs(out - ref) * live) < 5e-5

    hlo = f.lower(qs, ms).compile().as_text()
    assert len(re.findall(r"all-gather", hlo)) == 0


def test_wrapped_ffn_matches_unwrapped():
    mesh = _mesh_1d()
    ops.configure(True, mesh=mesh)
    from medical_tri_modal_pilot_tpu.kernels.ffn import pallas_ffn
    wrapped = modules._FFN_IMPL
    assert wrapped is not pallas_ffn
    rng = np.random.default_rng(1)
    B, L, C, F = 8, 64, 64, 256
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, C), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, C), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, F)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.05, F), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (F, C)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, C), jnp.float32)
    a = wrapped(x, gamma, beta, w1, b1, w2, b2, p=0.1, deterministic=True,
                seed=None)
    b = pallas_ffn(x, gamma, beta, w1, b1, w2, b2, p=0.1, deterministic=True,
                   seed=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_mesh_uses_xla_ffn():
    # under --mp-size > 1 the FFN stays on the XLA path so SPMD shards its
    # matmuls over 'model' (the fused kernel would force the w1/w2 shards
    # back together)
    ops.configure(True, mesh=_mesh_2d())
    assert modules._FFN_IMPL is None


def test_odd_batch_falls_back():
    mesh = _mesh_1d()
    ops.configure(True, mesh=mesh)
    att = ops.current_attention_impl()
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(3, 64, 4, 32)), jnp.float32)  # 3 % 8 != 0
    out = att(q, q, q, None, float(np.sqrt(32)), False)
    ref = modules.masked_softmax_attention(q, q, q, None, float(np.sqrt(32)),
                                           False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
