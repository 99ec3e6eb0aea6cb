"""Fused UMSE TIE-embedding kernel vs the pure-jnp formula (interpret on
CPU), values and grads, and UMSE module equivalence under both impls."""
import jax
import jax.numpy as jnp
import numpy as np

from medical_tri_modal_pilot_tpu.kernels.umse import pallas_umse, xla_umse
from medical_tri_modal_pilot_tpu.models.umse import UMSE, set_umse_impl


def _mk(B, L, D, seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros((B, L, 3), np.float32)
    x[:, :, 0] = rng.uniform(-24, 0, (B, L))
    x[:, :, 1] = rng.uniform(0, 1, (B, L))
    x[:, :, 2] = rng.integers(0, 20, (B, L))
    args = (jnp.asarray(x),
            jnp.asarray(rng.standard_normal((1, D)), jnp.float32),
            jnp.asarray(rng.standard_normal(D) * .1, jnp.float32),
            jnp.asarray(1 + rng.standard_normal(D) * .1, jnp.float32),
            jnp.asarray(rng.standard_normal(D) * .1, jnp.float32),
            jnp.asarray(rng.standard_normal((1, D)), jnp.float32),
            jnp.asarray(rng.standard_normal(D) * .1, jnp.float32),
            jnp.asarray(1 + rng.standard_normal(D) * .1, jnp.float32),
            jnp.asarray(rng.standard_normal(D) * .1, jnp.float32),
            jnp.asarray(rng.standard_normal((20, D)), jnp.float32))
    return args


def test_kernel_matches_formula():
    args = _mk(3, 77, 64)        # odd L exercises row padding
    a = xla_umse(*args, jnp.float32)
    b = pallas_umse(*args, jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_kernel_grads_match_formula():
    args = _mk(2, 33, 64, seed=1)

    def lp(*a):
        return (pallas_umse(*a, jnp.float32) ** 2).sum()

    def lx(*a):
        return (xla_umse(*a, jnp.float32) ** 2).sum()

    gp = jax.grad(lp, argnums=tuple(range(10)))(*args)
    gx = jax.grad(lx, argnums=tuple(range(10)))(*args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_umse_module_same_under_both_impls():
    m = UMSE(d_model=64, vslt_type="TIE")
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.stack([rng.uniform(-24, 0, (2, 50)),
                              rng.uniform(0, 1, (2, 50)),
                              rng.integers(0, 20, (2, 50))], axis=-1),
                    jnp.float32)
    age = jnp.asarray(rng.uniform(0, 1, 2), jnp.float32)
    gen = jnp.asarray([0.0, 1.0], jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, age, gen,
                    method=UMSE.embed_vslt)
    try:
        set_umse_impl(pallas_umse)
        a = m.apply(params, x, age, gen, method=UMSE.embed_vslt)
    finally:
        set_umse_impl(xla_umse)
    b = m.apply(params, x, age, gen, method=UMSE.embed_vslt)
    for u, w in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)
