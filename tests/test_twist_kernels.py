"""Twisted quad DS kernels (pallas_ds_twist.py): interpret-mode value and
gradient parity against dense float64 references.

TILE is patched down to 4 for the duration so the statically-unrolled
kernel bodies interpret in seconds (lane alignment only matters on real
hardware; the recursion/seed logic is TILE-agnostic).  The real-hardware
check at TILE=128 lives in tools/twist_probe.py + KERNELCHECK.json.

Tolerances are the interpret-mode DS envelope, NOT a twist property: on
identical inputs the untwisted kernels show bit-identical deviations
(s_kuu err 7.671e-11 both) — XLA:CPU's excess-precision simplifications
nibble at the double-single compensation patterns that Mosaic compiles
faithfully on the TPU (full chase record: tools/twist_check.py docstring;
hardware validation: tools/twist_probe.py, KERNELCHECK matern_core rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu import banded
from asvgp_tpu.banded import pallas_ds_twist as pdw
from asvgp_tpu.banded import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interp_small_tile():
    pk.set_interpret(True)
    old = pdw.TILE
    pdw.TILE = 4
    yield
    pdw.TILE = old
    pk.set_interpret(False)


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def _dense(band):
    D = banded.lower_band_to_dense(band)
    return D + D.T - jnp.diag(jnp.diag(D))


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-300)


@pytest.mark.parametrize("m,k", [(24, 2), (29, 3)])
def test_twist_sweeps_match_dense(m, k):
    kuu = random_band(0, m, k)
    tan = random_band(7, m, k) * 0.1
    p = random_band(1, m, k, diag=4.0)
    b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float64)

    ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot = (
        pdw.factor_takahashi_solve_tan_twist(kuu, tan, p, b)
    )

    Kd, Pd, Td = _dense(kuu), _dense(p), _dense(tan)
    Ki = jnp.linalg.inv(Kd)
    u_ref = jnp.linalg.solve(Pd, b)
    assert _rel(ld_kuu, jnp.linalg.slogdet(Kd)[1]) < 1e-12
    assert _rel(ld_p, jnp.linalg.slogdet(Pd)[1]) < 1e-12
    assert _rel(quad, jnp.dot(b, u_ref)) < 1e-10
    assert _rel(u, u_ref) < 3e-8
    assert _rel(s_kuu, banded.dense_to_lower_band(Ki, k)) < 3e-9
    assert _rel(s_p, banded.dense_to_lower_band(jnp.linalg.inv(Pd), k)) < 3e-9
    assert _rel(sdot, banded.dense_to_lower_band(-Ki @ Td @ Ki, k)) < 3e-8


@pytest.mark.parametrize("m,k", [(24, 2)])
def test_twist_collapsed_core_value_and_grad(m, k):
    g0 = random_band(3, m, k, diag=3.0)
    g1 = random_band(4, m, k) * 0.05
    p = random_band(1, m, k, diag=4.0)
    b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float64)
    big = random_band(5, m, k)
    cs = jnp.asarray([0.7, -0.3, 0.2, 1.3], jnp.float64)

    def kuu_fn(var, ell):
        # respects the Matérn contract kuu_fn = var⁻¹ · G(ell)
        return (g0 + ell * g1) / var

    def loss_twist(var, ell, p_band, bv, big_band):
        out = pdw.collapsed_core_matern_twist_ds(
            kuu_fn, var, ell, p_band, bv, big_band
        )
        return sum(c * o for c, o in zip(cs, out))

    def loss_ref(var, ell, p_band, bv, big_band):
        Kd = _dense(kuu_fn(var, ell))
        Pd = _dense(p_band)
        Bd = _dense(big_band)
        w = jnp.linalg.solve(Pd, bv)
        out = (
            jnp.linalg.slogdet(Kd)[1],
            jnp.linalg.slogdet(Pd)[1],
            jnp.dot(bv, w),
            jnp.trace(jnp.linalg.solve(Kd, Bd)),
        )
        return sum(c * o for c, o in zip(cs, out))

    args = (jnp.float64(1.3), jnp.float64(0.8), p, b, big)
    v_t, g_t = jax.value_and_grad(loss_twist, argnums=(0, 1, 2, 3, 4))(*args)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    assert _rel(v_t, v_r) < 1e-10
    for gt, gr, name in zip(g_t, g_r, ["var", "ell", "p", "b", "big"]):
        assert _rel(gt, gr) < 3e-8, name
