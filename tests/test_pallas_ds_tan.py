"""Tangent-fused collapsed-core kernels (pallas_ds_tan.py).

The fast test checks the dispatcher fallback (scan path) gives identical
value+grad through the θ-structured API.  The slow interpret-mode tests
check the fused JVP kernels against dense-f64 tangent identities:

  L̇ = JVP of Cholesky:     dense  L·Φ(L⁻¹ T L⁻ᵀ)
  Ṡ = JVP of band(K⁻¹):    dense  −band(K⁻¹ T K⁻¹)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asvgp_tpu import banded
from asvgp_tpu.banded import ops as bops
from asvgp_tpu.banded import pallas_ds_tan as pdt
from asvgp_tpu.banded import pallas_kernels as pk
from asvgp_tpu.basis import B3Spline
from asvgp_tpu.features.spline_features import make_kuu
from asvgp_tpu.models.kernels import Matern


def _kuu_fn(basis, nu2=3):
    def fn(v, l):
        return make_kuu(Matern.tree_unflatten((nu2,), (v, l)), basis)

    return fn


def _random_spd_band(key, m, k, diag=4.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def _combo(outs):
    ldk, ldp, quad, tr = outs
    return ldk - 1.3 * ldp + 0.11 * quad + 0.37 * tr


def test_matern_core_fallback_matches_scan():
    """collapsed_core_matern (CPU → scan fallback) must equal autodiff
    through the band-level collapsed_core, value and grads."""
    m, k = 64, 3
    basis = B3Spline(0.0, 1.0, m)
    kuu_fn = _kuu_fn(basis)
    var = jnp.asarray(1.3)
    ell = jnp.asarray(0.07)
    big = _random_spd_band(3, m, k)
    b = jax.random.normal(jax.random.PRNGKey(4), (m,), jnp.float64)

    def f_new(v, l, s2):
        p = big / s2 + kuu_fn(v, l)
        return _combo(banded.collapsed_core_matern(kuu_fn, v, l, p, b, big))

    def f_old(v, l, s2):
        p = big / s2 + kuu_fn(v, l)
        return _combo(banded.collapsed_core(kuu_fn(v, l), p, b, big))

    s2 = jnp.asarray(0.4)
    v_new, g_new = jax.value_and_grad(f_new, argnums=(0, 1, 2))(var, ell, s2)
    v_old, g_old = jax.value_and_grad(f_old, argnums=(0, 1, 2))(var, ell, s2)
    np.testing.assert_allclose(float(v_new), float(v_old), rtol=1e-13)
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(float(gn), float(go), rtol=1e-12)


def _dense_tangents(kuu, tan, k):
    """Reference (L̇, Ṡ) via dense f64 identities."""
    K = np.asarray(banded.lower_band_to_dense(kuu))
    K = K + K.T - np.diag(np.diag(K))
    T = np.asarray(banded.lower_band_to_dense(tan))
    T = T + T.T - np.diag(np.diag(T))
    L = np.linalg.cholesky(K)
    X = np.linalg.solve(L, np.linalg.solve(L, T).T).T  # L⁻¹ T L⁻ᵀ
    Phi = np.tril(X, -1) + 0.5 * np.diag(np.diag(X))
    Ldot = L @ Phi
    Kinv = np.linalg.inv(K)
    Sdot = -Kinv @ T @ Kinv
    m = K.shape[0]
    ldot_band = np.stack(
        [np.pad(np.diag(Ldot, -j), (0, j)) for j in range(k + 1)]
    )
    sdot_band = np.stack(
        [np.pad(np.diag(Sdot, -j), (0, j)) for j in range(k + 1)]
    )
    return ldot_band, sdot_band


@pytest.mark.slow
@pytest.mark.parametrize("m,k", [(24, 2)])
def test_tan_sweeps_match_dense_jvp(m, k):
    pk.set_interpret(True)
    try:
        kuu = _random_spd_band(0, m, k)
        tan = _random_spd_band(1, m, k, diag=0.0) * 0.3
        p = _random_spd_band(2, m, k, diag=6.0)
        b = jax.random.normal(jax.random.PRNGKey(5), (m,), jnp.float64)

        (l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu,
         sdot) = pdt.factor_takahashi_solve_tan_ds(kuu, tan, p, b)

        # primal outputs must match the untangented sweeps
        from asvgp_tpu.banded import pallas_ds_core as pdc

        ref = pdc.factor_takahashi_solve_ds(kuu, p, b)
        for got, want, name in zip(
            (l_kuu, l_p, s_kuu, s_p, c0, u, iv_kuu), ref,
            ("l_kuu", "l_p", "s_kuu", "s_p", "c0", "u", "iv_kuu"),
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-14,
                err_msg=name,
            )

        _, sdot_ref = _dense_tangents(kuu, tan, k)
        np.testing.assert_allclose(
            np.asarray(sdot), sdot_ref, rtol=1e-9, atol=1e-11
        )
    finally:
        pk.set_interpret(False)


@pytest.mark.slow
@pytest.mark.parametrize("m", [24])
def test_collapsed_core_matern_ds_grads(m):
    """Gradients of the tangent-fused custom VJP vs reverse AD through the
    float64 scan path, on a real Matérn-3/2 Kuu."""
    pk.set_interpret(True)
    try:
        basis = B3Spline(0.0, 1.0, m)
        kuu_fn = _kuu_fn(basis)
        var = jnp.asarray(1.3)
        ell = jnp.asarray(0.11)
        k = basis.order
        big = _random_spd_band(3, m, k)
        b = jax.random.normal(jax.random.PRNGKey(4), (m,), jnp.float64)
        p = big / 0.4 + kuu_fn(var, ell)

        def f_ds(v, l, pb, bb, gg):
            return _combo(
                pdt.collapsed_core_matern_ds(kuu_fn, v, l, pb, bb, gg)
            )

        def f_scan(v, l, pb, bb, gg):
            bops.set_impl("scan")
            try:
                return _combo(banded.collapsed_core(kuu_fn(v, l), pb, bb, gg))
            finally:
                bops.set_impl("auto")

        val_ds, g_ds = jax.value_and_grad(f_ds, argnums=(0, 1, 2, 3, 4))(
            var, ell, p, b, big
        )
        val_sc, g_sc = jax.value_and_grad(f_scan, argnums=(0, 1, 2, 3, 4))(
            var, ell, p, b, big
        )
        np.testing.assert_allclose(float(val_ds), float(val_sc), rtol=1e-12)
        for gd, gs, name in zip(
            g_ds, g_sc, ("var", "ell", "p", "b", "big")
        ):
            np.testing.assert_allclose(
                np.asarray(gd), np.asarray(gs), rtol=1e-9, atol=1e-11,
                err_msg=name,
            )
    finally:
        pk.set_interpret(False)
