"""Bisect the twist kernels' precision vs the exact f64 twisted oracle."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import os

os.makedirs("/tmp/asvgp_jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/asvgp_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from asvgp_tpu import banded
from asvgp_tpu.banded import ds
from asvgp_tpu.banded import pallas_ds_twist as pdw
from asvgp_tpu.banded import pallas_kernels as pk
from asvgp_tpu.banded import twisted as tw

pk.set_interpret(True)
pdw.TILE = 4

m, k = 24, 2


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


kuu = random_band(0, m, k)
tan = random_band(7, m, k) * 0.1
p = random_band(1, m, k, diag=4.0)
b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float64)

h = tw.split_point(m, k)
g = m - h - k

# ---- run just kernel A via the wrapper's internals --------------------
P = pdw.TILE * (-(-(max(h, g) + k) // pdw.TILE))
fb_p = tw.flip_band(p)
fb_kuu = tw.flip_band(kuu)
fb_tan = tw.flip_band(tan)
bf = b[::-1]
ah3, al3 = pdw._quad_tiles(kuu[:, :h], p[:, :h], fb_kuu[:, :g], fb_p[:, :g],
                           P, diag_value=1.0)
zF = jnp.zeros((k + 1, h), kuu.dtype)
zR = jnp.zeros((k + 1, g), kuu.dtype)
th3, tl3 = pdw._quad_tiles(tan[:, :h], zF, fb_tan[:, :g], zR, P)
mask = pdw._quad_mask_tiles(k, h, g, P)
bh3, bl3 = pdw._duo_rows(b[:h], bf[:g], P)

import jax as _jax

quad_shape = _jax.ShapeDtypeStruct(ah3.shape, jnp.float32)
row_quad = _jax.ShapeDtypeStruct((P // pdw.TILE, 1, 4 * pdw.TILE), jnp.float32)
row_duo = _jax.ShapeDtypeStruct((P // pdw.TILE, 1, 2 * pdw.TILE), jnp.float32)
(lh3, ll3, ivh3, ivl3, ch3, cl3, dlh3, dll3, divh3, divl3) = pdw._call2(
    pdw._chol_quad_solve_tan_kernel,
    (quad_shape, quad_shape, row_quad, row_quad, row_duo, row_duo,
     quad_shape, quad_shape, row_quad, row_quad),
    ah3, al3, mask, bh3, bl3, th3, tl3,
)
lF_kuu, lF_p, lR_kuu, lR_p = pdw._from_quad_tiles(lh3, ll3)
y1, y3 = pdw._from_duo_rows(ch3, cl3)

# oracle pieces
from asvgp_tpu.banded.ops import solve_lower_band, cholesky_band

l_left_p = cholesky_band(p[:, :h])  # first h cols == global factor cols
l_right_p = cholesky_band(fb_p[:, :g])
y1_ref = solve_lower_band(l_left_p[:, :h], b[:h])
y3_ref = solve_lower_band(l_right_p[:, :g], bf[:g])


def err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


print("lF_p   vs oracle:", err(lF_p[:, :h], l_left_p[:, :h]))
print("lR_p   vs oracle:", err(lR_p[:, :g], l_right_p[:, :g]))
print("y1     vs oracle:", err(y1[:h], y1_ref))
print("y3     vs oracle:", err(y3[:g], y3_ref))

# oracle full solve for comparison of downstream pieces
ld_ref, quad_ref, u_ref, sp_ref = tw.twisted_solve_core(p, b, h)
ldk_ref, sk_ref = tw.twisted_inverse_band(kuu, h)

res = pdw.factor_takahashi_solve_tan_twist(kuu, tan, p, b)
ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot = res
print("u      vs twisted-oracle:", err(u, u_ref))
print("s_p    vs twisted-oracle:", err(s_p, sp_ref))
print("s_kuu  vs twisted-oracle:", err(s_kuu, sk_ref))

# also: oracle x2/x1 vs kernel — recompute mid pieces in f64 from ORACLE
# factors to see if the kernel's mid inputs (DS tails) are the leak
l21f_p = tw._lower_tail_dense(l_left_p[:, h - k:h])
l21r_p = tw._lower_tail_dense(l_right_p[:, g - k:g])
s_mid_ref = tw._middle_dense(p, h) - l21f_p @ l21f_p.T - (
    l21r_p @ l21r_p.T)[::-1, ::-1]
l21f_k = pdw._kxk_mm_t(tw._lower_tail_dense(lF_p[:, h - k:h]),
                       tw._lower_tail_dense(lF_p[:, h - k:h]))
s_mid_ds = tw._middle_dense(p, h) - l21f_k - pdw._kxk_mm_t(
    tw._lower_tail_dense(lR_p[:, g - k:g]),
    tw._lower_tail_dense(lR_p[:, g - k:g]))[::-1, ::-1]
print("S22_p  ds-tails vs oracle:", err(s_mid_ds, s_mid_ref))
