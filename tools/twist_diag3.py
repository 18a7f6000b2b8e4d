"""Definitive bisect: f64 seeded-Takahashi on kernel A's outputs vs kernel B."""

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
from asvgp_tpu.banded import pallas_ds_twist as pdw
from asvgp_tpu.banded import pallas_kernels as pk
from asvgp_tpu.banded import twisted as tw
from jax.scipy.linalg import cho_solve

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
P = pdw.TILE * (-(-(max(h, g) + k) // pdw.TILE))
fb_kuu = tw.flip_band(kuu)
fb_p = tw.flip_band(p)
fb_tan = tw.flip_band(tan)
bf = b[::-1]
ah3, al3 = pdw._quad_tiles(kuu[:, :h], p[:, :h], fb_kuu[:, :g], fb_p[:, :g],
                           P, diag_value=1.0)
zF = jnp.zeros((k + 1, h), kuu.dtype)
zR = jnp.zeros((k + 1, g), kuu.dtype)
th3, tl3 = pdw._quad_tiles(tan[:, :h], zF, fb_tan[:, :g], zR, P)
mask = pdw._quad_mask_tiles(k, h, g, P)
bh3, bl3 = pdw._duo_rows(b[:h], bf[:g], P)
quad_shape = jax.ShapeDtypeStruct(ah3.shape, jnp.float32)
row_quad = jax.ShapeDtypeStruct((P // pdw.TILE, 1, 4 * pdw.TILE), jnp.float32)
row_duo = jax.ShapeDtypeStruct((P // pdw.TILE, 1, 2 * pdw.TILE), jnp.float32)
(lh3, ll3, ivh3, ivl3, ch3, cl3, dlh3, dll3, divh3, divl3) = pdw._call2(
    pdw._chol_quad_solve_tan_kernel,
    (quad_shape, quad_shape, row_quad, row_quad, row_duo, row_duo,
     quad_shape, quad_shape, row_quad, row_quad),
    ah3, al3, mask, bh3, bl3, th3, tl3,
)
lF_kuu, lF_p, lR_kuu, lR_p = pdw._from_quad_tiles(lh3, ll3)
ivF_kuu, ivF_p, ivR_kuu, ivR_p = pdw._from_quad_tiles(ivh3, ivl3)

# mid in f64 from the kernel factor tails (same as wrapper)
kuu_mid = tw._middle_dense(kuu, h)
ld_mid, z_kuu, _ = pdw._mid_logdet_inv(
    kuu_mid, lF_kuu[:, h - k:h], lR_kuu[:, g - k:g]
)

# oracle zl on the SAME factor + seed (f64 scan)
zl_f64 = tw._takahashi_seeded(lF_kuu[:, :h], tw._seed_from_mid(z_kuu))

# full twisted-oracle reference
ldk_ref, sk_ref = tw.twisted_inverse_band(kuu, h)

# kernel B run (via full wrapper)
_, _, _, s_kuu, _, _, _ = pdw.factor_takahashi_solve_tan_twist(kuu, tan, p, b)


def err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


print("f64-replica zl vs oracle s_kuu[:, :h]:", err(zl_f64, sk_ref[:, :h]))
print("kernel-B     zl vs oracle s_kuu[:, :h]:",
      err(s_kuu[:, :h], sk_ref[:, :h]))
print("kernel-B     zl vs f64-replica:       ", err(s_kuu[:, :h], zl_f64))
print("iv check: ivF_kuu vs 1/diag:",
      err(ivF_kuu[0, :h], 1.0 / lF_kuu[0, :h]))

# per-element error map of kernel-B vs replica
d = np.abs(np.asarray(s_kuu[:, :h] - zl_f64))
np.set_printoptions(precision=1, linewidth=250)
print(d)
