"""Locate the twisted kernels' u/s error: junction vs interior vs untwisted."""

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
from asvgp_tpu.banded import ops as bops

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

ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot = (
    pdw.factor_takahashi_solve_tan_twist(kuu, tan, p, b)
)

Pd = banded.lower_band_to_dense(p)
Pd = Pd + Pd.T - jnp.diag(jnp.diag(Pd))
u_ref = jnp.linalg.solve(Pd, b)
Kd = banded.lower_band_to_dense(kuu)
Kd = Kd + Kd.T - jnp.diag(jnp.diag(Kd))
s_ref = banded.dense_to_lower_band(jnp.linalg.inv(Kd), k)

h = pdw.tw.split_point(m, k)
print(f"h={h}, g={m-h-k}")
du = np.abs(np.asarray(u - u_ref))
print("u err by idx:", np.array2string(du, precision=1, max_line_width=200))
ds_ = np.abs(np.asarray(s_kuu - s_ref))
print("s_kuu err rows max over cols:",
      np.array2string(ds_.max(0), precision=1, max_line_width=200))

# untwisted scan reference for u on the same inputs (f64 scans on CPU)
with bops.impl_scope("scan"):
    l_p_scan = bops.cholesky_band(p)
    u_scan = bops.cholesky_solve_band(l_p_scan, b)
print("scan u vs dense:", float(np.abs(np.asarray(u_scan - u_ref)).max()))
