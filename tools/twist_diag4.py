"""Calibrate: untwisted DS kernels vs dense on the SAME random inputs."""

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
from asvgp_tpu.banded import pallas_ds as pds
from asvgp_tpu.banded import pallas_ds_core as pdc
from asvgp_tpu.banded import pallas_ds_pair as pdp
from asvgp_tpu.banded import pallas_kernels as pk

pk.set_interpret(True)
# patch every module-level TILE binding so small interpret runs are fast
pk.TILE = 4
pds.TILE = 4
pdp.TILE = 4
pdc.TILE = 4

m, k = 24, 2


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


kuu = random_band(0, m, k)
p = random_band(1, m, k, diag=4.0)
b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float64)

l_kuu, l_p, s_kuu, s_p, c0, u, iv = pdc.factor_takahashi_solve_ds(kuu, p, b)

Pd = banded.lower_band_to_dense(p)
Pd = Pd + Pd.T - jnp.diag(jnp.diag(Pd))
Kd = banded.lower_band_to_dense(kuu)
Kd = Kd + Kd.T - jnp.diag(jnp.diag(Kd))
u_ref = jnp.linalg.solve(Pd, b)
s_ref = banded.dense_to_lower_band(jnp.linalg.inv(Kd), k)
sp_ref = banded.dense_to_lower_band(jnp.linalg.inv(Pd), k)


def err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


print("UNTWISTED on same inputs:")
print("  u     vs dense:", err(u, u_ref))
print("  s_kuu vs dense:", err(s_kuu, s_ref))
print("  s_p   vs dense:", err(s_p, sp_ref))
d = np.abs(np.asarray(s_kuu - s_ref))
np.set_printoptions(precision=1, linewidth=250)
print(d.max(0))
