"""Fast interpret-mode validation of the twisted quad kernels.

Patches pallas_ds_twist.TILE down to 8 so the statically-unrolled kernel
bodies interpret in seconds on the 1-core host (lane alignment only
matters on real hardware).  Compares against dense f64 references.

Record of the round-2 precision chase (the since-pruned twist_diag{,2,3,4}
scratch probes): interpret-mode twisted errors ~1e-10 were bisected to the
double-single compensation being nibbled by XLA:CPU's excess-precision
simplifications, NOT to the twist/seed logic — on identical inputs the
UNTWISTED kernels show bit-identical deviations (s_kuu err 7.671e-11 both
twisted and untwisted), and an f64 seeded-Takahashi replay of kernel B on
kernel A's outputs is exact.  Mosaic on the real TPU compiles the DS
patterns faithfully: the hardware run (tools/twist_probe.py, round 3)
measured worst rel err 4.2e-13 vs the CPU f64 oracle including full
custom-VJP gradients, and value+grad 22.2 -> 13.6 ms at m=10^4.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from asvgp_tpu import banded
from asvgp_tpu.banded import ops as bops
from asvgp_tpu.banded import pallas_ds_twist as pdw
from asvgp_tpu.banded import pallas_kernels as pk
from asvgp_tpu.banded.pallas_ds_core import _band_weights

pk.set_interpret(True)
pdw.TILE = 4


def random_band(key, m, k, diag=2.0):
    kl, kd = jax.random.split(jax.random.PRNGKey(key))
    l0 = jax.random.normal(kl, (k + 1, m), jnp.float64) * 0.3
    l0 = l0.at[0].set(diag + jax.random.uniform(kd, (m,), jnp.float64))
    l0 = banded.mask_lower_band(l0)
    L0 = banded.lower_band_to_dense(l0)
    return banded.dense_to_lower_band(L0 @ L0.T, k)


def check(m, k):
    print(f"--- m={m}, k={k} ---", flush=True)
    kuu = random_band(0, m, k)
    tan = random_band(7, m, k) * 0.1
    p = random_band(1, m, k, diag=4.0)
    b = jax.random.normal(jax.random.PRNGKey(2), (m,), jnp.float64)

    ld_kuu, ld_p, quad, s_kuu, s_p, u, sdot = (
        pdw.factor_takahashi_solve_tan_twist(kuu, tan, p, b)
    )
    print("  kernels ran", flush=True)

    # dense references
    Kd = banded.lower_band_to_dense(kuu)
    Kd = Kd + Kd.T - jnp.diag(jnp.diag(Kd))
    Pd = banded.lower_band_to_dense(p)
    Pd = Pd + Pd.T - jnp.diag(jnp.diag(Pd))
    Td = banded.lower_band_to_dense(tan)
    Td = Td + Td.T - jnp.diag(jnp.diag(Td))

    sign, ld_kuu_ref = jnp.linalg.slogdet(Kd)
    _, ld_p_ref = jnp.linalg.slogdet(Pd)
    u_ref = jnp.linalg.solve(Pd, b)
    quad_ref = jnp.dot(b, u_ref)
    s_kuu_ref = banded.dense_to_lower_band(jnp.linalg.inv(Kd), k)
    s_p_ref = banded.dense_to_lower_band(jnp.linalg.inv(Pd), k)
    sdot_ref = banded.dense_to_lower_band(
        -jnp.linalg.inv(Kd) @ Td @ jnp.linalg.inv(Kd), k
    )

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-300)

    print(f"ld_kuu  {rel(ld_kuu, ld_kuu_ref):.2e}", flush=True)
    print(f"ld_p    {rel(ld_p, ld_p_ref):.2e}", flush=True)
    print(f"quad    {rel(quad, quad_ref):.2e}", flush=True)
    print(f"u       {rel(u, u_ref):.2e}", flush=True)
    print(f"s_kuu   {rel(s_kuu, s_kuu_ref):.2e}", flush=True)
    print(f"s_p     {rel(s_p, s_p_ref):.2e}", flush=True)
    print(f"sdot    {rel(sdot, sdot_ref):.2e}", flush=True)

    ok = (
        rel(ld_kuu, ld_kuu_ref) < 1e-9
        and rel(ld_p, ld_p_ref) < 1e-9
        and rel(quad, quad_ref) < 1e-9
        and rel(u, u_ref) < 1e-8
        and rel(s_kuu, s_kuu_ref) < 1e-8
        and rel(s_p, s_p_ref) < 1e-8
        and rel(sdot, sdot_ref) < 1e-7
    )
    print("OK" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    import sys

    configs = [(24, 2)] if "--quick" in sys.argv else [(24, 2), (29, 3)]
    ok = True
    for m, k in configs:
        ok = check(m, k) and ok
    sys.exit(0 if ok else 1)
