"""Double-single (two-float32) arithmetic for Pallas TPU kernels.

Pallas has no float64 on TPU, and this platform's float64 XLA emulation is
unreliable inside the banded recursions (the Takahashi sweep degrades
catastrophically under --xla_allow_excess_precision).  The banded Gram
matrices are genuinely ill-conditioned at fine meshes (κ ~ (ℓ/δ)^{2ν+1},
easily 1e12+ at m=10⁴), so plain float32 recursions diverge.  The fix is
classical double-single arithmetic (Dekker/Knuth error-free
transformations): every value is an unevaluated sum hi + lo of two float32,
giving ~2⁻⁴⁸ relative precision — comfortably inside the 1e-6 parity target
(BASELINE.md) — using only exact float32 add/mul hardware.

All helpers are elementwise and shape-polymorphic; they are used inside the
Pallas kernels (banded/pallas_kernels.py) and for the XLA-side f64 ↔ (hi,
lo) conversions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Veltkamp split constant for float32 (24-bit mantissa → 2^12 + 1)
_SPLIT = 4097.0


def split_f64(x):
    """float64 array → (hi, lo) float32 pair with hi + lo == x (to f64 eps)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def merge_f64(h, l):
    """(hi, lo) float32 pair → float64."""
    return h.astype(jnp.float64) + l.astype(jnp.float64)


def two_sum(a, b):
    """Error-free a + b: returns (s, err) with s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _veltkamp(a):
    t = a * _SPLIT
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b: returns (p, err) with p + err == a * b exactly."""
    p = a * b
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(xh, xl, yh, yl):
    sh, sl = two_sum(xh, yh)
    tl = xl + yl + sl
    h = sh + tl
    return h, tl - (h - sh)


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def mul(xh, xl, yh, yl):
    ph, pl = two_prod(xh, yh)
    pl = pl + (xh * yl + xl * yh)
    h = ph + pl
    return h, pl - (h - ph)


def mul_f32(xh, xl, c):
    """DS × plain float32."""
    ph, pl = two_prod(xh, c)
    pl = pl + xl * c
    h = ph + pl
    return h, pl - (h - ph)


def div(xh, xl, yh, yl):
    q1 = xh / yh
    p1h, p1l = mul_f32(yh, yl, q1)
    rh, rl = add(xh, xl, -p1h, -p1l)
    q2 = (rh + rl) / yh
    h = q1 + q2
    return h, q2 - (h - q1)


def sqrt(xh, xl):
    q1 = jnp.sqrt(xh)
    p1h, p1l = two_prod(q1, q1)
    rh, rl = add(xh, xl, -p1h, -p1l)
    q2 = (rh + rl) / (2.0 * q1)
    h = q1 + q2
    return h, q2 - (h - q1)


def recip(yh, yl):
    one = jnp.ones_like(yh)
    zero = jnp.zeros_like(yh)
    return div(one, zero, yh, yl)


def rsqrt(yh, yl):
    """DS 1/sqrt(y): f32 seed + one DS-accurate Newton step.

    Shorter serial chain than sqrt-then-recip, and yields the reciprocal
    pivot directly (the Cholesky kernels need BOTH sqrt(d) = d*rsqrt(d) and
    1/sqrt(d)).  The f32 seed error e ~ 2⁻²³ is removed by the e/2 + 3e²/8
    Newton/Householder correction (error O(e³) ~ 2⁻⁶⁹ < DS eps); do NOT use
    hardware rsqrt as the seed refiner alone — lax.rsqrt on this TPU is
    approximate and the recursions compound error (CLAUDE.md)."""
    r0 = 1.0 / jnp.sqrt(yh)
    th, tl = mul_f32(yh, yl, r0)
    th, tl = mul_f32(th, tl, r0)
    e = (1.0 - th) - tl  # 1 - y r0², exact near 1 (Sterbenz)
    corr = e * (0.5 + 0.375 * e)
    ph, pl = two_prod(r0, corr)
    sh, sl = two_sum(r0, ph)
    l = sl + pl
    h = sh + l
    return h, l - (h - sh)


def pad_rows(x, k):
    """``jnp.pad(x, ((0, k), (0, 0)))`` for use INSIDE Mosaic kernels.

    jnp.pad is a jit-wrapped jax.numpy function whose scalar fill constant
    is a Python int: under x64 it enters the kernel jaxpr as an int64
    scalar converted to the array dtype, and jax.export's forward-compat
    Mosaic lowering of that convert recurses forever
    (_convert_helper int64->float32 re-binds itself; observed on the axon
    platform, jax 0.9).  Concatenating explicit zeros of the input dtype
    sidesteps the integer constant entirely.
    """
    if k == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((k,) + x.shape[1:], x.dtype)], axis=0
    )
