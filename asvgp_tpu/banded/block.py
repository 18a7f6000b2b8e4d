"""Block-banded linear algebra (large-bandwidth systems, Kronecker models).

The Kronecker model's coupling matrix P = Kuu_1 ⊗ Kuu_2 + KufKfu/σ² is not
Kronecker but *is* banded with joint bandwidth ~ m_2·k_1 + k_2
(reference computes this at asvgp/gpr.py:262 and then densifies the whole
m^d x m^d system, asvgp/gpr.py:272,292-293).  We instead treat it as a
block-banded matrix: blocks of size B = m_2 indexed by i_1, block lower
bandwidth W = k_1.  Factorization is a scan over m_1 block columns carrying
a W-block window; the per-step work is dense B x B matrix algebra that maps
straight onto the MXU — O(m_1 W² B³) total instead of the reference's
O((m_1 B)³) dense Cholesky.

Storage: ``blocks`` array of shape (W+1, nb, B, B):
  blocks[p, J] = A[(J+p)·B:(J+p+1)·B, J·B:(J+1)·B]   (block column J, p-th
  sub-block-diagonal; out-of-range slots zero).  The diagonal blocks of the
  input must contain the full symmetric block (not just its lower
  triangle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _use_ds(x) -> bool:
    """float64 block algebra on an accelerator → XLA double-single (dsx.py):
    this platform's f64 emulation is unreliable in recursions and its MXU
    has no f64 path (CLAUDE.md), exactly as for the scalar banded ops
    (ops.py:_use_pallas_ds)."""
    from asvgp_tpu.banded import ops as _bops

    return _bops._use_pallas_ds(x)


def _tri_solve_right(L, X):
    """Solve Y L^T = X for Y, i.e. Y = X L^{-T}; L (B,B), X batched (..., B, B)."""
    Lb = jnp.broadcast_to(L, X.shape)
    return lax.linalg.triangular_solve(
        Lb, X, left_side=False, lower=True, transpose_a=True
    )


def _tri_solve_right_ds(L, X):
    """DS version of _tri_solve_right: Y = X L^{-T} ⇔ Yᵀ = L⁻¹ Xᵀ, batched
    by concatenating the transposed RHS blocks along columns."""
    from asvgp_tpu.banded import dsx

    W, B, _ = X.shape
    Z = jnp.moveaxis(jnp.swapaxes(X, -1, -2), 0, 1).reshape(B, W * B)
    Yt = dsx.solve_triangular_ds(L, Z, True, False)
    return jnp.swapaxes(jnp.moveaxis(Yt.reshape(B, W, B), 1, 0), -1, -2)


def _matmul_ds_batched(A, Bmat):
    from asvgp_tpu.banded import dsx

    return dsx.matmul_ds(A, Bmat)


def _cholesky_block_banded_ds(blocks: jnp.ndarray) -> jnp.ndarray:
    """DS (f64-on-TPU) variant of :func:`cholesky_block_banded`: the dense
    per-step algebra runs through dsx (exact-sliced MXU matmuls, DS scan
    Cholesky/solves); elementwise f64 glue stays XLA (measured fine on this
    platform, CLAUDE.md)."""
    from asvgp_tpu.banded import dsx

    Wp1, nb, B, _ = blocks.shape
    W = Wp1 - 1
    dtype = blocks.dtype

    if W == 0:
        return jax.vmap(dsx.cholesky_ds)(blocks[0])[None]

    def step(carry, inp):
        C, = carry,
        a_col, j = inp
        s = a_col
        for p in range(1, W + 1):
            g = C[p - 1, p]
            upd = _matmul_ds_batched(C[p - 1, p:], g.T[None])
            s = s.at[: W - p + 1].add(-upd)
        ljj = dsx.cholesky_ds(s[0])
        off = _tri_solve_right_ds(ljj, s[1:])
        col = jnp.concatenate([ljj[None], off], axis=0)
        mask = (j + jnp.arange(W + 1) < nb).astype(dtype)[:, None, None]
        col = col * mask
        C_new = jnp.concatenate([col[None], C[:-1]], axis=0)
        return C_new, col

    init = jnp.zeros((W, W + 1, B, B), dtype)
    _, cols = lax.scan(step, init, (jnp.moveaxis(blocks, 1, 0), jnp.arange(nb)))
    return jnp.moveaxis(cols, 0, 1)


def cholesky_block_banded(blocks: jnp.ndarray) -> jnp.ndarray:
    """Block-banded Cholesky: A = L L^T, same block-band structure.

    Args:
      blocks: (W+1, nb, B, B) block-lower storage of symmetric positive-
        definite A (diagonal blocks full-symmetric).
    Returns:
      (W+1, nb, B, B) block-lower storage of L (diagonal blocks lower-
      triangular).
    """
    Wp1, nb, B, _ = blocks.shape
    W = Wp1 - 1
    dtype = blocks.dtype

    if _use_ds(blocks):
        return _cholesky_block_banded_ds(blocks)

    if W == 0:
        return jax.vmap(jnp.linalg.cholesky)(blocks[0])[None]

    def step(carry, inp):
        # carry C: (W, W+1, B, B) — C[p-1] = L blocks of column J-p
        C, = carry,
        a_col, j = inp  # a_col: (W+1, B, B)
        # S_q = A[J+q, J] - sum_{p=1..W} L[J+q, J-p] @ L[J, J-p]^T, q = 0..W
        # L[J+q, J-p] lives in C[p-1, q+p] (zero when q+p > W).
        s = a_col
        for p in range(1, W + 1):
            g = C[p - 1, p]  # L[J, J-p], (B, B)
            # L[J+q, J-p] = C[p-1, q+p], valid for q = 0..W-p
            upd = jnp.matmul(C[p - 1, p:], g.T[None], preferred_element_type=dtype)
            s = s.at[: W - p + 1].add(-upd)
        ljj = jnp.linalg.cholesky(s[0])
        off = _tri_solve_right(ljj, s[1:])  # (W, B, B)
        col = jnp.concatenate([ljj[None], off], axis=0)
        # zero out blocks past the end
        mask = (j + jnp.arange(W + 1) < nb).astype(dtype)[:, None, None]
        col = col * mask
        C_new = jnp.concatenate([col[None], C[:-1]], axis=0)
        return C_new, col

    init = jnp.zeros((W, W + 1, B, B), dtype)
    _, cols = lax.scan(step, init, (jnp.moveaxis(blocks, 1, 0), jnp.arange(nb)))
    return jnp.moveaxis(cols, 0, 1)


def log_det_from_block_cholesky(l_blocks: jnp.ndarray) -> jnp.ndarray:
    """log|A| = 2 Σ log diag(L): sum over diagonal blocks' diagonals.

    Padding blocks are zero; their diagonals would produce -inf, so mask by
    taking only strictly-positive diagonal entries into the sum — valid
    because a Cholesky diagonal is positive.
    """
    diags = jax.vmap(jnp.diagonal)(l_blocks[0])  # (nb, B)
    safe = jnp.where(diags > 0, diags, 1.0)
    return 2.0 * jnp.sum(jnp.log(safe))


def _solve_lower_block_banded_ds(l_blocks: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    from asvgp_tpu.banded import dsx

    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    dtype = l_blocks.dtype
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    r = b2.shape[1]
    b_blocks = b2.reshape(nb, B, r)

    eye = jnp.eye(B, dtype=dtype)

    def solve_block(ljj, s):
        ljj_safe = jnp.where(jnp.abs(ljj).sum() > 0, ljj, eye)
        return dsx.solve_triangular_ds(ljj_safe, s, True, False)

    if W == 0:
        x = jax.vmap(solve_block)(l_blocks[0], b_blocks).reshape(nb * B, r)
        return x[:, 0] if vec else x

    G = jnp.stack(
        [jnp.roll(l_blocks[p], p, axis=0).at[:p].set(0.0) for p in range(1, W + 1)],
        axis=0,
    )

    def step(X, inp):
        g_col, ljj, b_blk = inp
        s = b_blk - jnp.sum(_matmul_ds_batched(g_col, X), axis=0)
        xj = solve_block(ljj, s)
        X_new = jnp.concatenate([xj[None], X[:-1]], axis=0)
        return X_new, xj

    init = jnp.zeros((W, B, r), dtype)
    _, x = lax.scan(step, init, (jnp.moveaxis(G, 1, 0), l_blocks[0], b_blocks))
    x = x.reshape(nb * B, r)
    return x[:, 0] if vec else x


def solve_lower_block_banded(l_blocks: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L x = b with L block-banded lower (from cholesky_block_banded).

    b: (nb*B,) or (nb*B, r).
    """
    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    dtype = l_blocks.dtype
    vec = b.ndim == 1

    if _use_ds(l_blocks):
        return _solve_lower_block_banded_ds(l_blocks, b)
    b2 = b[:, None] if vec else b
    r = b2.shape[1]
    b_blocks = b2.reshape(nb, B, r)

    if W == 0:
        x = jax.vmap(
            lambda L, bb: lax.linalg.triangular_solve(L, bb, left_side=True, lower=True)
        )(l_blocks[0], b_blocks).reshape(nb * B, r)
        return x[:, 0] if vec else x

    # G[p-1, J] = L[J, J-p] = l_blocks[p, J-p]
    G = jnp.stack(
        [jnp.roll(l_blocks[p], p, axis=0).at[:p].set(0.0) for p in range(1, W + 1)],
        axis=0,
    )

    def step(X, inp):
        # X: (W, B, r) — X[p-1] = x block J-p
        g_col, ljj, b_blk = inp  # (W, B, B), (B, B), (B, r)
        s = b_blk - jnp.sum(
            jnp.matmul(g_col, X, preferred_element_type=dtype), axis=0
        )
        # guard padded (zero) diagonal blocks: solve against I instead
        eye = jnp.eye(B, dtype=dtype)
        ljj_safe = jnp.where(jnp.abs(ljj).sum() > 0, ljj, eye)
        xj = lax.linalg.triangular_solve(ljj_safe, s, left_side=True, lower=True)
        X_new = jnp.concatenate([xj[None], X[:-1]], axis=0)
        return X_new, xj

    init = jnp.zeros((W, B, r), dtype)
    _, x = lax.scan(
        step, init, (jnp.moveaxis(G, 1, 0), l_blocks[0], b_blocks)
    )
    x = x.reshape(nb * B, r)
    return x[:, 0] if vec else x


def _solve_upper_block_banded_transpose_ds(l_blocks: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    from asvgp_tpu.banded import dsx

    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    dtype = l_blocks.dtype
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    r = b2.shape[1]
    b_blocks = b2.reshape(nb, B, r)
    eye = jnp.eye(B, dtype=dtype)

    def solve_block_t(ljj, s):
        ljj_safe = jnp.where(jnp.abs(ljj).sum() > 0, ljj, eye)
        return dsx.solve_triangular_ds(ljj_safe, s, True, True)

    if W == 0:
        x = jax.vmap(solve_block_t)(l_blocks[0], b_blocks).reshape(nb * B, r)
        return x[:, 0] if vec else x

    def step(X, inp):
        l_col, b_blk = inp
        s = b_blk - jnp.sum(
            _matmul_ds_batched(jnp.swapaxes(l_col[1:], -1, -2), X), axis=0
        )
        xj = solve_block_t(l_col[0], s)
        X_new = jnp.concatenate([xj[None], X[:-1]], axis=0)
        return X_new, xj

    init = jnp.zeros((W, B, r), dtype)
    _, x = lax.scan(step, init, (jnp.moveaxis(l_blocks, 1, 0), b_blocks), reverse=True)
    x = x.reshape(nb * B, r)
    return x[:, 0] if vec else x


def solve_upper_block_banded_transpose(l_blocks: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b (backward block substitution)."""
    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    dtype = l_blocks.dtype
    vec = b.ndim == 1

    if _use_ds(l_blocks):
        return _solve_upper_block_banded_transpose_ds(l_blocks, b)
    b2 = b[:, None] if vec else b
    r = b2.shape[1]
    b_blocks = b2.reshape(nb, B, r)

    if W == 0:
        x = jax.vmap(
            lambda L, bb: lax.linalg.triangular_solve(
                L, bb, left_side=True, lower=True, transpose_a=True
            )
        )(l_blocks[0], b_blocks).reshape(nb * B, r)
        return x[:, 0] if vec else x

    def step(X, inp):
        # X: (W, B, r) — X[p-1] = x block J+p; L[J+p, J] = l_blocks[p, J]
        l_col, b_blk = inp  # (W+1, B, B), (B, r)
        s = b_blk - jnp.sum(
            jnp.matmul(
                jnp.swapaxes(l_col[1:], -1, -2), X, preferred_element_type=dtype
            ),
            axis=0,
        )
        eye = jnp.eye(B, dtype=dtype)
        ljj = l_col[0]
        ljj_safe = jnp.where(jnp.abs(ljj).sum() > 0, ljj, eye)
        xj = lax.linalg.triangular_solve(
            ljj_safe, s, left_side=True, lower=True, transpose_a=True
        )
        X_new = jnp.concatenate([xj[None], X[:-1]], axis=0)
        return X_new, xj

    init = jnp.zeros((W, B, r), dtype)
    _, x = lax.scan(step, init, (jnp.moveaxis(l_blocks, 1, 0), b_blocks), reverse=True)
    x = x.reshape(nb * B, r)
    return x[:, 0] if vec else x


def cholesky_solve_block_banded(l_blocks: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return solve_upper_block_banded_transpose(
        l_blocks, solve_lower_block_banded(l_blocks, b)
    )


def _takahashi_inverse_block_banded_ds(l_blocks: jnp.ndarray) -> jnp.ndarray:
    from asvgp_tpu.banded import dsx

    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    dtype = l_blocks.dtype
    eye = jnp.eye(B, dtype=dtype)

    def inv_lower(ljj):
        ljj_safe = jnp.where(jnp.abs(ljj).sum() > 0, ljj, eye)
        return dsx.solve_triangular_ds(ljj_safe, eye, True, False)

    if W == 0:
        def inv_block(L):
            Linv = inv_lower(L)
            return dsx.matmul_ds(Linv.T, Linv)

        return jax.vmap(inv_block)(l_blocks[0])[None]

    def step(CS, inp):
        l_col, j = inp
        linv = inv_lower(l_col[0])
        w = l_col[1:]
        rows = []
        for q in range(1, W + 1):
            cols = []
            for p in range(1, W + 1):
                if p <= q:
                    cols.append(CS[p - 1, q - p])
                else:
                    cols.append(jnp.swapaxes(CS[q - 1, p - q], -1, -2))
            rows.append(jnp.stack(cols, axis=0))
        M = jnp.stack(rows, axis=0)  # (W, W, B, B)
        # t[q] = Σ_p M[q,p] @ w[p]  via one batched DS matmul
        Mq = jnp.moveaxis(M, 1, 2).reshape(W, B, W * B)
        t = dsx.matmul_ds(Mq, w.reshape(W * B, B)[None])
        s_off = -dsx.matmul_ds(t, jnp.broadcast_to(linv, t.shape))
        # acc[i,k] = Σ_{p,j} s_off[p,j,i] w[p,j,k]
        acc = dsx.matmul_ds(
            jnp.swapaxes(s_off.reshape(W * B, B), 0, 1), w.reshape(W * B, B)
        )
        sjj = dsx.matmul_ds(linv.T - acc, linv)
        sjj = 0.5 * (sjj + sjj.T)
        col = jnp.concatenate([sjj[None], s_off], axis=0)
        mask = (j + jnp.arange(W + 1) < nb).astype(dtype)[:, None, None]
        col = col * mask
        CS_new = jnp.concatenate([col[None], CS[:-1]], axis=0)
        return CS_new, col

    init = jnp.zeros((W, W + 1, B, B), dtype)
    _, cols = lax.scan(
        step, init, (jnp.moveaxis(l_blocks, 1, 0), jnp.arange(nb)), reverse=True
    )
    return jnp.moveaxis(cols, 0, 1)


def takahashi_inverse_block_banded(l_blocks: jnp.ndarray) -> jnp.ndarray:
    """Block band of A^{-1} from the block-banded Cholesky factor.

    Block generalization of the scalar Takahashi recursion
    (banded/ops.py:takahashi_inverse_band); exact on the block band.
    Returns (W+1, nb, B, B) block-lower storage of A^{-1} (diagonal blocks
    full-symmetric).
    """
    Wp1, nb, B, _ = l_blocks.shape
    W = Wp1 - 1
    dtype = l_blocks.dtype
    eye = jnp.eye(B, dtype=dtype)

    if _use_ds(l_blocks):
        return _takahashi_inverse_block_banded_ds(l_blocks)

    if W == 0:
        def inv_block(L):
            Linv = lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
            return Linv.T @ Linv

        return jax.vmap(inv_block)(l_blocks[0])[None]

    def step(CS, inp):
        # CS: (W, W+1, B, B) — CS[p-1] = S block column J+p
        l_col, j = inp
        ljj = l_col[0]
        ljj_safe = jnp.where(jnp.abs(ljj).sum() > 0, ljj, eye)
        # Linv_jj = L[J,J]^{-1}
        linv = lax.linalg.triangular_solve(ljj_safe, eye, left_side=True, lower=True)
        w = l_col[1:]  # (W, B, B): w[p-1] = L[J+p, J]
        # M[q-1, p-1] = S_sym[J+q, J+p]:
        #   p <= q: S[J+q, J+p] = CS[p-1, q-p]
        #   p > q : S[J+p, J+q]^T = CS[q-1, p-q]^T
        rows = []
        for q in range(1, W + 1):
            cols = []
            for p in range(1, W + 1):
                if p <= q:
                    cols.append(CS[p - 1, q - p])
                else:
                    cols.append(jnp.swapaxes(CS[q - 1, p - q], -1, -2))
            rows.append(jnp.stack(cols, axis=0))
        M = jnp.stack(rows, axis=0)  # (W, W, B, B)
        # From Z L = L^{-T}, block column J, rows I > J:
        #   S[J+q, J] = -(sum_p S_sym[J+q, J+p] L[J+p, J]) L[J,J]^{-1}
        t = jnp.einsum("qpij,pjk->qik", M, w, preferred_element_type=dtype)
        s_off = -jnp.matmul(t, linv[None], preferred_element_type=dtype)  # (W, B, B)
        # Row I = J:
        #   S[J,J] = (L[J,J]^{-T} - sum_p S[J+p, J]^T L[J+p, J]) L[J,J]^{-1}
        acc = jnp.einsum("pji,pjk->ik", s_off, w, preferred_element_type=dtype)
        sjj = (linv.T - acc) @ linv
        sjj = 0.5 * (sjj + sjj.T)
        col = jnp.concatenate([sjj[None], s_off], axis=0)
        mask = (j + jnp.arange(W + 1) < nb).astype(dtype)[:, None, None]
        col = col * mask
        CS_new = jnp.concatenate([col[None], CS[:-1]], axis=0)
        return CS_new, col

    init = jnp.zeros((W, W + 1, B, B), dtype)
    _, cols = lax.scan(
        step, init, (jnp.moveaxis(l_blocks, 1, 0), jnp.arange(nb)), reverse=True
    )
    return jnp.moveaxis(cols, 0, 1)


def block_band_to_dense(blocks: jnp.ndarray) -> jnp.ndarray:
    """Expand block-lower storage to the dense symmetric (nb*B, nb*B) matrix."""
    Wp1, nb, B, _ = blocks.shape
    W = Wp1 - 1
    n = nb * B
    out = jnp.zeros((n, n), blocks.dtype)
    for p in range(W + 1):
        for j in range(nb - p):
            blk = blocks[p, j]
            out = out.at[(j + p) * B:(j + p + 1) * B, j * B:(j + 1) * B].add(blk)
            if p > 0:
                out = out.at[j * B:(j + 1) * B, (j + p) * B:(j + p + 1) * B].add(blk.T)
    return out


def dense_to_block_band(dense: jnp.ndarray, W: int, B: int) -> jnp.ndarray:
    """Extract block-lower storage from a dense symmetric matrix."""
    n = dense.shape[0]
    nb = n // B
    out = jnp.zeros((W + 1, nb, B, B), dense.dtype)
    for p in range(W + 1):
        for j in range(nb - p):
            out = out.at[p, j].set(
                dense[(j + p) * B:(j + p + 1) * B, j * B:(j + 1) * B]
            )
    return out
