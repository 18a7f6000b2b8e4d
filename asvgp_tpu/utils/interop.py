"""scipy.sparse interop (host-side bridges; API parity with reference
asvgp/utils.py:24-33 band<->sparse conversions and the CSR Kuf surface).

The compute path never materializes CSR matrices (SURVEY.md §2.2 N3); these
helpers exist for users migrating from the reference who want to inspect
the same objects.
"""

from __future__ import annotations

import numpy as np


def lower_band_to_scipy(band):
    """(k+1, m) lower band of a symmetric matrix -> scipy CSR."""
    import scipy.sparse as sp

    band = np.asarray(band)
    k = band.shape[0] - 1
    m = band.shape[1]
    diags = [band[0]]
    offsets = [0]
    for j in range(1, k + 1):
        diags.append(band[j][: m - j])
        offsets.append(-j)
        diags.append(band[j][: m - j])
        offsets.append(j)
    return sp.diags(diags, offsets, shape=(m, m)).tocsr()


def scipy_to_lower_band(mat, bandwidth: int):
    """scipy sparse symmetric matrix -> (k+1, m) lower band (reference
    utils.sparse_to_band semantics, asvgp/utils.py:24-30)."""
    m = mat.shape[0]
    band = np.zeros((bandwidth + 1, m))
    for j in range(bandwidth + 1):
        d = np.asarray(mat.diagonal(-j)).ravel()
        band[j, : m - j] = d
    return band


def kuf_to_scipy(basis, X):
    """Structured-sparse Kuf -> scipy CSR (m, n), reference make_Kuf shape."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    vals, start = basis.evaluate_basis(jnp.asarray(X), dx=0)
    vals = np.asarray(vals)
    start = np.asarray(start)
    n, kp1 = vals.shape
    rows = (start[:, None] + np.arange(kp1)[None, :]).ravel()
    cols = np.repeat(np.arange(n), kp1)
    return sp.csr_matrix((vals.ravel(), (rows, cols)), shape=(basis.m, n))
