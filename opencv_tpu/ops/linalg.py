"""Linear-algebra public surface (core/src/lapack.cpp, matmul.cpp).

The reference hand-rolls LU/Cholesky/Jacobi-SVD in C; on TPU the same
contracts are expressed through jnp.linalg (XLA's batched LAPACK-class
ops run on the MXU), with the cv2 calling conventions and return shapes
preserved.  Host numpy handles the tiny fixed-size systems where device
dispatch would be overhead.
"""

from __future__ import annotations

import numpy as np

from .. import constants as K

__all__ = ["solve", "SVDecomp", "SVBackSubst", "eigen", "eigenNonSymmetric",
           "PCACompute", "PCACompute2", "PCAProject", "PCABackProject",
           "Mahalanobis", "mulTransposed", "transform", "invert",
           "determinant", "trace", "setRNGSeed", "theRNG", "randu", "randn",
           "randShuffle", "RNG"]


def solve(A, b, flags: int = K.DECOMP_LU):
    """cv2.solve (core/src/lapack.cpp:1065): returns (retval, x)."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    if b.ndim == 1:
        b = b[:, None]
    normal = bool(flags & K.DECOMP_NORMAL)
    method = flags & 15
    if normal:
        b = A.T @ b
        A = A.T @ A
    try:
        if method in (K.DECOMP_LU, K.DECOMP_CHOLESKY):
            if A.shape[0] == A.shape[1]:
                x = np.linalg.solve(A, b)
            else:
                x = np.linalg.lstsq(A, b, rcond=None)[0]
        elif method == K.DECOMP_SVD or method == K.DECOMP_QR:
            x = np.linalg.lstsq(A, b, rcond=None)[0]
        elif method == K.DECOMP_EIG:
            x = np.linalg.solve(A, b)
        else:
            raise ValueError(f"solve: unknown method {method}")
    except np.linalg.LinAlgError:
        return False, np.zeros((A.shape[1], b.shape[1]), np.float64)
    return True, x.astype(np.float64)


SVD_MODIFY_A = 1
SVD_NO_UV = 2
SVD_FULL_UV = 4


def SVDecomp(src, flags: int = 0):
    """cv2.SVDecomp: (w (n,1), u (m,n) economy / (m,m) full, vt (n,n))."""
    a = np.asarray(src, np.float64)
    full = bool(flags & SVD_FULL_UV)
    u, s, vt = np.linalg.svd(a, full_matrices=full)
    return s[:, None], u, vt


def SVBackSubst(w, u, vt, rhs):
    w = np.asarray(w, np.float64).ravel()
    u = np.asarray(u, np.float64)
    vt = np.asarray(vt, np.float64)
    rhs = np.asarray(rhs, np.float64)
    if rhs.ndim == 1:
        rhs = rhs[:, None]
    winv = np.where(w > np.finfo(np.float64).eps * w.max() * max(u.shape),
                    1.0 / np.where(w == 0, 1, w), 0.0)
    k = len(w)
    return vt[:k].T @ (winv[:, None] * (u[:, :k].T @ rhs))


def eigen(src):
    """Symmetric eigen (cv2.eigen): (retval, evals desc, evecs as rows)."""
    a = np.asarray(src, np.float64)
    vals, vecs = np.linalg.eigh(a)
    order = np.argsort(vals)[::-1]
    return True, vals[order][:, None], vecs[:, order].T


def eigenNonSymmetric(src):
    a = np.asarray(src, np.float64)
    vals, vecs = np.linalg.eig(a)
    return vals.real[:, None], vecs.real.T


def PCACompute(data, mean=None, eigenvectors=None, maxComponents: int = 0):
    """cv2.PCACompute (core/src/pca.cpp): rows are observations.
    Returns (mean, eigenvectors)."""
    X = np.asarray(data, np.float64)
    if mean is None or (hasattr(mean, "size") and np.asarray(mean).size == 0):
        mu = X.mean(axis=0, keepdims=True)
    else:
        mu = np.asarray(mean, np.float64).reshape(1, -1)
    Xc = X - mu
    # SVD of the centered data: rows of vt are the principal axes
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    n = vt.shape[0] if maxComponents <= 0 else min(maxComponents, vt.shape[0])
    return mu.astype(X.dtype), vt[:n].astype(X.dtype)


def PCACompute2(data, mean=None, maxComponents: int = 0):
    """Returns (mean, eigenvectors, eigenvalues)."""
    X = np.asarray(data, np.float64)
    if mean is None or (hasattr(mean, "size") and np.asarray(mean).size == 0):
        mu = X.mean(axis=0, keepdims=True)
    else:
        mu = np.asarray(mean, np.float64).reshape(1, -1)
    Xc = X - mu
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    evals = (s * s) / X.shape[0]  # reference scales by 1/N (CV_COVAR_SCALE)
    n = vt.shape[0] if maxComponents <= 0 else min(maxComponents, vt.shape[0])
    return mu.astype(X.dtype), vt[:n].astype(X.dtype), \
        evals[:n, None].astype(X.dtype)


def PCAProject(data, mean, eigenvectors):
    X = np.asarray(data, np.float64)
    mu = np.asarray(mean, np.float64).reshape(1, -1)
    V = np.asarray(eigenvectors, np.float64)
    return ((X - mu) @ V.T).astype(np.asarray(data).dtype)


def PCABackProject(data, mean, eigenvectors):
    Y = np.asarray(data, np.float64)
    mu = np.asarray(mean, np.float64).reshape(1, -1)
    V = np.asarray(eigenvectors, np.float64)
    return (Y @ V + mu).astype(np.asarray(data).dtype)


def Mahalanobis(v1, v2, icovar):
    d = np.asarray(v1, np.float64).ravel() - np.asarray(v2, np.float64).ravel()
    ic = np.asarray(icovar, np.float64)
    return float(np.sqrt(d @ ic @ d))


def mulTransposed(src, aTa: bool, delta=None, scale: float = 1.0):
    a = np.asarray(src, np.float64)
    if delta is not None and np.asarray(delta).size:
        a = a - np.asarray(delta, np.float64)
    out = (a.T @ a if aTa else a @ a.T) * scale
    return out


def transform(src, m):
    """cv2.transform: per-element channel-space affine map
    (core/src/matmul.cpp:1731).  Output keeps the source depth
    (saturating for integer types), with dn output channels."""
    src = np.asarray(src)
    a = src.astype(np.float64)
    M = np.asarray(m, np.float64)
    cn = a.shape[-1] if a.ndim == 3 else 1
    pts = a.reshape(-1, cn)
    if M.shape[1] == cn + 1:
        out = pts @ M[:, :cn].T + M[:, cn]
    else:
        out = pts @ M.T
    dn = M.shape[0]
    out = out.reshape(a.shape[0], -1, dn)
    if np.issubdtype(src.dtype, np.integer):
        info = np.iinfo(src.dtype)
        out = np.clip(np.rint(out), info.min, info.max)
    out = out.astype(src.dtype)
    return out[..., 0] if dn == 1 and src.ndim == 2 else out


def invert(src, flags: int = K.DECOMP_LU):
    a = np.asarray(src, np.float64)
    if flags & 15 == K.DECOMP_SVD or a.shape[0] != a.shape[1]:
        return True, np.linalg.pinv(a)
    try:
        return True, np.linalg.inv(a)
    except np.linalg.LinAlgError:
        return False, np.zeros_like(a.T)


def determinant(src):
    return float(np.linalg.det(np.asarray(src, np.float64)))


def trace(src):
    return float(np.trace(np.asarray(src, np.float64)))


# ------------------------------------------------------------------- RNG
# cv2's RNG is a 64-bit multiply-with-carry generator (core/src/rand.cpp);
# the public surface (randu/randn/randShuffle/theRNG) is reproduced over
# numpy's generator — the reference's exact bit-stream is not part of the
# documented contract.

class RNG:
    def __init__(self, state: int = 0xFFFFFFFF):
        self._g = np.random.default_rng(state & 0xFFFFFFFFFFFFFFFF)

    def uniform(self, a, b):
        if isinstance(a, int) and isinstance(b, int):
            return int(self._g.integers(a, b)) if b > a else a
        return float(self._g.uniform(a, b))

    def gaussian(self, sigma):
        return float(self._g.normal(0.0, sigma))

    def fill(self, mat, distType, a, b):
        if distType == 0:  # UNIFORM
            if np.issubdtype(mat.dtype, np.integer):
                mat[...] = self._g.integers(int(a), int(b), mat.shape)
            else:
                mat[...] = self._g.uniform(a, b, mat.shape)
        else:  # NORMAL
            mat[...] = self._g.normal(a, b, mat.shape)
        return mat


_THE_RNG = RNG(12345)


def theRNG():
    return _THE_RNG


def setRNGSeed(seed: int):
    global _THE_RNG
    _THE_RNG = RNG(int(seed))


def randu(dst, low, high):
    return _THE_RNG.fill(np.asarray(dst), 0, low, high)


def randn(dst, mean, stddev):
    return _THE_RNG.fill(np.asarray(dst), 1, mean, stddev)


def randShuffle(dst, iterFactor: float = 1.0):
    a = np.asarray(dst)
    flat = a.reshape(-1, a.shape[-1]) if a.ndim > 1 else a
    _THE_RNG._g.shuffle(flat, axis=0)
    return a
