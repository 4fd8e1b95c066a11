"""k-means clustering (core/src/kmeans.cpp).

TPU-native: one Lloyd iteration is a distance matmul (MXU), an argmin,
and a one-hot segment-sum matmul — the whole iteration loop runs under
`lax.fori_loop` on device.  kmeans++ seeding (kmeans.cpp:
generateCentersPP) is the same D² sampling, done with numpy on host
(sequential by construction, K tiny).  Empty clusters are re-seeded
with the farthest point from the largest-error cluster, matching the
reference's recovery rule.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as K

__all__ = ["kmeans", "KMEANS_RANDOM_CENTERS", "KMEANS_PP_CENTERS",
           "KMEANS_USE_INITIAL_LABELS"]

KMEANS_RANDOM_CENTERS = 0
KMEANS_PP_CENTERS = 2
KMEANS_USE_INITIAL_LABELS = 1


def _pp_init(X, k, rng):
    n = X.shape[0]
    centers = [X[rng.integers(n)]]
    d2 = ((X - centers[0]) ** 2).sum(-1)
    for _ in range(1, k):
        p = d2 / max(d2.sum(), 1e-12)
        idx = rng.choice(n, p=p)
        centers.append(X[idx])
        d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(-1))
    return np.stack(centers)


@functools.partial(jax.jit, static_argnames=("iters",))
def _lloyd(X, C0, iters):
    n, d = X.shape
    k = C0.shape[0]
    x2 = jnp.sum(X * X, axis=1)

    def dist2(C):
        return (x2[:, None] - 2.0 * X @ C.T
                + jnp.sum(C * C, axis=1)[None, :])

    def body(_, C):
        D = dist2(C)
        lbl = jnp.argmin(D, axis=1)
        onehot = jax.nn.one_hot(lbl, k, dtype=X.dtype)      # (n, k)
        counts = onehot.sum(0)                               # (k,)
        sums = onehot.T @ X                                  # (k, d)
        Cn = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty cluster -> farthest point overall (recovery rule)
        far = jnp.argmax(jnp.min(D, axis=1))
        Cn = jnp.where((counts > 0)[:, None], Cn, X[far][None, :])
        return Cn

    C = jax.lax.fori_loop(0, iters, body, C0)
    D = dist2(C)
    lbl = jnp.argmin(D, axis=1)
    compactness = jnp.sum(jnp.min(D, axis=1))
    return lbl.astype(jnp.int32), C, compactness


def kmeans(data, Kclusters, bestLabels, criteria, attempts, flags,
           centers=None):
    """cv2.kmeans: returns (compactness, labels (N,1) i32, centers)."""
    X = np.asarray(data, np.float32)
    if X.ndim > 2:
        X = X.reshape(len(X), -1)
    n = X.shape[0]
    k = int(Kclusters)
    maxiter = int(criteria[1]) if len(criteria) > 1 else 20
    maxiter = max(maxiter, 1)
    rng = np.random.default_rng(0x5EED)

    Xd = jnp.asarray(X)
    best = None
    use_initial = bool(flags & KMEANS_USE_INITIAL_LABELS) \
        and bestLabels is not None and np.asarray(bestLabels).size == n
    for a in range(max(int(attempts), 1)):
        if use_initial and a == 0:
            lbl0 = np.asarray(bestLabels, np.int64).ravel()
            C0 = np.stack([
                X[lbl0 == j].mean(0) if np.any(lbl0 == j)
                else X[rng.integers(n)] for j in range(k)])
        elif flags & KMEANS_PP_CENTERS:
            C0 = _pp_init(X, k, rng)
        else:
            C0 = X[rng.choice(n, k, replace=False)]
        lbl, C, comp = _lloyd(Xd, jnp.asarray(C0, jnp.float32), maxiter)
        comp = float(comp)
        if best is None or comp < best[0]:
            best = (comp, np.asarray(lbl), np.asarray(C))

    comp, lbl, C = best
    return comp, lbl[:, None].astype(np.int32), C.astype(np.float32)
