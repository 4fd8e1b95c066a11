"""VariationalRefinement (video/src/variational_refinement.cpp).

Brox-style variational energy refinement of a dense optical-flow field:
color + gradient constancy data terms, TV-like smoothness, solved by
fixed-point iterations over a linearized system with red-black SOR.

TPU-native design: the reference packs the grid into separate "red" /
"black" SIMD buffers with replicated borders (RedBlackBuffer,
variational_refinement.cpp:88).  On TPU the same iteration is expressed
densely: each SOR half-step updates one checkerboard color with a
masked `jnp.where` over the full grid — exactly equivalent, because in
a 4-neighborhood no pixel of one color neighbors its own color, so the
masked dense update sees precisely the values the in-place red/black
sweep would.  The whole solver (fixed-point loop, 2x5 SOR sweeps,
data/smoothness term assembly) jit-compiles to one fused XLA program of
elementwise VPU ops and static shifts; there is no gather and no
host sync inside the loop.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["VariationalRefinement", "VariationalRefinement_create"]


def _shift_from_left(x):      # value of the left neighbor; 0 outside
    import jax.numpy as jnp
    return jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]


def _shift_from_right(x):
    import jax.numpy as jnp
    return jnp.pad(x, ((0, 0), (0, 1)))[:, 1:]


def _shift_from_up(x):
    import jax.numpy as jnp
    return jnp.pad(x, ((1, 0), (0, 0)))[:-1, :]


def _shift_from_down(x):
    import jax.numpy as jnp
    return jnp.pad(x, ((0, 1), (0, 0)))[1:, :]


def _dx_rep(x):               # x[i,j+1]-x[i,j], replicate => 0 at last col
    import jax.numpy as jnp
    return jnp.concatenate([x[:, 1:] - x[:, :-1],
                            jnp.zeros_like(x[:, :1])], axis=1)


def _dy_rep(x):
    import jax.numpy as jnp
    return jnp.concatenate([x[1:, :] - x[:-1, :],
                            jnp.zeros_like(x[:1, :])], axis=0)


def _sobel1(img, axis):
    """Sobel with ksize=1 ([-1, 0, 1]), BORDER_REPLICATE — the derivative
    filter used at variational_refinement.cpp:140 (gradHorizAndSplitOp)."""
    import jax.numpy as jnp
    if axis == 0:   # d/dx
        p = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
        return p[:, 2:] - p[:, :-2]
    p = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    return p[2:, :] - p[:-2, :]


def _warp_replicate(img, u, v):
    """remap(I1, grid+flow, INTER_LINEAR, BORDER_REPLICATE)."""
    import jax.numpy as jnp
    H, W = img.shape
    yy, xx = jnp.mgrid[0:H, 0:W]
    mx = jnp.clip(xx + u, 0.0, W - 1.0)
    my = jnp.clip(yy + v, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(mx), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(my), 0, H - 2).astype(jnp.int32)
    fx = mx - x0
    fy = my - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * i00 + fx * i01)
            + fy * ((1 - fx) * i10 + fx * i11))


@functools.lru_cache(maxsize=None)
def _make_refine(H, W, fp_iters, sor_iters, omega, alpha, delta, gamma,
                 zeta, epsilon):
    import jax
    import jax.numpy as jnp

    zeta2 = np.float32(zeta * zeta)
    eps2 = np.float32(epsilon * epsilon)
    delta2 = np.float32(delta / 2)
    gamma2 = np.float32(gamma / 2)
    alpha2 = np.float32(alpha / 2)
    om = np.float32(omega)

    yy, xx = np.mgrid[0:H, 0:W]
    red_mask = jnp.asarray(((yy + xx) % 2 == 0))
    has_right = jnp.asarray(xx < W - 1, np.float32)
    has_down = jnp.asarray(yy < H - 1, np.float32)

    def refine(I0, I1, Wu, Wv):
        I0 = I0.astype(jnp.float32)
        I1 = I1.astype(jnp.float32)
        warped = _warp_replicate(I1, Wu, Wv)
        avg = 0.5 * (I0 + warped)
        Iz = warped - I0
        Ix = _sobel1(avg, 0)
        Iy = _sobel1(avg, 1)
        Ixz = _sobel1(Iz, 0)
        Iyz = _sobel1(Iz, 1)
        Ixx = _sobel1(Ix, 0)
        Ixy = _sobel1(Ix, 1)
        Iyy = _sobel1(Iy, 1)

        def fp_body(_, carry):
            cu, cv, du, dv = carry
            # ---- data term (uses dW from the previous fixed-point iter)
            dN = Ix * Ix + Iy * Iy + zeta2
            Ik1z = Iz + Ix * du + Iy * dv
            w = (delta2 / jnp.sqrt(Ik1z * Ik1z / dN + eps2)) / dN
            a11 = w * Ix * Ix + zeta2
            a12 = w * Ix * Iy
            a22 = w * Iy * Iy + zeta2
            b1 = -w * Iz * Ix
            b2 = -w * Iz * Iy
            dNx = Ixx * Ixx + Ixy * Ixy + zeta2
            dNy = Iyy * Iyy + Ixy * Ixy + zeta2
            Ik1zx = Ixz + Ixx * du + Ixy * dv
            Ik1zy = Iyz + Ixy * du + Iyy * dv
            w2 = gamma2 / jnp.sqrt(Ik1zx * Ik1zx / dNx
                                   + Ik1zy * Ik1zy / dNy + eps2)
            a11 = a11 + w2 * (Ixx * Ixx / dNx + Ixy * Ixy / dNy)
            a12 = a12 + w2 * (Ixx * Ixy / dNx + Ixy * Iyy / dNy)
            a22 = a22 + w2 * (Ixy * Ixy / dNx + Iyy * Iyy / dNy)
            b1 = b1 - w2 * (Ixx * Ixz / dNx + Ixy * Iyz / dNy)
            b2 = b2 - w2 * (Ixy * Ixz / dNx + Iyy * Iyz / dNy)

            # ---- smoothness term: edge weights from the current flow
            ux = _dx_rep(cu)
            vx = _dx_rep(cv)
            uy = _dy_rep(cu)
            vy = _dy_rep(cv)
            sw = alpha2 / jnp.sqrt(ux * ux + vx * vx + uy * uy + vy * vy
                                   + eps2)
            # b uses gradients of the ORIGINAL input flow W
            ex_u = sw * _dx_rep(Wu)
            ex_v = sw * _dx_rep(Wv)
            ey_u = sw * _dy_rep(Wu)
            ey_v = sw * _dy_rep(Wv)
            diag = (sw * has_right + sw * has_down
                    + _shift_from_left(sw) + _shift_from_up(sw))
            a11 = a11 + diag
            a22 = a22 + diag
            b1 = b1 + ex_u - _shift_from_left(ex_u) \
                + ey_u - _shift_from_up(ey_u)
            b2 = b2 + ex_v - _shift_from_left(ex_v) \
                + ey_v - _shift_from_up(ey_v)

            wL = _shift_from_left(sw)
            wU = _shift_from_up(sw)

            def sor_color(du, dv, mask):
                sU = (wL * _shift_from_left(du) + sw * _shift_from_right(du)
                      + wU * _shift_from_up(du) + sw * _shift_from_down(du))
                du = jnp.where(
                    mask,
                    du + om * ((sU + b1 - dv * a12) / a11 - du), du)
                sV = (wL * _shift_from_left(dv) + sw * _shift_from_right(dv)
                      + wU * _shift_from_up(dv) + sw * _shift_from_down(dv))
                dv = jnp.where(
                    mask,
                    dv + om * ((sV + b2 - du * a12) / a22 - dv), dv)
                return du, dv

            def sor_body(_, c):
                du, dv = c
                du, dv = sor_color(du, dv, red_mask)
                du, dv = sor_color(du, dv, ~red_mask)
                return du, dv

            du, dv = jax.lax.fori_loop(0, sor_iters, sor_body, (du, dv))
            return Wu + du, Wv + dv, du, dv

        cu, cv, _, _ = jax.lax.fori_loop(
            0, fp_iters, fp_body,
            (Wu, Wv, jnp.zeros_like(Wu), jnp.zeros_like(Wv)))
        return cu, cv

    return jax.jit(refine)


class VariationalRefinement:
    """cv2.VariationalRefinement (tracking.hpp:523)."""

    def __init__(self):
        self.fixedPointIterations = 5
        self.sorIterations = 5
        self.omega = 1.6
        self.alpha = 20.0
        self.delta = 5.0
        self.gamma = 10.0
        self.zeta = 0.1
        self.epsilon = 0.001

    @staticmethod
    def create():
        return VariationalRefinement()

    # parameter surface (tracking.hpp:530-571)
    def getFixedPointIterations(self):
        return self.fixedPointIterations

    def setFixedPointIterations(self, v):
        self.fixedPointIterations = int(v)

    def getSorIterations(self):
        return self.sorIterations

    def setSorIterations(self, v):
        self.sorIterations = int(v)

    def getOmega(self):
        return self.omega

    def setOmega(self, v):
        self.omega = float(v)

    def getAlpha(self):
        return self.alpha

    def setAlpha(self, v):
        self.alpha = float(v)

    def getDelta(self):
        return self.delta

    def setDelta(self, v):
        self.delta = float(v)

    def getGamma(self):
        return self.gamma

    def setGamma(self, v):
        self.gamma = float(v)

    def getEpsilon(self):
        return self.epsilon

    def setEpsilon(self, v):
        self.epsilon = float(v)

    def calcUV(self, I0, I1, flow_u, flow_v):
        """Refine (flow_u, flow_v) in place semantics: returns the refined
        pair (also writes into the passed arrays when they are numpy)."""
        import jax.numpy as jnp
        I0 = np.asarray(I0)
        I1 = np.asarray(I1)
        u = np.asarray(flow_u, np.float32)
        v = np.asarray(flow_v, np.float32)
        if self.fixedPointIterations <= 0:
            return u, v
        fn = _make_refine(I0.shape[0], I0.shape[1],
                          int(self.fixedPointIterations),
                          int(self.sorIterations), float(self.omega),
                          float(self.alpha), float(self.delta),
                          float(self.gamma), float(self.zeta),
                          float(self.epsilon))
        cu, cv = fn(jnp.asarray(I0), jnp.asarray(I1), jnp.asarray(u),
                    jnp.asarray(v))
        cu = np.asarray(cu)
        cv = np.asarray(cv)
        if isinstance(flow_u, np.ndarray) and flow_u.dtype == np.float32:
            flow_u[...] = cu
        if isinstance(flow_v, np.ndarray) and flow_v.dtype == np.float32:
            flow_v[...] = cv
        return cu, cv

    def calc(self, I0, I1, flow):
        flow = np.asarray(flow, np.float32)
        u, v = self.calcUV(I0, I1, flow[..., 0].copy(), flow[..., 1].copy())
        out = np.stack([u, v], axis=-1)
        if isinstance(flow, np.ndarray):
            flow[...] = out
        return out

    def collectGarbage(self):
        _make_refine.cache_clear()


def VariationalRefinement_create():
    return VariationalRefinement()
