"""Camera calibration (calib3d/src/calibration.cpp cvCalibrateCamera2).

TPU-native: the reference hand-derives analytic Jacobians for its LM
solver; here the reprojection residual is a pure jnp function of the
packed parameter vector and the Jacobian comes from `jax.jacfwd` —
one compiled program evaluates all views' residuals and derivatives.
Initialization is Zhang's method (intrinsics from the homography
constraint B = K^-T K^-1, extrinsics from H = K [r1 r2 t]).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .geometry import findHomography, Rodrigues

__all__ = ["calibrateCamera", "calibrateCameraRO", "stereoCalibrate"]


def _x64(fn):
    """Run a host-side calibration solver in double precision: the LM
    normal equations need f64 like the reference's CvLevMarq; scoped so
    the rest of the package stays in the TPU-native f32 regime."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.enable_x64(True):
            return fn(*args, **kwargs)
    return wrapped



def _rodrigues_jnp(r):
    theta = jnp.linalg.norm(r) + 1e-12
    k = r / theta
    Kx = jnp.array([[0.0, -k[2], k[1]],
                    [k[2], 0.0, -k[0]],
                    [-k[1], k[0], 0.0]])
    return jnp.eye(3) + jnp.sin(theta) * Kx \
        + (1 - jnp.cos(theta)) * (Kx @ Kx)


def _project_jnp(params, obj, nviews):
    """params = [fx fy cx cy k1 k2 p1 p2 k3, (rvec tvec)*nviews].
    obj: (nviews, N, 3).  Returns (nviews, N, 2)."""
    fx, fy, cx, cy, k1, k2, p1, p2, k3 = params[:9]

    def one(i):
        rv = jax.lax.dynamic_slice(params, (9 + 6 * i,), (3,))
        tv = jax.lax.dynamic_slice(params, (12 + 6 * i,), (3,))
        R = _rodrigues_jnp(rv)
        X = obj[i] @ R.T + tv
        x = X[:, 0] / X[:, 2]
        y = X[:, 1] / X[:, 2]
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
        xt = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yt = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return jnp.stack([fx * xt + cx, fy * yt + cy], axis=-1)

    return jnp.stack([one(i) for i in range(nviews)])


def _zhang_init(homographies, image_size):
    """Closed-form intrinsics from >=3 homographies (Zhang eq. 8-9)."""
    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j]])

    V = []
    for H in homographies:
        V.append(v(H, 0, 1))
        V.append(v(H, 0, 0) - v(H, 1, 1))
    V = np.array(V)
    _, _, vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = vt[-1]
    try:
        cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
        lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
        fx = np.sqrt(lam / b11)
        fy = np.sqrt(lam * b11 / (b11 * b22 - b12 * b12))
        cx = -b13 * fx * fx / lam
        if not (np.isfinite([fx, fy, cx, cy]).all() and fx > 0 and fy > 0):
            raise FloatingPointError
    except (FloatingPointError, ZeroDivisionError):
        # fall back to a generic initialization
        w, h = image_size
        fx = fy = 1.2 * max(w, h)
        cx, cy = (w - 1) / 2, (h - 1) / 2
    return fx, fy, cx, cy


def _extrinsics_from_h(H, K):
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / np.linalg.norm(Kinv @ h1)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = np.cross(r1, r2)
    t = lam * (Kinv @ h3)
    R = np.stack([r1, r2, r3], axis=1)
    # orthogonalize
    u, _, vt = np.linalg.svd(R)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R = -R
        t = -t
    if t[2] < 0:
        # target should be in front of the camera
        R[:, :2] *= -1
        t *= -1
    rvec, _ = Rodrigues(R)
    return np.asarray(rvec).ravel(), t


@_x64
def calibrateCamera(objectPoints, imagePoints, imageSize, cameraMatrix=None,
                    distCoeffs=None, rvecs=None, tvecs=None, flags=0,
                    criteria=(3, 60, 1e-10)):
    """cv2.calibrateCamera: returns (rms, K, dist (1,5), rvecs, tvecs)."""
    objs = [np.asarray(o, np.float64).reshape(-1, 3) for o in objectPoints]
    imgs = [np.asarray(p, np.float64).reshape(-1, 2) for p in imagePoints]
    nviews = len(objs)

    Hs = []
    for o, p in zip(objs, imgs):
        H, _ = findHomography(o[:, :2], p, 0)
        Hs.append(H)
    fx, fy, cx, cy = _zhang_init(Hs, imageSize)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    params = [fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0, 0.0]
    for H in Hs:
        rv, tv = _extrinsics_from_h(H, K)
        params.extend(rv)
        params.extend(tv)
    params = jnp.asarray(np.array(params))

    obj = jnp.asarray(np.stack(objs))
    target = jnp.asarray(np.stack(imgs))

    def residual(p):
        return (_project_jnp(p, obj, nviews) - target).ravel()

    res_fn = jax.jit(residual)
    jac_fn = jax.jit(jax.jacfwd(residual))

    # Levenberg-Marquardt
    lam = 1e-3
    r = np.asarray(res_fn(params))
    cost = float(r @ r)
    maxiter = int(criteria[1]) if len(criteria) > 1 else 60
    for _ in range(maxiter):
        J = np.asarray(jac_fn(params))
        JtJ = J.T @ J
        g = J.T @ r
        for _ in range(10):
            try:
                step = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ)
                                                           + 1e-12), g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            cand = params - jnp.asarray(step)
            rc = np.asarray(res_fn(cand))
            cc = float(rc @ rc)
            if cc < cost:
                params = cand
                r = rc
                lam = max(lam * 0.3, 1e-12)
                improved = cost - cc
                cost = cc
                break
            lam *= 10
        else:
            break
        if improved < 1e-12 * max(cost, 1.0):
            break

    p = np.asarray(params)
    K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
    dist = p[4:9].reshape(1, 5)
    rv_out, tv_out = [], []
    for i in range(nviews):
        rv_out.append(p[9 + 6 * i:12 + 6 * i].reshape(3, 1))
        tv_out.append(p[12 + 6 * i:15 + 6 * i].reshape(3, 1))
    npts = sum(len(o) for o in objs)
    rms = float(np.sqrt(cost / npts))
    return rms, K, dist, rv_out, tv_out


def _params_views(params, i):
    rv = jax.lax.dynamic_slice(params, (6 + 6 * i,), (3,))
    tv = jax.lax.dynamic_slice(params, (9 + 6 * i,), (3,))
    return rv, tv


def _project_fixedK(K, dist, rv, tv, obj):
    R = _rodrigues_jnp(rv)
    X = obj @ R.T + tv
    x = X[:, 0] / X[:, 2]
    y = X[:, 1] / X[:, 2]
    k1, k2, p1, p2, k3 = dist
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xt = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yt = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([K[0, 0] * xt + K[0, 2], K[1, 1] * yt + K[1, 2]],
                     axis=-1)


def _compose_jnp(rv1, tv1, rv2, tv2):
    """Pose composition: (R2 R1, R2 t1 + t2) as jnp."""
    R1 = _rodrigues_jnp(rv1)
    R2 = _rodrigues_jnp(rv2)
    R = R2 @ R1
    t = R2 @ tv1 + tv2
    # rotation matrix -> vector (jnp-safe, away from theta=0/pi handled
    # by the optimizer staying near the init)
    tr = jnp.clip((jnp.trace(R) - 1) / 2, -1 + 1e-9, 1 - 1e-9)
    theta = jnp.arccos(tr)
    axis = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]])
    axis = axis / (2 * jnp.sin(theta) + 1e-12)
    return axis * theta, t


@_x64
def stereoCalibrate(objectPoints, imagePoints1, imagePoints2,
                    cameraMatrix1, distCoeffs1, cameraMatrix2, distCoeffs2,
                    imageSize, R=None, T=None, flags=256,
                    criteria=(3, 100, 1e-10)):
    """cv2.stereoCalibrate with CALIB_FIX_INTRINSIC (the default):
    optimize the inter-camera pose + per-view poses by LM with
    jax.jacfwd Jacobians.  Returns (rms, K1, d1, K2, d2, R, T, E, F)."""
    objs = [np.asarray(o, np.float64).reshape(-1, 3) for o in objectPoints]
    img1 = [np.asarray(p, np.float64).reshape(-1, 2) for p in imagePoints1]
    img2 = [np.asarray(p, np.float64).reshape(-1, 2) for p in imagePoints2]
    K1 = np.asarray(cameraMatrix1, np.float64)
    K2 = np.asarray(cameraMatrix2, np.float64)
    d1 = np.pad(np.asarray(distCoeffs1, np.float64).ravel(), (0, 5))[:5]
    d2 = np.pad(np.asarray(distCoeffs2, np.float64).ravel(), (0, 5))[:5]
    nviews = len(objs)

    # init: per-view poses from PnP on cam1; (R, T) from the median
    # relative pose cam1 -> cam2
    from .geometry import solvePnP, Rodrigues
    view_params = []
    rel_rs = []
    rel_ts = []
    for o, pa, pb in zip(objs, img1, img2):
        _, rv1, tv1 = solvePnP(o, pa, K1, d1)
        _, rv2, tv2 = solvePnP(o, pb, K2, d2)
        rv1 = np.asarray(rv1).ravel()
        tv1 = np.asarray(tv1).ravel()
        rv2 = np.asarray(rv2).ravel()
        tv2 = np.asarray(tv2).ravel()
        view_params.extend([*rv1, *tv1])
        R1m, _ = Rodrigues(rv1)
        R2m, _ = Rodrigues(rv2)
        Rrel = R2m @ R1m.T
        trel = tv2 - Rrel @ tv1
        rr, _ = Rodrigues(Rrel)
        rel_rs.append(np.asarray(rr).ravel())
        rel_ts.append(trel)
    rel_r = np.median(rel_rs, axis=0)
    rel_t = np.median(rel_ts, axis=0)

    params = jnp.asarray(np.concatenate([[*rel_r, *rel_t], view_params]))
    objd = [jnp.asarray(o) for o in objs]
    t1d = [jnp.asarray(p) for p in img1]
    t2d = [jnp.asarray(p) for p in img2]
    K1j = jnp.asarray(K1)
    K2j = jnp.asarray(K2)
    d1j = jnp.asarray(d1)
    d2j = jnp.asarray(d2)

    def residual(p):
        rr = p[:3]
        tt = p[3:6]
        outs = []
        for i in range(nviews):
            rv, tv = _params_views(p, i)
            outs.append((_project_fixedK(K1j, d1j, rv, tv, objd[i])
                         - t1d[i]).ravel())
            rv2, tv2 = _compose_jnp(rv, tv, rr, tt)
            outs.append((_project_fixedK(K2j, d2j, rv2, tv2, objd[i])
                         - t2d[i]).ravel())
        return jnp.concatenate(outs)

    res_fn = jax.jit(residual)
    jac_fn = jax.jit(jax.jacfwd(residual))
    lam = 1e-3
    r = np.asarray(res_fn(params))
    cost = float(r @ r)
    for _ in range(int(criteria[1]) if len(criteria) > 1 else 100):
        J = np.asarray(jac_fn(params))
        JtJ = J.T @ J
        g = J.T @ r
        improved = 0.0
        for _ in range(10):
            try:
                step = np.linalg.solve(
                    JtJ + lam * np.diag(np.diag(JtJ) + 1e-12), g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            cand = params - jnp.asarray(step)
            rc = np.asarray(res_fn(cand))
            cc = float(rc @ rc)
            if cc < cost:
                params = cand
                r = rc
                lam = max(lam * 0.3, 1e-12)
                improved = cost - cc
                cost = cc
                break
            lam *= 10
        else:
            break
        if improved < 1e-12 * max(cost, 1.0):
            break

    p = np.asarray(params)
    Rm, _ = Rodrigues(p[:3])
    Tm = p[3:6].reshape(3, 1)
    tx = np.array([[0, -Tm[2, 0], Tm[1, 0]],
                   [Tm[2, 0], 0, -Tm[0, 0]],
                   [-Tm[1, 0], Tm[0, 0], 0]])
    E = tx @ Rm
    F = np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)
    if abs(F[2, 2]) > 1e-12:
        F = F / F[2, 2]
    npts = 2 * sum(len(o) for o in objs)
    rms = float(np.sqrt(cost / npts))
    return rms, K1, d1.reshape(1, 5), K2, d2.reshape(1, 5), Rm, Tm, E, F


@_x64
def calibrateCameraRO(objectPoints, imagePoints, imageSize, iFixedPoint,
                      cameraMatrix=None, distCoeffs=None, rvecs=None,
                      tvecs=None, newObjPoints=None, flags=0,
                      criteria=(3, 60, 1e-10)):
    """cv2.calibrateCameraRO (calibration.cpp:1334, Strobl's released
    object points method): when 0 < iFixedPoint < N-1, the shared
    object-point set is refined jointly with intrinsics/extrinsics,
    holding point 0, point iFixedPoint (all coordinates), and the last
    point's z fixed (calibration.cpp:398-405).

    Returns (rms, K, dist(1,5), rvecs, tvecs, newObjPoints)."""
    objs = [np.asarray(o, np.float64).reshape(-1, 3) for o in objectPoints]
    imgs = [np.asarray(p, np.float64).reshape(-1, 2) for p in imagePoints]
    nviews = len(objs)
    N = len(objs[0])
    release = 0 < iFixedPoint < N - 1
    if not release:
        rms, K, dist, rv, tv = calibrateCamera(
            objectPoints, imagePoints, imageSize, cameraMatrix,
            distCoeffs, flags=flags, criteria=criteria)
        return rms, K, dist, rv, tv, np.asarray(objs[0])

    # ---- initialize with the standard calibration
    _, K, dist, rv0, tv0 = calibrateCamera(
        objectPoints, imagePoints, imageSize, flags=flags,
        criteria=criteria)

    base = objs[0].ravel().copy()          # 3N template coordinates
    fixed = np.zeros(3 * N, bool)
    fixed[0:3] = True
    fixed[3 * iFixedPoint:3 * iFixedPoint + 3] = True
    fixed[3 * N - 1] = True                # z of the last point
    free_idx = np.nonzero(~fixed)[0]

    p0 = [K[0, 0], K[1, 1], K[0, 2], K[1, 2]] \
        + list(np.asarray(dist).ravel()[:5])
    for rv_i, tv_i in zip(rv0, tv0):
        p0 += list(np.asarray(rv_i).ravel())
        p0 += list(np.asarray(tv_i).ravel())
    p0 += list(base[free_idx])
    params = jnp.asarray(np.asarray(p0))

    target = jnp.asarray(np.stack(imgs))
    base_j = jnp.asarray(base)
    free_j = jnp.asarray(free_idx)
    next_ = 9 + 6 * nviews

    def residual(p):
        obj_flat = base_j.at[free_j].set(
            jax.lax.dynamic_slice(p, (next_,), (len(free_idx),)))
        obj1 = obj_flat.reshape(N, 3)
        obj = jnp.broadcast_to(obj1, (nviews, N, 3))
        return (_project_jnp(p[:next_], obj, nviews) - target).ravel()

    res_fn = jax.jit(residual)
    jac_fn = jax.jit(jax.jacfwd(residual))

    lam = 1e-3
    r = np.asarray(res_fn(params))
    cost = float(r @ r)
    maxiter = int(criteria[1]) if len(criteria) > 1 else 60
    for _ in range(maxiter):
        J = np.asarray(jac_fn(params))
        JtJ = J.T @ J
        g = J.T @ r
        improved = 0.0
        for _ in range(10):
            try:
                step = np.linalg.solve(
                    JtJ + lam * np.diag(np.diag(JtJ) + 1e-12), g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            cand = params - jnp.asarray(step)
            rc = np.asarray(res_fn(cand))
            cc = float(rc @ rc)
            if cc < cost:
                params = cand
                r = rc
                lam = max(lam * 0.3, 1e-12)
                improved = cost - cc
                cost = cc
                break
            lam *= 10
        else:
            break
        if improved < 1e-12 * max(cost, 1.0):
            break

    p = np.asarray(params)
    K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
    dist = p[4:9].reshape(1, 5)
    rv_out, tv_out = [], []
    for i in range(nviews):
        rv_out.append(p[9 + 6 * i:12 + 6 * i].reshape(3, 1))
        tv_out.append(p[12 + 6 * i:15 + 6 * i].reshape(3, 1))
    newobj = base.copy()
    newobj[free_idx] = p[next_:]
    npts = sum(len(o) for o in objs)
    rms = float(np.sqrt(cost / npts))
    return (rms, K, dist, rv_out, tv_out,
            newobj.reshape(N, 3).astype(np.float32))
