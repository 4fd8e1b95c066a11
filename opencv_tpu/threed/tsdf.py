"""TSDF volume + RGB-D odometry (5.x 3d module Volume/Odometry).

Volume: dense voxel TSDF — integrate projects every voxel into the
depth frame and folds a truncated signed distance with running-weight
averaging; raycast marches rays to the zero crossing.  Both are dense
vectorized numpy passes (on-device versions of these are the natural
next step — the per-voxel update is pure elementwise work).

Odometry: point-to-plane ICP between depth frames over an image
pyramid (the reference's ICP branch of Odometry::compute)."""

from __future__ import annotations

import numpy as np

from .depth import depthTo3d, rescaleDepth

__all__ = ["VolumeSettings", "Volume", "Odometry", "OdometryFrame",
           "OdometrySettings"]


class VolumeSettings:
    def __init__(self, volumeType: int = 0):
        self._voxelSize = 0.005859375
        self._res = (128, 128, 128)
        self._pose = np.eye(4)
        self._trunc = 2.5 * self._voxelSize
        self._maxWeight = 64
        self._depthFactor = 1000.0
        self._maxDepth = 4.0
        self._raycastStep = 0.75
        self._K = np.array([[525, 0, 319.5], [0, 525, 239.5],
                            [0, 0, 1]], np.float64)
        self._isize = (640, 480)

    def getVoxelSize(self):
        return self._voxelSize

    def setVoxelSize(self, v):
        self._voxelSize = float(v)

    def getVolumeResolution(self):
        return self._res

    def setVolumeResolution(self, r):
        self._res = tuple(int(x) for x in np.ravel(r))

    def getVolumePose(self):
        return self._pose.copy()

    def setVolumePose(self, p):
        self._pose = np.asarray(p, np.float64).reshape(4, 4)

    def getTsdfTruncateDistance(self):
        return self._trunc

    def setTsdfTruncateDistance(self, v):
        self._trunc = float(v)

    def getMaxWeight(self):
        return self._maxWeight

    def setMaxWeight(self, v):
        self._maxWeight = int(v)

    def getDepthFactor(self):
        return self._depthFactor

    def setDepthFactor(self, v):
        self._depthFactor = float(v)

    def getMaxDepth(self):
        return self._maxDepth

    def setMaxDepth(self, v):
        self._maxDepth = float(v)

    def getRaycastStepFactor(self):
        return self._raycastStep

    def setRaycastStepFactor(self, v):
        self._raycastStep = float(v)

    def getCameraIntegrateIntrinsics(self):
        return self._K.copy()

    def setCameraIntegrateIntrinsics(self, K):
        self._K = np.asarray(K, np.float64).reshape(3, 3)

    getCameraRaycastIntrinsics = getCameraIntegrateIntrinsics
    setCameraRaycastIntrinsics = setCameraIntegrateIntrinsics

    def getIntegrateWidth(self):
        return self._isize[0]

    def setIntegrateWidth(self, v):
        self._isize = (int(v), self._isize[1])

    def getIntegrateHeight(self):
        return self._isize[1]

    def setIntegrateHeight(self, v):
        self._isize = (self._isize[0], int(v))

    getRaycastWidth = getIntegrateWidth
    getRaycastHeight = getIntegrateHeight
    setRaycastWidth = setIntegrateWidth
    setRaycastHeight = setIntegrateHeight

    def getVolumeStrides(self):
        nx, ny, nz = self._res
        return (ny * nz, nz, 1)

    def setVolumeStrides(self, s):
        pass


class Volume:
    def __init__(self, volumeType: int = 0, settings=None):
        self._s = settings or VolumeSettings()
        self.reset()

    def reset(self):
        nx, ny, nz = self._s.getVolumeResolution()
        self._tsdf = np.ones((nx, ny, nz), np.float32)
        self._w = np.zeros((nx, ny, nz), np.float32)
        self._growth = True

    # -- integration --------------------------------------------------
    def integrate(self, depth, cameraPose):
        """Fold one depth frame taken at camera-to-world pose."""
        d = np.asarray(depth)
        df = rescaleDepth(d, 5).astype(np.float64) \
            if d.dtype in (np.uint16, np.int16) else d.astype(np.float64)
        K = self._s.getCameraIntegrateIntrinsics()
        pose = np.asarray(cameraPose, np.float64).reshape(4, 4)
        w2c = np.linalg.inv(pose)
        nx, ny, nz = self._s.getVolumeResolution()
        vs = self._s.getVoxelSize()
        vol_pose = self._s.getVolumePose()
        trunc = self._s.getTsdfTruncateDistance()
        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij")
        pts = np.stack([ii, jj, kk], -1).reshape(-1, 3) * vs
        pts = pts @ vol_pose[:3, :3].T + vol_pose[:3, 3]
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        ok = z > 0
        u = np.full(len(z), -1, np.int64)
        v = np.full(len(z), -1, np.int64)
        u[ok] = np.round(pc[ok, 0] / z[ok] * K[0, 0] + K[0, 2])
        v[ok] = np.round(pc[ok, 1] / z[ok] * K[1, 1] + K[1, 2])
        H, W = df.shape
        inb = ok & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        dm = np.zeros(len(z))
        dm[inb] = df[v[inb], u[inb]]
        valid = inb & np.isfinite(dm) & (dm > 0) \
            & (dm < self._s.getMaxDepth())
        sdf = dm - z
        upd = valid & (sdf > -trunc)
        tsdf_new = np.clip(sdf / trunc, -1.0, 1.0)
        flat_t = self._tsdf.reshape(-1)
        flat_w = self._w.reshape(-1)
        wn = np.minimum(flat_w[upd] + 1, self._s.getMaxWeight())
        flat_t[upd] = (flat_t[upd] * flat_w[upd]
                       + tsdf_new[upd]) / (flat_w[upd] + 1)
        flat_w[upd] = wn

    def integrateFrame(self, frame, cameraPose):
        self.integrate(frame.getDepth(), cameraPose)

    def integrateColor(self, depth, image, cameraPose):
        self.integrate(depth, cameraPose)

    # -- queries ------------------------------------------------------
    def raycast(self, cameraPose, height: int = -1, width: int = -1):
        """March rays from the camera through the TSDF to the zero
        crossing; returns (points (H,W,4), normals (H,W,4))."""
        K = self._s.getCameraRaycastIntrinsics()
        if width <= 0:
            width = self._s.getRaycastWidth()
        if height <= 0:
            height = self._s.getRaycastHeight()
        pose = np.asarray(cameraPose, np.float64).reshape(4, 4)
        vs = self._s.getVoxelSize()
        nx, ny, nz = self._s.getVolumeResolution()
        step = self._s.getRaycastStepFactor() * vs
        xs, ys = np.meshgrid(np.arange(width), np.arange(height))
        dirs = np.stack([(xs - K[0, 2]) / K[0, 0],
                         (ys - K[1, 2]) / K[1, 1],
                         np.ones_like(xs, np.float64)], -1)
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs_w = dirs @ pose[:3, :3].T
        orig = pose[:3, 3]
        vol_inv = np.linalg.inv(self._s.getVolumePose())
        maxd = self._s.getMaxDepth()
        n_steps = int(maxd / step)
        pts_out = np.full((height, width, 3), np.nan)
        prev_tsdf = np.full((height, width), 1.0)
        prev_t = np.zeros((height, width))
        found = np.zeros((height, width), bool)

        def sample(p):
            q = p @ vol_inv[:3, :3].T + vol_inv[:3, 3]
            idx = np.round(q / vs).astype(int)
            okm = ((idx[..., 0] >= 0) & (idx[..., 0] < nx)
                   & (idx[..., 1] >= 0) & (idx[..., 1] < ny)
                   & (idx[..., 2] >= 0) & (idx[..., 2] < nz))
            val = np.ones(p.shape[:-1])
            wgt = np.zeros(p.shape[:-1])
            ic = np.clip(idx, 0, [nx - 1, ny - 1, nz - 1])
            val_ok = self._tsdf[ic[..., 0], ic[..., 1], ic[..., 2]]
            wgt_ok = self._w[ic[..., 0], ic[..., 1], ic[..., 2]]
            val = np.where(okm, val_ok, 1.0)
            wgt = np.where(okm, wgt_ok, 0.0)
            return val, wgt

        for si in range(1, n_steps):
            t = si * step
            p = orig + dirs_w * t
            val, wgt = sample(p)
            cross = (~found) & (prev_tsdf > 0) & (val <= 0) & (wgt > 0)
            if cross.any():
                # linear interpolation of the zero crossing
                denom = prev_tsdf - val
                tz = np.where(np.abs(denom) > 1e-12,
                              prev_t + (t - prev_t) * prev_tsdf
                              / np.maximum(denom, 1e-12), t)
                pz = orig + dirs_w * tz[..., None]
                pts_out[cross] = pz[cross]
                found |= cross
            prev_tsdf = np.where(wgt > 0, val, prev_tsdf)
            prev_t = np.full_like(prev_t, t)
            if found.all():
                break
        normals = np.zeros((height, width, 3))
        gx = np.gradient(pts_out, axis=1)
        gy = np.gradient(pts_out, axis=0)
        n = np.cross(gx, gy)
        with np.errstate(invalid="ignore", divide="ignore"):
            n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        normals = n
        pad = lambda a: np.concatenate(
            [a, np.zeros(a.shape[:2] + (1,))], -1).astype(np.float32)
        return pad(pts_out), pad(normals)

    def raycastColor(self, cameraPose, *a, **k):
        p, n = self.raycast(cameraPose)
        return p, n, np.zeros_like(p)

    raycastEx = raycast
    raycastExColor = raycastColor

    def fetchPointsNormals(self):
        nx, ny, nz = self._s.getVolumeResolution()
        vs = self._s.getVoxelSize()
        surf = (np.abs(self._tsdf) < 0.5) & (self._w > 0)
        idx = np.argwhere(surf)
        pts = idx * vs
        vol_pose = self._s.getVolumePose()
        pts = pts @ vol_pose[:3, :3].T + vol_pose[:3, 3]
        return (pts.astype(np.float32).reshape(-1, 1, 3),
                np.zeros_like(pts, np.float32).reshape(-1, 1, 3))

    def fetchNormals(self, points):
        return np.zeros_like(np.asarray(points, np.float32))

    def fetchPointsNormalsColors(self):
        p, n = self.fetchPointsNormals()
        return p, n, np.zeros_like(p)

    def getBoundingBox(self, *a, **k):
        nx, ny, nz = self._s.getVolumeResolution()
        vs = self._s.getVoxelSize()
        return np.array([0, 0, 0, nx * vs, ny * vs, nz * vs],
                        np.float32)

    def getTotalVolumeUnits(self):
        return int(np.prod(self._s.getVolumeResolution()))

    def getVisibleBlocks(self):
        return int((self._w > 0).sum())

    def getEnableGrowth(self):
        return self._growth

    def setEnableGrowth(self, v):
        self._growth = bool(v)


class OdometrySettings:
    def __init__(self):
        self._K = np.array([[525, 0, 319.5], [0, 525, 239.5],
                            [0, 0, 1]], np.float32)
        self._iters = [7, 7, 7, 10]
        self._maxDepth = 4.0
        self._minDepth = 0.0
        self._maxDepthDiff = 0.07
        self._maxRot = 15.0
        self._maxTrans = 0.15

    def getCameraMatrix(self):
        return self._K.copy()

    def setCameraMatrix(self, K):
        if K is not None and np.asarray(K).size:
            self._K = np.asarray(K, np.float32).reshape(3, 3)

    def getIterCounts(self):
        return np.asarray(self._iters, np.int32)

    def setIterCounts(self, v):
        self._iters = list(np.ravel(v).astype(int))

    def getMaxDepth(self):
        return self._maxDepth

    def setMaxDepth(self, v):
        self._maxDepth = float(v)

    def getMinDepth(self):
        return self._minDepth

    def setMinDepth(self, v):
        self._minDepth = float(v)

    def getMaxDepthDiff(self):
        return self._maxDepthDiff

    def setMaxDepthDiff(self, v):
        self._maxDepthDiff = float(v)

    def getMaxRotation(self):
        return self._maxRot

    def setMaxRotation(self, v):
        self._maxRot = float(v)

    def getMaxTranslation(self):
        return self._maxTrans

    def setMaxTranslation(self, v):
        self._maxTrans = float(v)

    def getAngleThreshold(self):
        return 0.523599

    def getMaxPointsPart(self):
        return 0.07

    def getMinGradientMagnitude(self):
        return 10.0

    def getMinGradientMagnitudes(self):
        return np.full(4, 10.0, np.float32)

    def getNormalDiffThreshold(self):
        return 50.0

    def getNormalMethod(self):
        return 3

    def getNormalWinSize(self):
        return 5

    def getSobelScale(self):
        return 1.0 / 8

    def getSobelSize(self):
        return 3


class OdometryFrame:
    def __init__(self, depth=None, image=None, mask=None, normals=None):
        self._depth = None if depth is None else np.asarray(depth)
        self._image = None if image is None else np.asarray(image)
        self._mask = None if mask is None else np.asarray(mask)
        self._normals = normals
        self._pyr = None

    def getDepth(self):
        return self._depth

    getProcessedDepth = getDepth

    def getImage(self):
        return self._image

    def getGrayImage(self):
        img = self._image
        if img is not None and img.ndim == 3:
            return img.mean(axis=2).astype(img.dtype)
        return img

    def getMask(self):
        return self._mask

    def getNormals(self):
        return self._normals

    def getPyramidLevels(self):
        return 0 if self._pyr is None else len(self._pyr)

    def getPyramidAt(self, idx, level):
        return None


class Odometry:
    """Depth-frame odometry: multi-scale point-to-plane ICP
    (3d module Odometry, ICP algorithm branch)."""

    def __init__(self, settings=None, algo=None):
        self._s = settings if isinstance(settings, OdometrySettings) \
            else OdometrySettings()

    def prepareFrame(self, frame):
        return frame

    def prepareFrames(self, srcFrame, dstFrame):
        return srcFrame, dstFrame

    def getNormalsComputer(self):
        return None

    @staticmethod
    def _pyr_down_depth(d):
        H, W = d.shape
        H2, W2 = H // 2, W // 2
        blocks = d[:H2 * 2, :W2 * 2].reshape(H2, 2, W2, 2)
        import warnings
        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            return np.nanmean(np.nanmean(blocks, axis=3), axis=1)

    def compute(self, srcFrame, dstFrame, Rt=None):
        """Estimate the rigid motion bringing src onto dst.  Returns
        (ok, Rt 4x4)."""
        get = lambda f: (f.getDepth() if isinstance(f, OdometryFrame)
                         else np.asarray(f))
        src = get(srcFrame).astype(np.float64)
        dst = get(dstFrame).astype(np.float64)
        K0 = self._s.getCameraMatrix().astype(np.float64)
        # build depth pyramids
        levels = max(1, min(3, len(self._s.getIterCounts())))
        pyr_s, pyr_d, Ks = [src], [dst], [K0]
        for _ in range(levels - 1):
            pyr_s.append(self._pyr_down_depth(pyr_s[-1]))
            pyr_d.append(self._pyr_down_depth(pyr_d[-1]))
            Kd = Ks[-1].copy()
            Kd[:2] *= 0.5
            Ks.append(Kd)
        T = (np.eye(4) if Rt is None
             else np.asarray(Rt, np.float64).reshape(4, 4).copy())
        iters = list(self._s.getIterCounts())
        for lvl in range(levels - 1, -1, -1):
            s, d, K = pyr_s[lvl], pyr_d[lvl], Ks[lvl]
            it = iters[min(lvl, len(iters) - 1)]
            T = self._icp_level(s, d, K, T, int(it))
        return True, T

    def _icp_level(self, src, dst, K, T, iters):
        H, W = dst.shape
        dst_pts = depthTo3d(dst.astype(np.float32), K)[..., :3]\
            .astype(np.float64)
        # dst normals from the organized point map
        gx = np.gradient(dst_pts, axis=1)
        gy = np.gradient(dst_pts, axis=0)
        nrm = np.cross(gx, gy)
        with np.errstate(invalid="ignore", divide="ignore"):
            nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        src_pts = depthTo3d(src.astype(np.float32), K)[..., :3]\
            .astype(np.float64).reshape(-1, 3)
        ok_src = np.isfinite(src_pts).all(1) & (src_pts[:, 2] > 0) \
            & (src_pts[:, 2] < self._s.getMaxDepth())
        P = src_pts[ok_src]
        for _ in range(iters):
            Pw = P @ T[:3, :3].T + T[:3, 3]
            z = Pw[:, 2]
            okz = z > 0
            u = np.round(Pw[:, 0] / np.where(okz, z, 1) * K[0, 0]
                         + K[0, 2]).astype(int)
            v = np.round(Pw[:, 1] / np.where(okz, z, 1) * K[1, 1]
                         + K[1, 2]).astype(int)
            inb = okz & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            q = np.full_like(Pw, np.nan)
            n = np.full_like(Pw, np.nan)
            q[inb] = dst_pts[v[inb], u[inb]]
            n[inb] = nrm[v[inb], u[inb]]
            good = (np.isfinite(q).all(1) & np.isfinite(n).all(1)
                    & (np.abs(q[:, 2] - Pw[:, 2])
                       < self._s.getMaxDepthDiff()))
            if good.sum() < 6:
                break
            p_, q_, n_ = Pw[good], q[good], n[good]
            r = ((p_ - q_) * n_).sum(1)
            A = np.hstack([np.cross(p_, n_), n_])
            x, *_ = np.linalg.lstsq(A, -r, rcond=None)
            a, b, c = x[:3]
            Rdelta = np.array([[1, -c, b], [c, 1, -a], [-b, a, 1]])
            U, _s2, Vt = np.linalg.svd(Rdelta)
            Rd = U @ Vt
            Td = np.eye(4)
            Td[:3, :3] = Rd
            Td[:3, 3] = x[3:]
            T = Td @ T
            if np.abs(x).max() < 1e-10:
                break
        return T
