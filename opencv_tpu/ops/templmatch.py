"""matchTemplate — all 6 TM_* modes (imgproc/src/templmatch.cpp).

TPU-native design: the reference uses blocked FFT correlation
(`crossCorr`, templmatch.cpp:566) because CPU direct convolution is slow;
on TPU the cross-correlation IS a conv — `lax.conv_general_dilated` with
the template as the kernel runs on the MXU, and the normalization terms
come from integral-image window sums (cumsum) fused around it
(`common_matchTemplate` math, templmatch.cpp:906).

float32 accumulation throughout (the reference mixes f32 FFT + f64
integrals); documented tolerance ~1e-4 relative on NORMED outputs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .. import constants as K
from ..core.arrays import to_batched, from_batched

__all__ = ["matchTemplate"]


def _window_sums(x, th, tw):
    """Sliding-window sums of x and x² over th×tw windows (valid), summed
    over channels: returns (wsum, wsum2), shape (N, H-th+1, W-tw+1, 1)."""
    xf = x.astype(jnp.float32)
    s = jnp.cumsum(jnp.cumsum(xf, axis=1), axis=2)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))
    s2 = jnp.cumsum(jnp.cumsum(xf * xf, axis=1), axis=2)
    s2 = jnp.pad(s2, ((0, 0), (1, 0), (1, 0), (0, 0)))

    def win(S):
        H = x.shape[1] - th + 1
        W = x.shape[2] - tw + 1
        return (S[:, th:th + H, tw:tw + W, :] - S[:, th:th + H, 0:W, :]
                - S[:, 0:H, tw:tw + W, :] + S[:, 0:H, 0:W, :])

    return (win(s).sum(axis=-1, keepdims=True),
            win(s2).sum(axis=-1, keepdims=True))


def _cross_corr_conv(x, t):
    C = x.shape[3]
    k = t.astype(jnp.float32)[:, :, :, None]  # (th, tw, C, 1) HWIO
    return lax.conv_general_dilated(
        x.astype(jnp.float32), k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _cross_corr_fft(x, t):
    """FFT cross-correlation (the reference's own strategy,
    templmatch.cpp:566 crossCorr) — a 1-output-channel direct conv never
    reaches the MXU, so beyond tiny templates the rfft2 path is orders of
    magnitude faster on TPU."""
    N, H, W, C = x.shape
    th, tw, _ = t.shape
    oh, ow = H - th + 1, W - tw + 1
    xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
    tf = jnp.fft.rfft2(t.astype(jnp.float32), s=(H, W), axes=(0, 1))
    prod = xf * jnp.conj(tf)[None]
    corr = jnp.fft.irfft2(prod, s=(H, W), axes=(1, 2))
    return jnp.sum(corr[:, :oh, :ow, :], axis=3, keepdims=True)


def _cross_corr(x, t):
    """Valid cross-correlation summed over channels: (N, H-th+1, W-tw+1, 1)."""
    th, tw = t.shape[0], t.shape[1]
    if th * tw <= 64:  # tiny templates: direct taps beat the FFT
        return _cross_corr_conv(x, t)
    return _cross_corr_fft(x, t)


def matchTemplate(image, templ, method: int, mask=None):
    """cv2-compatible matchTemplate; result is (H-th+1)×(W-tw+1) float32.
    Masks follow the reference's semantics (templmatch.cpp:762
    matchTemplateMask): u8 masks are binary, float masks are weights;
    ALL six TM_* modes supported with per-channel correlations."""
    if mask is not None:
        return _match_template_masked(image, templ, method, mask)
    x, meta = to_batched(image)
    t, _ = to_batched(templ)
    t3 = t[0]  # (th, tw, C)
    th, tw, C = t3.shape
    area = float(th * tw * C)

    corr = _cross_corr(x, t3)

    if method == K.TM_CCORR:
        out = corr
    elif method == K.TM_CCORR_NORMED:
        wsum, wsum2 = _window_sums(x, th, tw)
        tnorm2 = jnp.sum(t3.astype(jnp.float32) ** 2)
        den = jnp.sqrt(jnp.maximum(tnorm2 * wsum2, 0.0))
        out = jnp.where(den > 0, corr / den, 1.0)
    elif method == K.TM_SQDIFF:
        wsum, wsum2 = _window_sums(x, th, tw)
        tnorm2 = jnp.sum(t3.astype(jnp.float32) ** 2)
        out = jnp.maximum(wsum2 - 2.0 * corr + tnorm2, 0.0)
    elif method == K.TM_SQDIFF_NORMED:
        wsum, wsum2 = _window_sums(x, th, tw)
        tnorm2 = jnp.sum(t3.astype(jnp.float32) ** 2)
        num = jnp.maximum(wsum2 - 2.0 * corr + tnorm2, 0.0)
        den = jnp.sqrt(jnp.maximum(tnorm2 * wsum2, 0.0))
        out = jnp.where(den > 0, num / den, 1.0)
    elif method in (K.TM_CCOEFF, K.TM_CCOEFF_NORMED):
        wsum, wsum2 = _window_sums(x, th, tw)
        tf = t3.astype(jnp.float32)
        tmean = jnp.mean(tf)
        num = corr - wsum * tmean
        if method == K.TM_CCOEFF:
            out = num
        else:
            tvar = jnp.sum((tf - tmean) ** 2)
            wvar = jnp.maximum(wsum2 - wsum * wsum / area, 0.0)
            den = jnp.sqrt(jnp.maximum(tvar * wvar, 0.0))
            # flat-patch guards (templmatch.cpp:1005-1016)
            out = jnp.where(den > jnp.abs(num) * 1e-7, num / den,
                            jnp.where(jnp.abs(num) < 1e-7, 0.0,
                                      jnp.sign(num)))
    else:
        raise ValueError(f"unknown matchTemplate method {method}")

    return from_batched(out, meta)


def _match_template_masked(image, templ, method, mask):
    x, meta = to_batched(image)
    t, _ = to_batched(templ)
    t3 = t[0].astype(jnp.float32)
    th, tw, C = t3.shape
    m = np.asarray(mask)
    if m.dtype == np.uint8:
        m = (m != 0).astype(np.float32)
    else:
        m = m.astype(np.float32)
    if m.ndim == 2:
        m = m[..., None]
    if m.shape[-1] == 1 and C > 1:
        m = np.repeat(m, C, axis=-1)
    mj = jnp.asarray(m)
    m2 = mj * mj

    xf = x.astype(jnp.float32)
    x2 = xf * xf

    def corr_pc(img, kern):
        """Per-channel valid cross-correlation (depthwise conv)."""
        Cc = img.shape[3]
        k = kern.astype(jnp.float32)[:, :, None, :]  # HWIO, groups=C
        return lax.conv_general_dilated(
            img.astype(jnp.float32), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Cc,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def csum(v):
        return jnp.sum(v, axis=3, keepdims=True)

    if method in (K.TM_SQDIFF, K.TM_SQDIFF_NORMED):
        # matchTemplateMask (templmatch.cpp:799-818)
        t2m2_sum = jnp.sum((t3 * mj) ** 2)
        temp = csum(corr_pc(x2, m2))
        out = -2.0 * csum(corr_pc(xf, t3 * m2)) + temp + t2m2_sum
        if method == K.TM_SQDIFF_NORMED:
            out = out / jnp.sqrt(t2m2_sum * temp)
    elif method in (K.TM_CCORR, K.TM_CCORR_NORMED):
        out = csum(corr_pc(xf, t3 * m2))
        if method == K.TM_CCORR_NORMED:
            t2m2_sum = jnp.sum((t3 * mj) ** 2)
            temp = csum(corr_pc(x2, m2))
            out = out / jnp.sqrt(t2m2_sum * temp)
    elif method in (K.TM_CCOEFF, K.TM_CCOEFF_NORMED):
        # per-channel Scalar sums (templmatch.cpp:839-906)
        mask_sum = jnp.sum(mj, axis=(0, 1))                 # (C,)
        mt_sum = jnp.sum(mj * t3, axis=(0, 1))              # (C,)
        tx = t3 - (mt_sum / mask_sum)[None, None, :]
        templx_mask = m2 * tx
        corr_txm = csum(corr_pc(xf, templx_mask))
        img_mask_corr = corr_pc(xf, mj)                     # per channel
        txm_sum = jnp.sum(templx_mask, axis=(0, 1))         # (C,)
        out = corr_txm - csum(img_mask_corr
                              * (txm_sum / mask_sum)[None, None, None, :])
        if method == K.TM_CCOEFF_NORMED:
            norm_tx = jnp.sqrt(jnp.sum((mj * tx) ** 2))
            mask2_sum = jnp.sum(m2, axis=(0, 1))            # (C,)
            norm_imgx = csum(corr_pc(x2, m2))
            img_mask2_corr = corr_pc(xf, m2)
            temp = (img_mask_corr / mask_sum[None, None, None, :]
                    * (img_mask_corr
                       * (mask2_sum / mask_sum)[None, None, None, :]
                       - 2.0 * img_mask2_corr))
            norm_imgx = jnp.sqrt(norm_imgx + csum(temp))
            out = out / (norm_imgx * norm_tx)
    else:
        raise ValueError(f"unknown matchTemplate method {method}")
    out = out.astype(jnp.float32)
    return from_batched(out, meta) if out.ndim == 4 else np.asarray(out[0, :, :, 0])
