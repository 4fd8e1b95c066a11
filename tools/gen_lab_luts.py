"""Generate the fixed-point Lab/Luv LUTs as platform-independent constants.

The reference builds these tables at runtime with its softfloat/softdouble
library so their contents are bit-identical on every host
(modules/imgproc/src/color_lab.cpp:946-1345, createLabTabs).  softfloat /
softdouble are plain IEEE-754 binary32/binary64 with round-to-nearest-even
— exactly what numpy float32 / Python float do for +,-,*,/ — so the tables
are reproduced here with ordinary IEEE arithmetic plus:

  * an exact emulation of the reference's f32 cbrt (a float64 rational
    polynomial followed by mantissa TRUNCATION, softfloat.cpp:3897
    f32_cbrt) — libm cbrtf rounds differently in the last ulp;
  * a correctly-rounded single-precision fused-multiply-add built on
    Fraction (softfloat mulAdd is a true FMA; Python 3.12 lacks math.fma);
  * gamma curves evaluated in double precision (the reference evaluates
    them in softdouble, whose exp/log differ from libm by ~1 ulp of
    double — a 1e-15 relative error cannot move a value across an f32
    rounding boundary at the table scales used here, and the exhaustive
    u8 parity tests in tests/test_color.py verify every entry end to end).

Output: opencv_tpu/ops/lab_luts.npz  (~700 kB compressed).

Run:  python tools/gen_lab_luts.py
"""

import math
import os
import struct
from fractions import Fraction

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "opencv_tpu", "ops", "lab_luts.npz")

# ---------------------------------------------------------------- helpers


def f64_from_raw(h):
    return struct.unpack("<d", struct.pack("<Q", h))[0]


def f32(x):
    """Round a python float (or int) to binary32, back as python float."""
    return float(np.float32(x))


def f32_div(a, b):
    return float(np.divide(np.float32(a), np.float32(b), dtype=np.float32))


def f32_mul(a, b):
    return float(np.multiply(np.float32(a), np.float32(b), dtype=np.float32))


def f32_add(a, b):
    return float(np.add(np.float32(a), np.float32(b), dtype=np.float32))


def f32_sub(a, b):
    return float(np.subtract(np.float32(a), np.float32(b), dtype=np.float32))


def round_f32_frac(fr: Fraction) -> float:
    """Correctly-rounded binary32 from an exact rational (|fr| in normal
    range; ties to even)."""
    if fr == 0:
        return 0.0
    sign = -1 if fr < 0 else 1
    fr = abs(fr)
    # scale so that 2^23 <= m < 2^24 with fr = m * 2^e
    e = fr.numerator.bit_length() - fr.denominator.bit_length() - 23
    # candidate integer mantissa m = fr / 2^e, refine e so 2^23 <= m < 2^24
    def scaled(e):
        if e >= 0:
            return Fraction(fr, 1) / (1 << e)
        return fr * (1 << -e)
    m = scaled(e)
    while m >= (1 << 24):
        e += 1
        m = scaled(e)
    while m < (1 << 23):
        e -= 1
        m = scaled(e)
    lo = int(m)  # floor
    rem = m - lo
    if rem > Fraction(1, 2) or (rem == Fraction(1, 2) and (lo & 1)):
        lo += 1
    return float(sign * lo * (2.0 ** e))


def fma32(a, b, c):
    """Single-precision fused multiply-add (softfloat mulAdd): one rounding."""
    fr = Fraction(a) * Fraction(b) + Fraction(c)
    return round_f32_frac(fr)


def cv_round(x):
    """cvRound = round half to even (f32_to_i32 round_near_even)."""
    return int(np.rint(x))


def f32_cbrt(x):
    """Exact emulation of the reference's softfloat cbrt
    (softfloat.cpp:3897 f32_cbrt): quartic rational in float64 on the
    mantissa, result mantissa TRUNCATED (not rounded) into the f32."""
    assert x >= 0.0
    if x == 0.0:
        return 0.0
    xb = struct.unpack("<I", struct.pack("<f", np.float32(x)))[0]
    s = xb >> 31
    ex = ((xb >> 23) & 0xFF) - 127
    frac = xb & 0x7FFFFF
    shx = ex % 3 if ex >= 0 else -((-ex) % 3)   # C % truncates toward zero
    shx -= 3 if shx >= 0 else 0
    ex = (ex - shx) // 3 - 1          # exact division (ex-shx divisible by 3)
    # fr = double with exponent shx, f32 mantissa widened
    frb = ((shx + 1023) << 52) | (frac << 29)
    fr = struct.unpack("<d", struct.pack("<Q", frb))[0]
    A = [f64_from_raw(h) for h in (
        0x4046a09e6653ba70, 0x406808f46c6116e0, 0x405dca97439cae14,
        0x402add70d2827500, 0x3fc4f15f83f55d2d, 0x402d9e20660edb21,
        0x4062ff15c0285815, 0x406510d06a8112ce, 0x4040fecbc9e2c375)]
    num = (((A[0] * fr + A[1]) * fr + A[2]) * fr + A[3]) * fr + A[4]
    den = (((A[5] * fr + A[6]) * fr + A[7]) * fr + A[8]) * fr + 1.0
    fr = num / den
    frb = struct.unpack("<Q", struct.pack("<d", fr))[0]
    mant = (frb & ((1 << 52) - 1)) >> 29          # truncation
    yb = (s << 31) | ((ex + 127) << 23) | mant
    return float(np.frombuffer(struct.pack("<I", yb), dtype=np.float32)[0])


# ------------------------------------------------------------- constants
# color_lab.cpp:940-1020 (all softdouble raw-bit constants)
D65 = [f64_from_raw(0x3fee6a22b3892ee8), 1.0,
       f64_from_raw(0x3ff16b8950763a19)]
SRGB2XYZ = [f64_from_raw(h) for h in (
    0x3fda65a14488c60d, 0x3fd6e297396d0918, 0x3fc71819d2391d58,
    0x3fcb38cda6e75ff6, 0x3fe6e297396d0918, 0x3fb279aae6c8f755,
    0x3f93cc4ac6cdaf4b, 0x3fbe836eb4e98138, 0x3fee68427418d691)]
XYZ2SRGB = [f64_from_raw(h) for h in (
    0x4009ec804102ff8f, 0xbff8982a9930be0e, 0xbfdfe7ff583a53b9,
    0xbfef042528ae74f3, 0x3ffe040f23897204, 0x3fa546d3f9e7b80b,
    0x3fac7de5082cf52c, 0xbfca1e14bdfd2631, 0x3ff0eabef06b3786)]

GAMMA_SHIFT = 3
LAB_SHIFT = 12
LAB_SHIFT2 = LAB_SHIFT + GAMMA_SHIFT          # 15
INV_GAMMA_SHIFT = 12
INV_GAMMA_TAB_SIZE = 1 << INV_GAMMA_SHIFT      # 4096
LAB_CBRT_TAB_SIZE_B = 256 * 3 // 2 * (1 << GAMMA_SHIFT)   # 3072
LAB_BASE = 1 << 14
LUT_BASE = 1 << 14
LAB_LUT_DIM = 33
MIN_AB_VALUE = -8145

# softfloat versions of the shared constants (exact f32 of exact ratios)
LTHRESH = f32_div(216.0, 24389.0)
LSCALE = f32_div(841.0, 108.0)
LBIAS = f32_div(16.0, 116.0)
U_LOW, U_HIGH = -134.0, 220.0
V_LOW, V_HIGH = -140.0, 122.0
U_RANGE = U_HIGH - U_LOW   # 354, exact
V_RANGE = V_HIGH - V_LOW   # 262, exact


def apply_gamma(x):
    """applyGamma (color_lab.cpp:1023): softdouble eval, softfloat result."""
    thr = 809.0 / 20000.0
    if x <= thr:
        return f32(x / (323.0 / 25.0))
    return f32(math.pow((x + 11.0 / 200.0) / (1.0 + 11.0 / 200.0), 12.0 / 5.0))


def apply_inv_gamma(x):
    thr = 7827.0 / 2500000.0
    if x <= thr:
        return f32(x * (323.0 / 25.0))
    return f32(math.pow(x, 5.0 / 12.0) * (1.0 + 11.0 / 200.0) - 11.0 / 200.0)


def build():
    out = {}

    # --- gamma tables (color_lab.cpp:1257-1270) -------------------------
    int_scale = float(255 * (1 << GAMMA_SHIFT))        # 2040
    srgb_gamma_b = np.zeros(256, np.int32)
    for i in range(256):
        x = f32_div(float(i), 255.0)
        srgb_gamma_b[i] = cv_round(f32_mul(int_scale, apply_gamma(x)))
    out["sRGBGammaTab_b"] = srgb_gamma_b
    out["linearGammaTab_b"] = (np.arange(256, dtype=np.int32)
                               * (1 << GAMMA_SHIFT))

    srgb_inv_gamma_b = np.zeros(INV_GAMMA_TAB_SIZE, np.int32)
    lin_inv_gamma_b = np.zeros(INV_GAMMA_TAB_SIZE, np.int32)
    inv_scale = f32_div(1.0, float(INV_GAMMA_TAB_SIZE))
    for i in range(INV_GAMMA_TAB_SIZE):
        x = f32_mul(inv_scale, float(i))
        srgb_inv_gamma_b[i] = cv_round(f32_mul(255.0, apply_inv_gamma(x)))
        lin_inv_gamma_b[i] = int(f32_mul(255.0, x))          # cvTrunc
    out["sRGBInvGammaTab_b"] = srgb_inv_gamma_b
    out["linearInvGammaTab_b"] = lin_inv_gamma_b

    # --- LabCbrtTab_b (color_lab.cpp:1272-1279) -------------------------
    cb_scale = f32_div(1.0, float(255 * (1 << GAMMA_SHIFT)))
    lshift2 = float(1 << LAB_SHIFT2)
    cbrt_b = np.zeros(LAB_CBRT_TAB_SIZE_B, np.int32)
    for i in range(LAB_CBRT_TAB_SIZE_B):
        x = f32_mul(cb_scale, float(i))
        v = fma32(x, LSCALE, LBIAS) if x < LTHRESH else f32_cbrt(x)
        cbrt_b[i] = cv_round(f32_mul(lshift2, v))
    out["LabCbrtTab_b"] = cbrt_b

    # --- RGB2Lab u8 coefficients (RGB2Lab_b ctor, color_lab.cpp:1591) ---
    # rows scaled by 1/whitept, fixed point at 1<<lab_shift, softdouble.
    lab_fwd_coeffs = np.zeros((3, 3), np.int32)     # [row][R,G,B]
    for i in range(3):
        for j in range(3):
            c = SRGB2XYZ[i * 3 + j] / D65[i]
            lab_fwd_coeffs[i, j] = cv_round(float(1 << LAB_SHIFT) * c)
    out["lab_fwd_coeffs"] = lab_fwd_coeffs

    # --- LabToYF_b (color_lab.cpp:1281-1307) ----------------------------
    lab_to_yf = np.zeros((256, 2), np.int32)
    for i in range(256):
        if i <= 20:
            y = cv_round(f32_div(float(i * LUT_BASE * 20 * 9),
                                 float(17 * 29 * 29 * 29)))
            ify = cv_round(f32_mul(
                float(LUT_BASE),
                f32_add(f32_div(16.0, 116.0),
                        f32_div(float(i * 5), float(3 * 17 * 29)))))
        else:
            fy = f32_add(f32_div(float(i * 100 * LUT_BASE), float(255 * 116)),
                         f32_div(float(16 * LUT_BASE), 116.0))
            ify = cv_round(fy)
            y = cv_round(f32_div(f32_mul(f32_mul(fy, fy), fy),
                                 float(LUT_BASE * LUT_BASE)))
        lab_to_yf[i, 0] = y
        lab_to_yf[i, 1] = ify
    out["LabToYF_b"] = lab_to_yf

    # --- abToXZ_b (initLUTforABXZ, color_lab.cpp:1088-1109) -------------
    n_ab = LAB_BASE * 9 // 4
    ab_to_xz = np.zeros(n_ab, np.int32)
    c_lin = (LUT_BASE * 16 // 116) * 108 // 841     # C int division chain

    def trunc_div(a, b):
        """C integer division (truncates toward zero)."""
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for idx, i in enumerate(range(MIN_AB_VALUE, n_ab + MIN_AB_VALUE)):
        if i <= 3390:
            v = trunc_div(i * 108, 841) - c_lin
        else:
            v = trunc_div(trunc_div(i * i, LUT_BASE) * i, LUT_BASE)
        ab_to_xz[idx] = v
    out["abToXZ_b"] = ab_to_xz

    # --- Lab2RGB u8 coefficients (Lab2RGBinteger ctor, :2423) -----------
    # rows are R,G,B of XYZ2sRGB; columns (X,Y,Z) scaled by whitept col-wise
    lab_inv_coeffs = np.zeros((3, 3), np.int64)
    for i in range(3):          # i = XYZ column
        for j in range(3):      # j = output row (R,G,B)
            c = XYZ2SRGB[i + j * 3]
            lab_inv_coeffs[j, i] = cv_round(float(1 << LAB_SHIFT)
                                            * c * D65[i])
    out["lab_inv_coeffs"] = lab_inv_coeffs.astype(np.int32)

    # Luv2RGB u8 coefficients (Luv2RGBinteger ctor, :3571) — no whitept
    luv_inv_coeffs = np.zeros((3, 3), np.int64)
    for i in range(3):
        for j in range(3):
            luv_inv_coeffs[j, i] = cv_round(float(1 << LAB_SHIFT)
                                            * XYZ2SRGB[i + j * 3])
    out["luv_inv_coeffs"] = luv_inv_coeffs.astype(np.int32)

    # --- Luv LUTs (initLUTforLUV, color_lab.cpp:1043-1086) --------------
    dd = D65[0] + D65[1] * 15.0 + D65[2] * 3.0
    dd = f32_div(1.0, f32(dd))     # softfloat::one()/max(dd, eps)
    un = f32_mul(f32_mul(dd, float(13 * 4)), f32(D65[0]))
    vn = f32_mul(f32_mul(dd, float(13 * 9)), f32(D65[1]))
    # NB: in the reference un/vn are softfloat(dd*52*D65[0]) computed as
    # softfloat ops on softfloat values of the softdouble constants.
    lu_to_up = np.zeros((256, 256), np.int32)
    lv_to_vp = np.zeros((256, 256), np.int32)
    lv_to_vpl = np.zeros((256, 256), np.int64)
    quarter = f32_div(1.0, 4.0)
    for LL in range(256):
        L = f32_div(float(LL * 100), 255.0)
        for uu in range(256):
            u = f32_add(f32_div(f32_mul(float(uu), U_RANGE), 255.0), U_LOW)
            up = f32_mul(9.0, f32_add(u, f32_mul(L, un)))
            lu_to_up[LL, uu] = cv_round(f32_mul(up, float(LUT_BASE // 1024)))
        for vv in range(256):
            v = f32_add(f32_div(f32_mul(float(vv), V_RANGE), 255.0), V_LOW)
            vp = f32_div(quarter, f32_add(v, f32_mul(L, vn)))
            vp = min(max(vp, -quarter), quarter)
            ivp = cv_round(f32_mul(vp, float(LUT_BASE * 1024)))
            lv_to_vp[LL, vv] = ivp
            lv_to_vpl[LL, vv] = (12 * 13 * 100 * (LUT_BASE // 1024)) \
                * (ivp * LL)
    out["LuToUp_b"] = lu_to_up
    out["LvToVp_b"] = lv_to_vp
    out["LvToVpl_b"] = lv_to_vpl
    # vpl decomposed into base-2^14 limbs (l3 signed top) so the 48-bit
    # Luv2RGB integer chain can run in pure int32 on TPU (no x64).
    t = lv_to_vpl
    out["LvToVpl_limbs"] = np.stack(
        [t & 16383, (t >> 14) & 16383, (t >> 28) & 16383, t >> 42],
        axis=-1).astype(np.int16)

    # --- 33^3 interpolation LUTs (initLUTforLABLUVs16, :1130-1215) ------
    # axes: (r=RED, q=GREEN, p=BLUE) slowest..fastest, like the reference's
    # idx = p*3 + q*DIM*3 + r*DIM*DIM*3 layout.
    scale_white = [1.0 / D65[0], 1.0, 1.0 / D65[2]]
    S = [0.0] * 9
    C = [0.0] * 9
    for i in range(3):
        C[i * 3 + 2] = f32(SRGB2XYZ[i * 3 + 0])
        C[i * 3 + 1] = f32(SRGB2XYZ[i * 3 + 1])
        C[i * 3 + 0] = f32(SRGB2XYZ[i * 3 + 2])
        S[i * 3 + 0] = f32(SRGB2XYZ[i * 3 + 2] * scale_white[i])
        S[i * 3 + 1] = f32(SRGB2XYZ[i * 3 + 1] * scale_white[i])
        S[i * 3 + 2] = f32(SRGB2XYZ[i * 3 + 0] * scale_white[i])

    lld = float(LAB_LUT_DIM - 1)
    f9033 = f32_div(float(29 * 29 * 29), 27.0)
    f9of4 = f32_div(9.0, 4.0)
    flt_eps = float(np.finfo(np.float32).eps)
    lab_lut = np.zeros((LAB_LUT_DIM,) * 3 + (3,), np.int16)
    luv_lut = np.zeros((LAB_LUT_DIM,) * 3 + (3,), np.int16)
    gamma_grid = [apply_gamma(f32_div(float(k), lld))
                  for k in range(LAB_LUT_DIM)]
    for p in range(LAB_LUT_DIM):          # blue axis
        B = gamma_grid[p]
        for q in range(LAB_LUT_DIM):      # green axis
            G = gamma_grid[q]
            for r in range(LAB_LUT_DIM):  # red axis
                R = gamma_grid[r]
                # NB the reference binds (p,q,r) to its local (R,G,B)
                # variables, which hold (blue, green, red) — see
                # RGB2Luvinterpolate: R = src[bIdx]. S0..S2 multiply
                # (blue, green, red) respectively.
                def dot3(T, k):
                    a = f32_mul(B, T[k + 0])
                    a = f32_add(a, f32_mul(G, T[k + 1]))
                    return f32_add(a, f32_mul(R, T[k + 2]))
                X = dot3(S, 0)
                Y = dot3(S, 3)
                Z = dot3(S, 6)
                FX = f32_cbrt(X) if X > LTHRESH else fma32(X, LSCALE, LBIAS)
                FY = f32_cbrt(Y) if Y > LTHRESH else fma32(Y, LSCALE, LBIAS)
                FZ = f32_cbrt(Z) if Z > LTHRESH else fma32(Z, LSCALE, LBIAS)
                L = f32_sub(f32_mul(116.0, FY), 16.0) if Y > LTHRESH \
                    else f32_mul(f9033, Y)
                a = f32_mul(500.0, f32_sub(FX, FY))
                b = f32_mul(200.0, f32_sub(FY, FZ))
                lab_lut[r, q, p, 0] = cv_round(
                    f32_div(f32_mul(float(LAB_BASE), L), 100.0))
                lab_lut[r, q, p, 1] = cv_round(
                    f32_div(f32_mul(float(LAB_BASE), f32_add(a, 128.0)),
                            256.0))
                lab_lut[r, q, p, 2] = cv_round(
                    f32_div(f32_mul(float(LAB_BASE), f32_add(b, 128.0)),
                            256.0))

                X = dot3(C, 0)
                Y = dot3(C, 3)
                Z = dot3(C, 6)
                Lf = fma32(Y, LSCALE, LBIAS) if Y < LTHRESH else f32_cbrt(Y)
                Lf = f32_sub(f32_mul(Lf, 116.0), 16.0)
                den = f32_add(f32_add(X, f32_mul(15.0, Y)),
                              f32_mul(3.0, Z))
                d = f32_div(float(4 * 13), max(den, flt_eps))
                u = f32_mul(Lf, f32_sub(f32_mul(X, d), un))
                v = f32_mul(Lf, f32_sub(f32_mul(f32_mul(f9of4, Y), d), vn))
                luv_lut[r, q, p, 0] = cv_round(
                    f32_div(f32_mul(float(LAB_BASE), Lf), 100.0))
                luv_lut[r, q, p, 1] = cv_round(
                    f32_div(f32_mul(float(LAB_BASE), f32_sub(u, U_LOW)),
                            U_RANGE))
                luv_lut[r, q, p, 2] = cv_round(
                    f32_div(f32_mul(float(LAB_BASE), f32_sub(v, V_LOW)),
                            V_RANGE))
    out["RGB2LabLUT"] = lab_lut
    out["RGB2LuvLUT"] = luv_lut

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print("wrote", OUT)
    for k, v in out.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    build()
