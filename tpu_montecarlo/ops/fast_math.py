"""Kernel-grade math for the Pallas TPU hot path.

Two reasons a traced math call cannot just use the jnp intrinsic
inside a Pallas kernel:

1. **Cost.**  Mosaic's ``sin``/``cos``/``tan`` intrinsics are
   f32-accurate for ANY argument (full large-argument range reduction)
   — and that generality is startlingly expensive on the VPU: measured
   on v5e in the K=1 integrate kernel, a ``sin`` integrand runs
   2.12e10 samples/s against 4.22e10 for an arithmetic one, i.e. one
   ``sin`` costs as much as the entire sample+accumulate chain
   (``cos`` 2.49e10, ``tan`` 2.29e10; ``exp`` / ``log`` / ``sqrt`` /
   ``tanh`` are all ~free at 4.0-4.3e10).  Monte Carlo integrands do
   not need huge-argument trig: sample values are bounded by the
   distribution's support or truncation, and MC estimates carry
   ~1/sqrt(N) noise floors many orders above f32 rounding.

2. **Lowerability.**  Mosaic (jax 0.9.0) has NO lowering at all for
   ``asin``/``acos``/``atan``/``atan2``/``sinh``/``cosh``/``asinh``/
   ``acosh``/``atanh``/``expm1``/``cbrt`` (NotImplementedError), and
   ``copysign`` trips a Mosaic verifier bug — a traced integrand using
   any of them would crash the kernel backend on real TPUs even though
   every one is a WGSL builtin the reference compiles fine
   (reference transpiler FUNC_MAP, python/wgpu_montecarlo/
   transpiler.py:82-112).  This module implements each from primitives
   Mosaic does have (arithmetic, exp/log/log1p/sqrt, vector bitcasts),
   which makes the ENTIRE traceable math surface kernel-lowerable —
   asserted by tests/test_fast_math.py's cross-platform lowering sweep.

Inside the Pallas kernels (and ONLY there — the XLA backend keeps the
stock intrinsics) traced trig calls resolve to a single-split
Cody-Waite reduction plus minimax polynomials:

  * reduce: ``k = round(x/pi)``, ``r = (x - k*PI_HI) - k*PI_LO`` with
    ``PI_HI = 3.140625`` (8 significand bits, so ``k*PI_HI`` is exact
    for ``|k| < 2**16``), sign ``(-1)^k``;
  * ``sin(r) = r + r^3 q3(r^2)`` (deg-3 minimax, fitted max err
    1.7e-8 on [-pi/2, pi/2] with f32-rounded coefficients);
  * ``cos(r) = 1 + r^2 q4(r^2)`` (deg-4 minimax, 5.1e-9);
  * ``tan = sin/cos`` off one shared reduction.

Accuracy (measured on-chip against float64): max abs error ~1.7e-7
for ``|x| <= 100``, ~4e-7 for ``|x| <= 1.3e4``, degrading like
``|x| * 6e-8`` beyond ~2e5 where the single-split reduction runs out
of bits (the intrinsics stay accurate everywhere — at 6x the cost).
For calibration: the reference's device trig is WGSL ``sin``/``cos``,
which the WebGPU spec only requires to be within 2^-11 (~5e-4) on
[-pi, pi] and leaves UNDEFINED outside — this path is several orders
of magnitude tighter than the accuracy the reference ever promised,
while restoring the kernels to arithmetic-speed throughput (headline
K=8 bench: 2.12e10 -> 3.35e10 samples/s).

Activation is scoped, not global: :func:`kernelize` wraps an integrand
so the redirect is active exactly while the Pallas builders trace it;
the tracing module's ``sin``/``cos``/``tan`` table entries check
:func:`in_kernel` at call time.  XLA-backend programs, user code, and
host-side table building all evaluate with ``jnp.sin`` et al.
"""

from __future__ import annotations

import contextvars
import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "fast_sin",
    "fast_cos",
    "fast_tan",
    "fast_asin",
    "fast_acos",
    "fast_atan",
    "fast_atan2",
    "fast_sinh",
    "fast_cosh",
    "fast_asinh",
    "fast_acosh",
    "fast_atanh",
    "fast_expm1",
    "fast_cbrt",
    "fast_copysign",
    "in_kernel",
    "kernelize",
]

# pi = _PI_HI + _PI_LO + residual(~2.9e-11).  _PI_HI = 201/64 has 8
# significand bits: k * _PI_HI is EXACT in f32 for |k| < 2**16.
_PI_HI = np.float32(3.140625)
_PI_LO = np.float32(np.pi - 3.140625)
_INV_PI = np.float32(1.0 / np.pi)

# Minimax fits on [-pi/2, pi/2] (iterated-weighting least squares over
# Chebyshev nodes, coefficients rounded to f32; fit errors above).
_SIN_C = tuple(
    np.float32(c)
    for c in (2.6000516e-06, -1.9806616e-04, 8.333017e-03, -1.6666657e-01)
)
_COS_C = tuple(
    np.float32(c)
    for c in (
        -2.6077066e-07, 2.4761885e-05, -1.3888404e-03, 4.166664e-02,
        -5e-01,
    )
)


def _reduce_pi(x):
    """(r, sign) with ``x = k*pi + r``, ``|r| <= pi/2``, ``sign=(-1)^k``."""
    k = jnp.round(x * _INV_PI)
    r = (x - k * _PI_HI) - k * _PI_LO
    # (-1)^k without int casts (Mosaic's f32<->int scalar casts are
    # unavailable in kernel code): k mod 2 in {0, 1} -> 1 - 2m.
    m = k - np.float32(2.0) * jnp.round(k * np.float32(0.5))
    sign = np.float32(1.0) - np.float32(2.0) * jnp.abs(m)
    return r, sign


def _sin_poly(r):
    s = r * r
    p = _SIN_C[0]
    for c in _SIN_C[1:]:
        p = p * s + c
    return r + r * s * p


def _cos_poly(r):
    s = r * r
    p = _COS_C[0]
    for c in _COS_C[1:]:
        p = p * s + c
    return np.float32(1.0) + s * p


def fast_sin(x):
    r, sign = _reduce_pi(x)
    return sign * _sin_poly(r)


def fast_cos(x):
    r, sign = _reduce_pi(x)
    return sign * _cos_poly(r)


def fast_tan(x):
    # tan has period pi, so the (-1)^k signs cancel: tan(x) = tan(r).
    # Near odd multiples of pi/2 the ratio blows up exactly as the
    # intrinsic does (WGSL gives tan no accuracy guarantee at all).
    r, _ = _reduce_pi(x)
    return _sin_poly(r) / _cos_poly(r)


# atan(t) = t + t^3 q(t^2) on [-1, 1]: deg-7 minimax q (poly degree 17),
# f32-rounded max abs err 1.2e-8; |t| > 1 reflects through
# atan(t) = sign(t)*pi/2 - atan(1/t).
_ATAN_C = tuple(
    np.float32(c)
    for c in (
        2.6214723e-03, -1.5129199e-02, 4.111591e-02, -7.3661424e-02,
        1.0573628e-01, -1.4185883e-01, 1.9990382e-01, -3.3332986e-01,
    )
)
_PI_2 = np.float32(np.pi / 2)
_PI_F = np.float32(np.pi)


def _atan_unit(t):
    """atan on |t| <= 1 (callers guarantee the range)."""
    s = t * t
    p = _ATAN_C[0]
    for c in _ATAN_C[1:]:
        p = p * s + c
    return t + t * s * p


def fast_atan(x):
    inv = jnp.abs(x) > np.float32(1.0)
    # Evaluate the poly on the reduced argument only: where() computes
    # both branches, so feed it the safe reciprocal.
    t = jnp.where(inv, np.float32(1.0) / x, x)
    a = _atan_unit(t)
    folded = jnp.where(x > 0, _PI_2, -_PI_2) - a
    return jnp.where(inv, folded, a)


def fast_copysign(x, y):
    """|x| with y's sign BIT (correct for signed zeros/inf/nan payloads;
    Mosaic's copysign lowering trips a verifier error, and sign-compare
    tricks lose -0.0).  Vector int32 bitcasts are available in-kernel."""
    # Broadcast first: Mosaic's bitcast is vector-only, and y is often
    # a scalar constant (copysign(expr, -1.0)).
    x, y = jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    )
    xb = jax.lax.bitcast_convert_type(x, jnp.int32)
    yb = jax.lax.bitcast_convert_type(y, jnp.int32)
    out = jnp.bitwise_or(
        jnp.bitwise_and(xb, np.int32(0x7FFFFFFF)),
        jnp.bitwise_and(yb, np.int32(-0x80000000)),
    )
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def fast_atan2(y, x):
    """Quadrant-correct atan(y/x) with numpy's signed-zero and infinity
    conventions (atan2(+-0, -0) = +-pi, atan2(+-inf, -inf) = +-3pi/4...),
    assembled from |y|/|x| in the first quadrant + sign-bit transfers."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    r = _atan_unit(
        jnp.where(ay > ax, ax, ay) / jnp.maximum(jnp.where(ay > ax, ay, ax),
                                                 np.float32(1e-45))
    )
    r = jnp.where(ay > ax, _PI_2 - r, r)
    # 0/0 and inf/inf resolve by convention, not division.
    both_zero = jnp.logical_and(ax == 0.0, ay == 0.0)
    both_inf = jnp.logical_and(jnp.isinf(ax), jnp.isinf(ay))
    r = jnp.where(both_zero, np.float32(0.0), r)
    r = jnp.where(both_inf, np.float32(np.pi / 4), r)
    # x's sign BIT (not x < 0: -0.0 must flip too) selects pi - r.
    xb = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.int32)
    neg_x = xb < 0
    base = jnp.where(neg_x, _PI_F - r, r)
    return fast_copysign(base, y)


def fast_asin(x):
    # No cancellation anywhere: |x| <= 2^-? small -> atan2(x, ~1) ~ x.
    return fast_atan2(x, jnp.sqrt((np.float32(1.0) - x) * (np.float32(1.0) + x)))


def fast_acos(x):
    # Direct quadrant form (pi/2 - asin would cancel near x = 1).
    return fast_atan2(
        jnp.sqrt((np.float32(1.0) - x) * (np.float32(1.0) + x)), x
    )


# expm1 poly for |x| < 0.5: x * (1 + x/2 + ... + x^6/5040), relative
# error ~2e-7 at the switch point; exp(x) - 1 beyond.
_EXPM1_C = tuple(
    np.float32(1.0 / fact) for fact in (5040.0, 720.0, 120.0, 24.0, 6.0, 2.0)
)


def fast_expm1(x):
    p = _EXPM1_C[0]
    for c in _EXPM1_C[1:]:
        p = p * x + c
    small = x + x * x * p
    return jnp.where(jnp.abs(x) < np.float32(0.5), small,
                     jnp.exp(x) - np.float32(1.0))


def fast_sinh(x):
    # u = e^|x| - 1; sinh = (u + u/(u+1))/2 keeps full precision near 0
    # (the naive (e^x - e^-x)/2 loses ~half the bits below |x| ~ 1e-3),
    # and evaluating on |x| avoids the u+1 -> e^-|x| cancellation of the
    # negative branch; odd symmetry restored through the sign bit.
    u = fast_expm1(jnp.abs(x))
    mag = np.float32(0.5) * (u + u / (u + np.float32(1.0)))
    return fast_copysign(mag, x)


def fast_cosh(x):
    e = jnp.exp(x)
    return np.float32(0.5) * (e + np.float32(1.0) / e)


def fast_asinh(x):
    # log1p form stays accurate through the |x| -> 0 cancellation zone;
    # odd symmetry via the sign bit (asinh(-0.0) = -0.0).
    ax = jnp.abs(x)
    t = ax * ax / (np.float32(1.0) + jnp.sqrt(ax * ax + np.float32(1.0)))
    return fast_copysign(jnp.log1p(ax + t), x)


def fast_acosh(x):
    # log1p((x-1) + sqrt((x-1)(x+1))): exact through x -> 1+ (the naive
    # log(x + sqrt(x^2-1)) loses half the bits there); x < 1 -> nan via
    # sqrt, matching the intrinsic.
    t = x - np.float32(1.0)
    return jnp.log1p(t + jnp.sqrt(t * (x + np.float32(1.0))))


def fast_atanh(x):
    # 0.5 log1p(2|x| / (1-|x|)) with the sign restored by bit transfer:
    # the positive branch is cancellation-free (1-|x| is exact by
    # Sterbenz, the big ratio feeds log1p in its flat region), while
    # evaluating the odd form directly at x -> -1 amplifies the ratio's
    # rounding through log1p(u -> -1).  |x| = 1 -> inf, |x| > 1 -> nan
    # (negative 1-|x| flips the ratio below -1), zeros keep their sign.
    ax = jnp.abs(x)
    mag = np.float32(0.5) * jnp.log1p(
        np.float32(2.0) * ax / (np.float32(1.0) - ax)
    )
    return fast_copysign(mag, x)


def fast_cbrt(x):
    # exp(log|x|/3) with the sign carried by bit transfer; 0 -> 0 falls
    # out of exp(-inf/3) = 0, inf -> inf likewise.
    mag = jnp.exp(jnp.log(jnp.abs(x)) * np.float32(1.0 / 3.0))
    return fast_copysign(mag, x)


_IN_KERNEL: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "tpu_mc_fast_math", default=False
)


def in_kernel() -> bool:
    """True while a kernelize()-wrapped integrand is evaluating."""
    return _IN_KERNEL.get()


def kernelize(f):
    """Wrap an integrand so traced trig resolves to the polynomial
    kernels for the duration of the call (the Pallas builders wrap
    every eval_fn with this; evaluation happens at trace time, so the
    context flag costs nothing at run time)."""

    @functools.wraps(f)
    def wrapped(*args):
        token = _IN_KERNEL.set(True)
        try:
            return f(*args)
        finally:
            _IN_KERNEL.reset(token)

    return wrapped
