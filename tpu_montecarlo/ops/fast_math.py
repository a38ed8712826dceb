"""Polynomial trig kernels for the Pallas TPU hot path.

Mosaic's ``sin``/``cos``/``tan`` intrinsics are f32-accurate for ANY
argument (full large-argument range reduction) — and that generality is
startlingly expensive on the VPU: measured on v5e in the K=1 integrate
kernel, a ``sin`` integrand runs 2.12e10 samples/s against 4.22e10 for
an arithmetic one, i.e. one ``sin`` costs as much as the entire
sample+accumulate chain (``cos`` 2.49e10, ``tan`` 2.29e10; ``exp`` /
``log`` / ``sqrt`` / ``tanh`` are all ~free at 4.0-4.3e10).  Monte
Carlo integrands do not need huge-argument trig: sample values are
bounded by the distribution's support or truncation, and MC estimates
carry ~1/sqrt(N) noise floors many orders above f32 rounding.

So inside the Pallas kernels (and ONLY there — the XLA backend keeps
the stock intrinsics) traced ``sin``/``cos``/``tan`` calls resolve to a
single-split Cody-Waite reduction plus minimax polynomials:

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

import jax.numpy as jnp

__all__ = [
    "fast_sin",
    "fast_cos",
    "fast_tan",
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
    def wrapped(x):
        token = _IN_KERNEL.set(True)
        try:
            return f(x)
        finally:
            _IN_KERNEL.reset(token)

    return wrapped
