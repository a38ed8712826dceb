"""Device samplers and closed-form densities.

Counter-based (threefry) random streams via ``jax.random`` feed analytic
sampling transforms — uniform affine, normal, exponential inverse-transform
with the reference's 1e-7 clamp — and vectorised inverse-CDF table lookup
for custom distributions (reference samplers: src/distribution.rs:80-158).

Everything here is pure jittable JAX; the Pallas kernels have their own
in-kernel RNG but reuse the same transform conventions.
"""

from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .tables import LOG_PDF_FLOOR

__all__ = [
    "DistKind",
    "DistSpec",
    "dist_spec_of",
    "sample_block",
    "log_pdf",
    "pdf_from_table",
    "log_pdf_from_table",
]


class DistKind(IntEnum):
    """Sampling family codes (reference: src/engine.rs:35, dist codes 0..3)."""

    UNIFORM = 0
    NORMAL = 1
    EXPONENTIAL = 2
    CUSTOM = 3


class DistSpec(NamedTuple):
    """Static + dynamic description of a distribution for the compute ops.

    ``kind`` is static (changes the traced program); ``params`` is a (2,)
    float32 array (param1/param2 like the reference's 16-byte POD,
    src/engine.rs:30-37).  For CUSTOM, ``x_table`` carries the host-built
    uniform-u inverse-CDF table the device samples from (tables.py
    compute_inverse_cdf_table — TPU-friendly index arithmetic replaces the
    reference's 12-iteration device binary search, distribution.rs:128-158);
    ``cdf_table`` is unused by the device and kept for parity plumbing.
    """

    kind: DistKind
    params: np.ndarray  # (2,) float32
    x_table: Optional[np.ndarray] = None
    cdf_table: Optional[np.ndarray] = None
    # True when the CDF has flat (zero-density) runs: the uniform-u inverse
    # table would sample inside them, so the exact searchsorted inverse
    # must be used (x_table then holds the ORIGINAL x grid, not the
    # inverse table).  Static — part of every compiled-program cache key.
    exact_inverse: bool = False


def dist_spec_of(dist) -> DistSpec:
    """Build a DistSpec from a ``Distribution`` (param packing parity with
    reference parse_dist_params, src/lib.rs:436-502).  Cached on the
    Distribution: through a tunnelled device every host->device transfer
    costs a round-trip, so repeat calls must not re-upload tables/params."""
    from .distributions import DistributionType
    from .tables import compute_inverse_cdf_table

    cached = getattr(dist, "_cached_spec", None)
    if cached is not None:
        return cached
    spec = _build_spec(dist, DistributionType, compute_inverse_cdf_table)
    dist._cached_spec = spec
    return spec


def _build_spec(dist, DistributionType, compute_inverse_cdf_table) -> DistSpec:
    t = dist.dist_type
    if t == DistributionType.UNIFORM:
        p = (dist.params["min"], dist.params["max"])
        return DistSpec(DistKind.UNIFORM, np.asarray(p, np.float32))
    if t == DistributionType.NORMAL:
        p = (dist.params["mean"], dist.params["std"])
        return DistSpec(DistKind.NORMAL, np.asarray(p, np.float32))
    if t == DistributionType.EXPONENTIAL:
        p = (dist.params["lambda"], 0.0)
        return DistSpec(DistKind.EXPONENTIAL, np.asarray(p, np.float32))
    if t == DistributionType.CUSTOM:
        if dist._x_table is None or dist._cdf_table is None:
            raise ValueError("Custom distribution requires x/cdf tables")
        from .tables import needs_exact_inverse

        cdf = np.asarray(dist._cdf_table, np.float32)
        _, pdf_vals = dist.get_or_compute_pdf_table()
        if needs_exact_inverse(cdf, pdf_vals):
            # Zero-density spans: keep the exact searchsorted inverse.
            return DistSpec(
                DistKind.CUSTOM,
                np.zeros(2, np.float32),
                np.asarray(dist._x_table, np.float32),
                cdf,
                exact_inverse=True,
            )
        inv = getattr(dist, "_inv_cdf_table", None)
        if inv is None:
            inv = compute_inverse_cdf_table(dist._x_table, dist._cdf_table)
            dist._inv_cdf_table = inv
        return DistSpec(DistKind.CUSTOM, np.zeros(2, np.float32), inv, cdf)
    raise ValueError(f"Unknown distribution type: {t}")


def ensure_param_batch_family(
    kind, role: str = "", feature: str = "param_batch"
) -> None:
    """Single source of the runtime-parameter family rule: CUSTOM
    distributions sample/evaluate through host-built per-distribution
    tables, so only analytic families can take runtime parameter rows.
    Raised identically by the API entry points (param_batch,
    expectation_fn), pack_param_batch, and (defensively) the kernel
    builders."""
    if kind == DistKind.CUSTOM:
        subject = (
            f"the {role} distribution samples/evaluates"
            if role
            else "custom distributions sample/evaluate"
        )
        raise ValueError(
            f"{feature} applies to analytic families only "
            f"(uniform/normal/exponential): {subject} through "
            "host-built per-distribution tables"
        )


_SQRT2 = np.float32(np.sqrt(2.0))


def normal_from_u01(u):
    """Standard normal via inverse-CDF: ``sqrt(2) * erfinv(2u - 1)``.

    The TPU-fast normal transform (measured ~4% over Box-Muller at K=8 on
    v5e: one erf_inv polynomial per sample vs the amortised
    log+sqrt+sin+cos pair), and the canonical choice for the QMC path —
    the inverse CDF is monotone, so a 1-D low-discrepancy stream maps to
    a perfectly stratified normal stream (Box-Muller pairs scramble that
    structure across 2-D).  ``u`` may come from a [0, 1) or (0, 1]
    generator (both conventions exist in this codebase); the symmetric
    clamp keeps erfinv off its poles at u=0 and u=1, truncating the
    sampled tails at ~5.2 sigma — the 24-bit-mantissa Box-Muller radius
    it replaces truncated at 5.77 sigma, both statistically invisible at
    the framework's tolerances (P(|Z| > 5.2) ~ 2e-7).
    """
    u = jnp.clip(u, 1e-7, np.float32(1.0 - 1e-7))
    return _SQRT2 * jax.lax.erf_inv(2.0 * u - 1.0)


def next_below_f32(hi):
    """Largest float32 strictly below ``hi`` (finite hi), via bit
    arithmetic (portable to Pallas/Mosaic, unlike lax.nextafter)."""
    h = jnp.asarray(hi, jnp.float32)
    bits = jax.lax.bitcast_convert_type(h, jnp.int32)
    dec = jnp.where(
        h > 0,
        bits - 1,
        jnp.where(h < 0, bits + 1, jnp.int32(-2147483647)),  # -denorm_min
    )
    return jax.lax.bitcast_convert_type(dec, jnp.float32)


def sample_block(
    key: jax.Array,
    shape: Tuple[int, ...],
    kind: DistKind,
    params: jax.Array,
    x_table: Optional[jax.Array] = None,
    cdf_table: Optional[jax.Array] = None,
    exact_inverse: bool = False,
) -> jax.Array:
    """Draw a block of float32 samples from the distribution.

    Transform conventions match the reference WGSL samplers:
      * uniform: affine ``min + u * (max - min)`` (distribution.rs:80-82)
      * normal:  ``mean + std * z`` (Box-Muller on GPU; here the
        counter-based normal from jax.random — same distribution)
      * exponential: ``-log(max(u, 1e-7)) / lambda`` (distribution.rs:120-124)
      * custom: inverse-CDF lookup with linear interpolation between table
        knots (distribution.rs:128-158)
    """
    if kind == DistKind.NORMAL:
        z = jax.random.normal(key, shape, jnp.float32)
        return params[0] + params[1] * z
    u = jax.random.uniform(key, shape, jnp.float32)
    return transform_from_u(
        u, kind, params, x_table, cdf_table, exact_inverse
    )


def transform_from_u(
    u: jax.Array,
    kind: DistKind,
    params: jax.Array,
    x_table: Optional[jax.Array] = None,
    cdf_table: Optional[jax.Array] = None,
    exact_inverse: bool = False,
) -> jax.Array:
    """Map uniform draws ``u`` to samples — the shared non-NORMAL
    transform tail used by both the pseudo-random path (sample_block) and
    the QMC path (ops/integrate_xla._qmc_sample_chunk), so the two
    sampling semantics cannot drift apart.  ``u`` may come from a [0, 1)
    or a (0, 1] generator; the EXPONENTIAL clamp handles either."""
    if kind == DistKind.UNIFORM:
        x = params[0] + u * (params[1] - params[0])
        # u < 1 guarantees x < max mathematically; float32 rounding can
        # still land exactly on max, where the half-open pdf is zero (an
        # IS weight would then divide by q=0) — clamp just below.  The
        # clamp is a measure-zero correction and its bit arithmetic has
        # no AD rule, so it is excluded from the gradient path
        # (expectation_fn differentiates this transform in params).
        return jnp.minimum(
            x, jax.lax.stop_gradient(next_below_f32(params[1]))
        )
    if kind == DistKind.EXPONENTIAL:
        return -jnp.log(jnp.maximum(u, 1e-7)) / params[0]
    if kind == DistKind.CUSTOM:
        if exact_inverse:
            # CDF with flat runs: the exact (discontinuous) inverse keeps
            # samples out of zero-density spans (reference bsearch
            # semantics, distribution.rs:128-158); slower searchsorted.
            return jnp.interp(u, cdf_table, x_table).astype(jnp.float32)
        # x_table here is the uniform-u inverse-CDF table: sampling is
        # index arithmetic + two small-table lookups (no searchsorted —
        # TPU gathers over sorted knots are pathological).
        m = x_table.shape[0]
        pos = u * jnp.float32(m - 1)
        i0 = jnp.clip(pos.astype(jnp.int32), 0, m - 2)
        frac = pos - i0.astype(jnp.float32)
        x0 = jnp.take(x_table, i0)
        x1 = jnp.take(x_table, i0 + 1)
        return (x0 + frac * (x1 - x0)).astype(jnp.float32)
    raise ValueError(f"Unknown DistKind: {kind}")


_SQRT_2PI = np.float32(2.50662827463)


def analytic_log_pdf(kind: DistKind, p1, p2, x):
    """Closed-form log densities for the analytic families from scalar
    params — the SINGLE source of the MCMC acceptance-ratio conventions
    (reference src/shader_gen.rs:543-571: half-open uniform [p1, p2),
    -100 floor out of support), shared by the XLA backend (log_pdf) and
    the Pallas MCMC kernel so the two cannot drift apart."""
    if kind == DistKind.UNIFORM:
        inside = jnp.logical_and(p1 <= x, x < p2)
        return jnp.where(inside, -jnp.log(p2 - p1), LOG_PDF_FLOOR)
    if kind == DistKind.NORMAL:
        z = (x - p1) / p2
        return -0.5 * z * z - jnp.log(p2 * _SQRT_2PI)
    if kind == DistKind.EXPONENTIAL:
        return jnp.where(x >= 0.0, jnp.log(p1) - p1 * x, LOG_PDF_FLOOR)
    raise ValueError(f"No analytic log-pdf for {kind}")


def log_pdf(
    kind: DistKind,
    params: jax.Array,
    x: jax.Array,
    x_table: Optional[jax.Array] = None,
    log_pdf_table: Optional[jax.Array] = None,
    uniform: bool = False,
) -> jax.Array:
    """Closed-form log-densities for analytic families, table lookup for
    CUSTOM; out-of-support values map to the -100 floor.  Matches the MCMC
    acceptance-ratio conventions (reference: src/shader_gen.rs:543-571)."""
    x = jnp.asarray(x, jnp.float32)
    if kind == DistKind.CUSTOM:
        return log_pdf_from_table(x, x_table, log_pdf_table, uniform=uniform)
    return analytic_log_pdf(kind, params[0], params[1], x)


def _uniform_grid_interp(x, x_table, values):
    """Linear interpolation over a UNIFORM x grid: pure index arithmetic +
    two takes instead of searchsorted (the TPU-friendly path; grids built
    by tables.py are always uniform)."""
    n = x_table.shape[0]
    x0 = x_table[0]
    step = (x_table[n - 1] - x0) / jnp.float32(n - 1)
    pos = (x - x0) / step
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n - 2)
    frac = jnp.clip(pos - i0.astype(jnp.float32), 0.0, 1.0)
    v0 = jnp.take(values, i0)
    v1 = jnp.take(values, i0 + 1)
    return v0 + frac * (v1 - v0)


def pdf_from_table(
    x: jax.Array,
    x_table: jax.Array,
    pdf_table: jax.Array,
    uniform: bool = False,
) -> jax.Array:
    """Linear-interp PDF lookup; 0.0 outside the table's x-range (reference:
    src/distribution.rs:173-281).  Pass ``uniform=True`` (static) when the
    grid spacing is constant to skip the searchsorted."""
    if uniform:
        vals = _uniform_grid_interp(x, x_table, pdf_table)
    else:
        vals = jnp.interp(x, x_table, pdf_table)
    inside = jnp.logical_and(x >= x_table[0], x <= x_table[-1])
    return jnp.where(inside, vals, 0.0).astype(jnp.float32)


def log_pdf_from_table(
    x: jax.Array,
    x_table: jax.Array,
    log_pdf_table: jax.Array,
    uniform: bool = False,
) -> jax.Array:
    """Linear-interp log-PDF lookup; -100 outside the table's x-range
    (reference: src/distribution.rs:367-475)."""
    if uniform:
        vals = _uniform_grid_interp(x, x_table, log_pdf_table)
    else:
        vals = jnp.interp(x, x_table, log_pdf_table)
    inside = jnp.logical_and(x >= x_table[0], x <= x_table[-1])
    return jnp.where(inside, vals, LOG_PDF_FLOOR).astype(jnp.float32)
