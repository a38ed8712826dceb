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
    src/engine.rs:30-37); tables are float32 arrays for CUSTOM only.
    """

    kind: DistKind
    params: np.ndarray  # (2,) float32
    x_table: Optional[np.ndarray] = None
    cdf_table: Optional[np.ndarray] = None


def dist_spec_of(dist) -> DistSpec:
    """Build a DistSpec from a ``Distribution`` (param packing parity with
    reference parse_dist_params, src/lib.rs:436-502)."""
    from .distributions import DistributionType

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
        return DistSpec(
            DistKind.CUSTOM,
            np.zeros(2, np.float32),
            np.asarray(dist._x_table, np.float32),
            np.asarray(dist._cdf_table, np.float32),
        )
    raise ValueError(f"Unknown distribution type: {t}")


def sample_block(
    key: jax.Array,
    shape: Tuple[int, ...],
    kind: DistKind,
    params: jax.Array,
    x_table: Optional[jax.Array] = None,
    cdf_table: Optional[jax.Array] = None,
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
    if kind == DistKind.UNIFORM:
        u = jax.random.uniform(key, shape, jnp.float32)
        return params[0] + u * (params[1] - params[0])
    if kind == DistKind.NORMAL:
        z = jax.random.normal(key, shape, jnp.float32)
        return params[0] + params[1] * z
    if kind == DistKind.EXPONENTIAL:
        u = jax.random.uniform(key, shape, jnp.float32)
        return -jnp.log(jnp.maximum(u, 1e-7)) / params[0]
    if kind == DistKind.CUSTOM:
        u = jax.random.uniform(key, shape, jnp.float32)
        return jnp.interp(u, cdf_table, x_table).astype(jnp.float32)
    raise ValueError(f"Unknown DistKind: {kind}")


def log_pdf(
    kind: DistKind,
    params: jax.Array,
    x: jax.Array,
    x_table: Optional[jax.Array] = None,
    log_pdf_table: Optional[jax.Array] = None,
) -> jax.Array:
    """Closed-form log-densities for analytic families, table lookup for
    CUSTOM; out-of-support values map to the -100 floor.  Matches the MCMC
    acceptance-ratio conventions (reference: src/shader_gen.rs:543-571)."""
    x = jnp.asarray(x, jnp.float32)
    if kind == DistKind.UNIFORM:
        inside = jnp.logical_and(params[0] <= x, x < params[1])
        return jnp.where(
            inside, -jnp.log(params[1] - params[0]), LOG_PDF_FLOOR
        )
    if kind == DistKind.NORMAL:
        z = (x - params[0]) / params[1]
        return -0.5 * z * z - jnp.log(params[1] * 2.50662827463)
    if kind == DistKind.EXPONENTIAL:
        return jnp.where(
            x >= 0.0, jnp.log(params[0]) - params[0] * x, LOG_PDF_FLOOR
        )
    if kind == DistKind.CUSTOM:
        return log_pdf_from_table(x, x_table, log_pdf_table)
    raise ValueError(f"Unknown DistKind: {kind}")


def pdf_from_table(
    x: jax.Array, x_table: jax.Array, pdf_table: jax.Array
) -> jax.Array:
    """Linear-interp PDF lookup; 0.0 outside the table's x-range (reference:
    src/distribution.rs:173-281)."""
    vals = jnp.interp(x, x_table, pdf_table)
    inside = jnp.logical_and(x >= x_table[0], x <= x_table[-1])
    return jnp.where(inside, vals, 0.0).astype(jnp.float32)


def log_pdf_from_table(
    x: jax.Array, x_table: jax.Array, log_pdf_table: jax.Array
) -> jax.Array:
    """Linear-interp log-PDF lookup; -100 outside the table's x-range
    (reference: src/distribution.rs:367-475)."""
    vals = jnp.interp(x, x_table, log_pdf_table)
    inside = jnp.logical_and(x >= x_table[0], x <= x_table[-1])
    return jnp.where(inside, vals, LOG_PDF_FLOOR).astype(jnp.float32)
