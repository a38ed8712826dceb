"""Fused Monte Carlo integration sweep (XLA backend).

One jitted program generates sample blocks from counter-based streams,
evaluates all K integrands on the *same* samples (multi-function fusion,
like the reference's K register accumulators, src/shader_gen.rs:264-303),
and accumulates per-function partial sums with Kahan compensation.  The
final reduction happens on-device — replacing the reference's CPU mean over
65,536 thread partials (src/lib.rs:129-140) with an in-register tree
reduction plus (on a mesh) a psum over ICI.

Sample-count semantics match the reference: the processed count is the
plan's rounded-up ``actual_samples >= n_samples`` with equal weighting
(src/engine.rs:172-173).

Reproducibility: streams are keyed by (seed, global chunk index), so results
are independent of the device-mesh size for a fixed plan.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..sampling import DistKind, sample_block, transform_from_u
from ..utils.dispatch import IntegratePlan

__all__ = ["build_integrate_fn"]


def _kahan_add(sums, comps, vals):
    y = vals - comps
    t = sums + y
    comps = (t - sums) - y
    return t, comps


def _qmc_sample_chunk(
    chunk_idx, chunk_elems, kind, params, x_table, cdf_table,
    exact_inverse, shift,
):
    """Sample one chunk from the rotated radical-inverse stream
    (ops/qmc.py) — the XLA-backend counterpart of the Pallas kernel's
    _sample_subblocks_qmc, with identical transforms (NORMAL inverts the
    CDF of the 1-D stream via sampling.normal_from_u01 — monotone, so
    the low-discrepancy structure carries to the normals exactly)."""
    from .qmc import qmc_u01_halfopen, qmc_u01_open

    s1 = shift
    g = (
        chunk_idx.astype(jnp.uint32) * jnp.uint32(chunk_elems)
        + jnp.arange(chunk_elems, dtype=jnp.int32).astype(jnp.uint32)
    )
    if kind == DistKind.NORMAL:
        from ..sampling import normal_from_u01

        return params[0] + params[1] * normal_from_u01(
            qmc_u01_halfopen(g, s1)
        )
    # (0, 1] for the log-consuming transform, [0, 1) otherwise; the
    # u -> x tail is shared with sample_block so MC and QMC sampling
    # semantics stay identical by construction.
    u = (
        qmc_u01_open(g, s1)
        if kind == DistKind.EXPONENTIAL
        else qmc_u01_halfopen(g, s1)
    )
    return transform_from_u(u, kind, params, x_table, cdf_table, exact_inverse)


def build_integrate_fn(
    eval_fns: Sequence[Callable],
    kind: DistKind,
    plan: IntegratePlan,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    exact_inverse: bool = False,
    method: str = "mc",
):
    """Build a jitted ``(seed, params, x_table, cdf_table) -> (K,) float32``
    integration program.  ``eval_fns`` are traced scalar functions; they are
    vmapped over the sample block and all evaluated on shared samples.

    With a ``mesh``, the chunk range is split across devices (pure data
    parallelism over the sample axis) and partial sums are combined with
    ``psum`` — the multi-chip axis the single-device reference lacks
    (SURVEY.md §2.4).
    """
    if method not in ("mc", "qmc"):
        raise ValueError(f"method must be 'mc' or 'qmc', got {method!r}")
    k = len(eval_fns)
    vfns = [jax.vmap(f) for f in eval_fns]
    n_dev = 1 if mesh is None else mesh.size

    if plan.n_chunks % n_dev != 0:
        raise ValueError(
            f"plan.n_chunks ({plan.n_chunks}) must divide evenly over "
            f"{n_dev} devices; pad the plan first"
        )
    local_chunks = plan.n_chunks // n_dev
    if method == "qmc":
        from .qmc import QMC_MAX_SAMPLES

        if plan.actual_samples >= QMC_MAX_SAMPLES:
            raise ValueError(
                "QMC uses a uint32 global sample counter; split "
                f"{plan.actual_samples} samples across calls of < "
                f"{QMC_MAX_SAMPLES} samples, giving each call a DISTINCT "
                "seed (each seed is an independent rotation of the same "
                "point set — same-seed calls would redraw identical points)"
            )

    def _sweep(seed, params, x_table, cdf_table, chunk_start):
        if method == "qmc":
            from .qmc import derive_shift

            shift = derive_shift(seed, 1)
        else:
            key = jax.random.PRNGKey(seed)

        def body(carry, i):
            sums, comps = carry
            if method == "qmc":
                x = _qmc_sample_chunk(
                    chunk_start + i, plan.chunk_elems, kind, params,
                    x_table, cdf_table, exact_inverse, shift,
                )
            else:
                ck = jax.random.fold_in(key, chunk_start + i)
                x = sample_block(
                    ck, (plan.chunk_elems,), kind, params, x_table,
                    cdf_table, exact_inverse=exact_inverse,
                )
            vals = jnp.stack([jnp.sum(vf(x)) for vf in vfns])
            return _kahan_add(sums, comps, vals), None

        init = (jnp.zeros(k, jnp.float32), jnp.zeros(k, jnp.float32))
        (sums, _), _ = jax.lax.scan(
            body, init, jnp.arange(local_chunks, dtype=jnp.int32)
        )
        return sums

    # Tables are always passed as arrays; analytic families get 1-element
    # dummies (the reference does the same with dummy GPU buffers,
    # src/engine.rs:250-264) so the call signature stays uniform.
    if mesh is None:

        @jax.jit
        def run(seed, params, x_table, cdf_table):
            sums = _sweep(seed, params, x_table, cdf_table, 0)
            return sums / jnp.float32(plan.actual_samples)

        return run

    replicated = P()

    def sharded_body(seed, params, x_table, cdf_table):
        d = jax.lax.axis_index(axis_name)
        sums = _sweep(seed, params, x_table, cdf_table, d * local_chunks)
        total = jax.lax.psum(sums, axis_name)
        return total / jnp.float32(plan.actual_samples)

    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(replicated, replicated, replicated, replicated),
        out_specs=replicated,
        check_vma=False,
    )

    @jax.jit
    def run(seed, params, x_table, cdf_table):
        return shard_mapped(seed, params, x_table, cdf_table)

    return run
