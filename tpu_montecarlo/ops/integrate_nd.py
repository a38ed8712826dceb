"""Multi-dimensional Monte Carlo integration sweep (XLA backend).

A capability extension beyond the 1-D-only reference (its device layer
binds exactly one distribution per program, src/engine.rs:250-264): the
integrands take d scalar arguments and E[f(X_1, ..., X_d)] is estimated
over INDEPENDENT per-dimension distributions — any mix of the analytic
families and table-sampled customs, each dimension keeping the exact 1-D
sampling semantics (same transforms, same tables).

Design, TPU-first:
  * one jitted scan over sample chunks, as in the 1-D sweep
    (ops/integrate_xla.py); each chunk draws d same-length sample blocks
    from independent streams and evaluates all K integrands on the shared
    tuple — K-function fusion across a d-dimensional sample.
  * MC streams: dimension j folds j into the chunk key, so dimensions are
    independent and results stay independent of the mesh size.
  * QMC (``method="qmc"``): dimension j is Sobol dimension j (ops/qmc.py
    — dimension 0 is the 1-D radical inverse), each under its own
    seed-derived Cranley-Patterson rotation, giving a proper
    d-dimensional digital net rather than d copies of one stream; past
    one 2^32-point cycle the index space auto-segments exactly like the
    1-D path.
  * Kahan accumulation, on-device reduction, optional pilot-shifted
    sum-of-squares error bars, and shard_map + psum over a device mesh —
    all identical in structure to the 1-D sweep.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..sampling import (
    DistKind,
    sample_block,
    sample_block_antithetic,
    transform_from_u,
)
from ..utils.dispatch import IntegratePlan

__all__ = ["build_integrate_nd_fn"]


def _kahan_add(sums, comps, vals):
    y = vals - comps
    t = sums + y
    comps = (t - sums) - y
    return t, comps


def build_integrate_nd_fn(
    eval_fns: Sequence[Callable],
    kinds: Sequence[DistKind],
    plan: IntegratePlan,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    exact_inverses: Sequence[bool] = (),
    method: str = "mc",
    with_stderr: bool = False,
):
    """Build a jitted ``(seed, params_t, x_tables_t, cdf_tables_t) ->
    (K,) float32`` d-dimensional integration program; the three table
    arguments are d-tuples of per-dimension arrays (analytic families get
    1-element dummies, as in the 1-D path)."""
    if method not in ("mc", "qmc", "antithetic"):
        raise ValueError(
            f"method must be 'mc', 'qmc' or 'antithetic', got {method!r}"
        )
    # d-dimensional antithetic variates: the uniform VECTOR u mirrors to
    # 1-u componentwise, so x' mirrors x through every dimension's
    # monotone inverse CDF jointly — unbiased, variance at most iid MC
    # for integrands monotone in each argument.
    anti = method == "antithetic"
    if anti and plan.chunk_elems % 2 != 0:
        raise ValueError(
            "antithetic sampling pairs draws; the plan's chunk size "
            f"must be even (got {plan.chunk_elems})"
        )
    kinds = tuple(kinds)
    d = len(kinds)
    if d < 1:
        raise ValueError("at least one dimension is required")
    exact_inverses = tuple(exact_inverses) or (False,) * d
    k = len(eval_fns)
    vfns = [jax.vmap(f) for f in eval_fns]
    n_dev = 1 if mesh is None else mesh.size

    if plan.n_chunks % n_dev != 0:
        raise ValueError(
            f"plan.n_chunks ({plan.n_chunks}) must divide evenly over "
            f"{n_dev} devices; pad the plan first"
        )
    local_chunks = plan.n_chunks // n_dev

    qmc_chunks_per_seg = None
    sobol_vs = None
    if method == "qmc":
        from . import qmc as _qmc

        if d > _qmc.SOBOL_MAX_DIMS:
            raise ValueError(
                f"method='qmc' supports up to {_qmc.SOBOL_MAX_DIMS} "
                f"dimensions, got {d}"
            )
        # Direction numbers are baked into the program as constants
        # (32 words per dimension).
        sobol_vs = [_qmc.sobol_direction_numbers(j) for j in range(d)]
        if plan.actual_samples >= _qmc.QMC_MAX_SAMPLES:
            qmc_chunks_per_seg = max(
                1, _qmc.QMC_MAX_SAMPLES // plan.chunk_elems
            )

    def _qmc_dim_chunk(j, g, shift_j, params, x_table, cdf_table):
        from . import qmc as _qmc

        kind = kinds[j]
        if kind == DistKind.NORMAL:
            from ..sampling import normal_from_u01

            return params[0] + params[1] * normal_from_u01(
                _qmc.sobol_u01_halfopen(g, shift_j, sobol_vs[j])
            )
        u = (
            _qmc.sobol_u01_open(g, shift_j, sobol_vs[j])
            if kind == DistKind.EXPONENTIAL
            else _qmc.sobol_u01_halfopen(g, shift_j, sobol_vs[j])
        )
        return transform_from_u(
            u, kind, params, x_table, cdf_table, exact_inverses[j]
        )

    def _sweep(seed, params_t, xt_t, ct_t, chunk_start):
        if method == "qmc":
            from .qmc import derive_shift

            shifts = [derive_shift(seed, j + 1) for j in range(d)]
        else:
            key = jax.random.PRNGKey(seed)
            dim_keys = [jax.random.fold_in(key, j) for j in range(d)]

        def draw(i):
            """One chunk: a d-tuple of (chunk_elems,) sample blocks."""
            if method == "qmc":
                g = (
                    i.astype(jnp.uint32) * jnp.uint32(plan.chunk_elems)
                    + jnp.arange(
                        plan.chunk_elems, dtype=jnp.int32
                    ).astype(jnp.uint32)
                )
                if qmc_chunks_per_seg is not None:
                    from .qmc import derive_segment_shift

                    cps = jnp.int32(qmc_chunks_per_seg)
                    seg = i // cps
                    g = (
                        (i - seg * cps).astype(jnp.uint32)
                        * jnp.uint32(plan.chunk_elems)
                        + jnp.arange(
                            plan.chunk_elems, dtype=jnp.int32
                        ).astype(jnp.uint32)
                    )
                    shifts_i = [
                        derive_segment_shift(s, seg) for s in shifts
                    ]
                else:
                    shifts_i = shifts
                return tuple(
                    _qmc_dim_chunk(
                        j, g, shifts_i[j], params_t[j], xt_t[j], ct_t[j]
                    )
                    for j in range(d)
                )
            if anti:
                pairs = [
                    sample_block_antithetic(
                        jax.random.fold_in(dim_keys[j], i),
                        (plan.chunk_elems // 2,),
                        kinds[j],
                        params_t[j],
                        xt_t[j],
                        ct_t[j],
                        exact_inverse=exact_inverses[j],
                    )
                    for j in range(d)
                ]
                return (
                    tuple(p[0] for p in pairs),
                    tuple(p[1] for p in pairs),
                )
            return tuple(
                sample_block(
                    jax.random.fold_in(dim_keys[j], i),
                    (plan.chunk_elems,),
                    kinds[j],
                    params_t[j],
                    xt_t[j],
                    ct_t[j],
                    exact_inverse=exact_inverses[j],
                )
                for j in range(d)
            )

        if with_stderr:
            # Same pilot-shift trick as the 1-D sweep: center the square
            # accumulation on chunk-0 means (identical on all devices) so
            # E[(f-c)^2] - (mean-c)^2 never cancels catastrophically.
            xs0 = draw(jnp.int32(0))
            if anti:
                pilot = jnp.stack([
                    0.5 * (
                        jnp.mean(vf(*xs0[0]).astype(jnp.float32))
                        + jnp.mean(vf(*xs0[1]).astype(jnp.float32))
                    )
                    for vf in vfns
                ])
            else:
                pilot = jnp.stack(
                    [jnp.mean(vf(*xs0).astype(jnp.float32)) for vf in vfns]
                )

        def body(carry, i):
            xs = draw(chunk_start + i)
            if with_stderr:
                sums, comps, sq_sums, sq_comps = carry
                if anti:
                    ys1 = [vf(*xs[0]).astype(jnp.float32) for vf in vfns]
                    ys2 = [vf(*xs[1]).astype(jnp.float32) for vf in vfns]
                    vals = jnp.stack(
                        [jnp.sum(a) + jnp.sum(b) for a, b in zip(ys1, ys2)]
                    )
                    # Squares of PAIR MEANS — the antithetic estimator's
                    # iid unit (see the 1-D sweep).
                    sq_vals = jnp.stack([
                        jnp.sum(
                            (0.5 * (a + b) - c) * (0.5 * (a + b) - c)
                        )
                        for a, b, c in zip(ys1, ys2, pilot)
                    ])
                else:
                    ys = [vf(*xs).astype(jnp.float32) for vf in vfns]
                    vals = jnp.stack([jnp.sum(y) for y in ys])
                    sq_vals = jnp.stack(
                        [
                            jnp.sum((y - c) * (y - c))
                            for y, c in zip(ys, pilot)
                        ]
                    )
                return (
                    _kahan_add(sums, comps, vals)
                    + _kahan_add(sq_sums, sq_comps, sq_vals)
                ), None
            sums, comps = carry
            if anti:
                vals = jnp.stack(
                    [
                        jnp.sum(vf(*xs[0])) + jnp.sum(vf(*xs[1]))
                        for vf in vfns
                    ]
                )
            else:
                vals = jnp.stack([jnp.sum(vf(*xs)) for vf in vfns])
            return _kahan_add(sums, comps, vals), None

        n_acc = 4 if with_stderr else 2
        init = tuple(jnp.zeros(k, jnp.float32) for _ in range(n_acc))
        carry, _ = jax.lax.scan(
            body, init, jnp.arange(local_chunks, dtype=jnp.int32)
        )
        if with_stderr:
            return carry[0], carry[2], pilot
        return carry[0]

    n_f32 = jnp.float32(plan.actual_samples)
    # Antithetic error bars count PAIRS as the iid unit.
    n_units = jnp.float32(
        plan.actual_samples // 2 if anti else plan.actual_samples
    )

    def _finish(sums, sq_sums=None, pilot=None):
        mean = sums / n_f32
        if sq_sums is None:
            return mean
        dlt = mean - pilot
        var = jnp.maximum(sq_sums / n_units - dlt * dlt, 0.0)
        return mean, jnp.sqrt(var / n_units)

    if mesh is None:

        @jax.jit
        def run(seed, params_t, xt_t, ct_t):
            out = _sweep(seed, params_t, xt_t, ct_t, 0)
            if with_stderr:
                return _finish(*out)
            return _finish(out)

        return run

    replicated = P()

    def sharded_body(seed, params_t, xt_t, ct_t):
        dev = jax.lax.axis_index(axis_name)
        out = _sweep(seed, params_t, xt_t, ct_t, dev * local_chunks)
        if with_stderr:
            sums, sq_sums, pilot = out
            return _finish(
                jax.lax.psum(sums, axis_name),
                jax.lax.psum(sq_sums, axis_name),
                pilot,
            )
        return _finish(jax.lax.psum(out, axis_name))

    dim_rep = (replicated,) * d
    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(replicated, dim_rep, dim_rep, dim_rep),
        out_specs=(replicated, replicated) if with_stderr else replicated,
        check_vma=False,
    )

    @jax.jit
    def run(seed, params_t, xt_t, ct_t):
        return shard_mapped(seed, params_t, xt_t, ct_t)

    return run
