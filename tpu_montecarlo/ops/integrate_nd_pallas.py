"""Multi-dimensional fused Monte Carlo integration kernel (Pallas/Mosaic).

The kernel-speed tier of the nd family (ops/integrate_nd.py is the
portable XLA sweep): per fori_loop iteration the kernel draws d
(rows, 128) sample blocks — one per dimension, from the hardware PRNG
(tagged per-dim counter streams in the interpreter tier) or from
in-kernel Sobol dimensions (ops/qmc.py, pure uint32 lane math) — and
evaluates all K d-ary integrands on the shared tuple, accumulating into
K VMEM blocks with the same disjoint-output/grid/seed-batch design as
the 1-D kernel (ops/integrate_pallas.py).

Per-dimension families: the analytic transforms (uniform / normal /
exponential) plus CUSTOM (table-sampled) dimensions fully in-kernel.
The FIRST custom dimension samples through the 1-D kernel's
row-stratified inverse tables (one lane-gather per draw) — stratifying
a single dimension keeps proportional allocation unbiased for any
integrand because the other dims stay independent of the row index;
stratifying two dims on the same row index would pair their strata
diagonally and bias cross terms, so further custom dims (and ALL custom
dims under Sobol QMC, whose points must map through the full inverse)
use the i.i.d. segment lane-gather lookup shared with the MCMC kernel.
Gap-respecting (exact_inverse) customs route to the XLA sweep.
Transforms are the 1-D kernel's, full-block per dimension (the NORMAL
half-block split exists only to keep 1-D accumulator shapes; nd needs
equal-shape blocks across dimensions so every dim draws a full block).

``with_stderr``: pilot-shifted sum-of-squares accumulators exactly as
the 1-D kernel; the nd pilot evaluates f on per-dimension quantile grids
offset by the golden ratio per dim (any fixed shift keeps
``Var[f] = E[(f-c)^2] - (mean-c)^2`` exact — the offsets only
decorrelate the grid so c lands near E[f]).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ..sampling import DistKind
from ..utils.dispatch import IntegratePlan
from .integrate_pallas import (
    BLOCK_ROWS,
    LANES,
    UNROLL_BLOCKS,
    CounterRng,
    HardwareRng,
    _local_out_rows,
    _qmc_pos,
    _stratified_sample_from_w,
    _stratified_sample_pdf_from_w,
    _table_lookup_loop,
    _uniform_halfopen01,
    _uniform_open01,
    integrate_vmem_fits,
    pad_uniform_table,
    plan_pallas_grid,
    prep_inv_table,
    prep_inv_table_stratified,
    uniform_table_value,
)

__all__ = ["build_integrate_nd_pallas", "nd_pallas_supports", "pick_nd_rows"]

from ..sampling import ANALYTIC_KINDS as _ANALYTIC

_SUPPORTED = tuple(_ANALYTIC) + (DistKind.CUSTOM,)


def nd_pallas_supports(kinds: Sequence[DistKind]) -> bool:
    return all(k in _SUPPORTED for k in kinds)


def _strat_dim(kinds: Sequence[DistKind], method: str) -> int:
    """Index of the one row-stratified custom dimension (-1 if none):
    the first CUSTOM dim under plain MC or antithetic (the antithetic
    mirror stays WITHIN the row's stratum, so stratification survives).
    QMC points must map through the full inverse, so no dim stratifies
    under method='qmc'."""
    if method == "qmc":
        return -1
    for j, kk in enumerate(kinds):
        if kk == DistKind.CUSTOM:
            return j
    return -1


def pick_nd_rows(
    k: int,
    d: int,
    plan_samples: Optional[int] = None,
    n_dev: int = 1,
    seed_batch: int = 1,
    with_stderr: bool = False,
    kinds: Sequence[DistKind] = (),
    table_sizes: Sequence[int] = (),
    method: str = "mc",
    n_weight_tables: int = 0,
    weight_extra: int = 0,
) -> Optional[int]:
    """Largest block row count fitting the VMEM budget with d sample
    blocks in flight per unroll step (the 1-D model charges one; each
    extra dimension adds UNROLL_BLOCKS in-flight blocks plus per-eval
    temporaries).  ``kinds``/``table_sizes`` charge resident custom
    tables: the stratified dim costs 2 (rows, 128) blocks, each
    full-inverse dim 2 flat m-knot tables."""
    rows = BLOCK_ROWS
    extra = (UNROLL_BLOCKS + 2) * max(d - 1, 0) + weight_extra
    sdim = _strat_dim(tuple(kinds), method)
    budget = 16 * 1024 * 1024
    while rows >= 8:
        out_rows = (
            _local_out_rows(plan_samples, rows, n_dev, seed_batch)
            if plan_samples is not None
            else seed_batch
        )
        if with_stderr:
            out_rows = 2 * out_rows + 1
        table_bytes = n_weight_tables * 2 * 16 * LANES * 4
        for j, kk in enumerate(kinds):
            if kk != DistKind.CUSTOM:
                continue
            if j == sdim:
                # (+1 qs block under sampler-mode weights — charged via
                # weight_extra by the caller.)
                table_bytes += 2 * rows * LANES * 4
            else:
                table_bytes += 2 * int(table_sizes[j]) * 4
        if integrate_vmem_fits(
            k, DistKind.UNIFORM, extra_blocks=extra, rows=rows,
            out_rows=out_rows, with_stderr=with_stderr,
            budget_bytes=budget - table_bytes,
        ):
            return rows
        rows //= 2
    return None


def _draw_dim_pair(kind: DistKind, p1, p2, get_u):
    """Antithetic pair for one dimension: ONE uniform draw mapped
    through the monotone transform at ``u`` and its mirror ``1 - u``
    (the NORMAL pair reflects z about the mean — one erf_inv per pair).
    Same transforms as :func:`_draw_dim`."""
    if kind == DistKind.UNIFORM:
        from ..sampling import next_below_f32

        u = get_u(False)

        def aff(uu):
            x = p1 + uu * (p2 - p1)
            return jnp.where(
                x >= p2, next_below_f32(jnp.full_like(x, p2)), x
            )

        return aff(u), aff(1.0 - u)
    if kind == DistKind.NORMAL:
        from ..sampling import normal_from_u01

        z = normal_from_u01(get_u(False))
        return p1 + p2 * z, p1 - p2 * z
    if kind == DistKind.EXPONENTIAL:
        u = get_u(True)
        return (
            -jnp.log(jnp.maximum(u, 1e-7)) / p1,
            -jnp.log(jnp.maximum(1.0 - u, 1e-7)) / p1,
        )
    from ..sampling import ANALYTIC_EXT

    ext = ANALYTIC_EXT.get(kind)
    if ext is not None:
        u = get_u(False)
        return (
            ext.inv_cdf(u, p1, p2).astype(jnp.float32),
            ext.inv_cdf(1.0 - u, p1, p2).astype(jnp.float32),
        )
    raise ValueError(f"nd Pallas kernel does not support {kind}")


def _draw_dim(kind: DistKind, p1, p2, get_u):
    """One full (rows, 128) block for one dimension; ``get_u(open01)``
    supplies the uniforms (PRNG or Sobol).  Transforms are the 1-D
    kernel's (ops/integrate_pallas._sample_subblocks)."""
    if kind == DistKind.UNIFORM:
        from ..sampling import next_below_f32

        u = get_u(False)
        x = p1 + u * (p2 - p1)
        return jnp.where(x >= p2, next_below_f32(jnp.full_like(x, p2)), x)
    if kind == DistKind.NORMAL:
        from ..sampling import normal_from_u01

        return p1 + p2 * normal_from_u01(get_u(False))
    if kind == DistKind.EXPONENTIAL:
        return -jnp.log(jnp.maximum(get_u(True), 1e-7)) / p1
    from ..sampling import ANALYTIC_EXT

    ext = ANALYTIC_EXT.get(kind)
    if ext is not None:
        return ext.inv_cdf(get_u(False), p1, p2).astype(jnp.float32)
    raise ValueError(f"nd Pallas kernel does not support {kind}")


def build_integrate_nd_pallas(
    eval_fns: Sequence[Callable],
    kinds: Sequence[DistKind],
    plan: IntegratePlan,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    interpret: bool = False,
    seed_batch: int = 1,
    method: str = "mc",
    with_stderr: bool = False,
    table_sizes: Sequence[int] = (),
    param_batch: bool = False,
    is_weight_nd=None,
):
    """Build a jitted ``(seed, params[, x_tables]) -> (K,) float32`` nd
    kernel program; ``params`` is the (d, 2) per-dimension family
    parameter array (SMEM-resident, like the 1-D kernel's row), and
    ``x_tables`` — required when any dim is CUSTOM — is the d-tuple of
    uniform-u inverse-CDF tables (analytic dims pass dummies;
    ``table_sizes[j]`` fixes each custom table's knot count at trace
    time).  ``seed_batch=R`` batches R independent sweeps as a grid
    dimension exactly like the 1-D kernel (bit-equal to R single-seed
    calls); ``method="qmc"`` draws in-kernel Sobol dimensions under
    per-(rep, dim) seed-derived rotations, auto-segmenting past one
    2^32-point cycle.  ``param_batch=True`` (analytic dims only): the
    params arg becomes (seed_batch, d, 2) — each batch element runs its
    own per-dimension parameter rows, resident in SMEM as (R*d, 2) and
    indexed per grid rep, so one compiled program serves a whole
    d-dimensional parameter sweep per dispatch (the 1-D kernel's
    serving design).

    ``is_weight_nd``: optional d-tuple of per-dimension ``(p_arg,
    q_arg)`` importance-weight descriptors — the product weight
    ``prod_j p_j(x_j) / q_j(x_j)`` multiplies every integrand (all K
    functions see identical weights, reference lib.rs semantics).
    ``p_arg``: a traced elementwise pdf closure or ``"table"`` (a
    uniform-grid (xs, vals) pair rides as runtime ``weight_tables``
    entries, looked up like the 1-D kernel's).  ``q_arg``: a traced
    closure, or ``"sampler"`` (CUSTOM dims only) — the denominator is
    the dimension's own sampling density, gathered from the stratified
    qs column (the stratified dim) or computed as ``(1/(m-1)) /
    dt[i0]`` from the full-inverse dim's resident slope table; exactly
    the density the draws come from, so irregular (paired-knot VEGAS)
    proposal dims stay fully in-kernel (the 1-D sampler-mode design,
    ops/integrate_pallas.py)."""
    if method not in ("mc", "qmc", "antithetic"):
        raise ValueError(
            f"method must be 'mc', 'qmc' or 'antithetic', got {method!r}"
        )
    anti = method == "antithetic"
    kinds = tuple(kinds)
    d = len(kinds)
    if not nd_pallas_supports(kinds):
        raise ValueError(
            "nd Pallas kernel supports analytic and table families only"
        )
    k = len(eval_fns)
    if k > LANES:
        raise ValueError(f"at most {LANES} fused functions supported")
    from .fast_math import kernelize

    eval_fns = tuple(kernelize(f) for f in eval_fns)

    custom_dims = tuple(
        j for j, kk in enumerate(kinds) if kk == DistKind.CUSTOM
    )
    if param_batch and custom_dims:
        raise ValueError(
            "param_batch supports analytic dimensions only (custom "
            "tables are baked per distribution)"
        )
    p_table_dims = ()
    sampler_dims = ()
    if is_weight_nd is not None:
        is_weight_nd = tuple(
            (
                p if p == "table" else kernelize(p),
                q if q == "sampler" else kernelize(q),
            )
            for p, q in is_weight_nd
        )
        if len(is_weight_nd) != d:
            raise ValueError("is_weight_nd must have one entry per dim")
        if param_batch:
            raise ValueError(
                "param_batch is not supported with importance-sampling "
                "weights (weight closures bake distribution parameters)"
            )
        p_table_dims = tuple(
            j for j, (p, _) in enumerate(is_weight_nd) if p == "table"
        )
        sampler_dims = tuple(
            j for j, (_, q) in enumerate(is_weight_nd) if q == "sampler"
        )
        for j in sampler_dims:
            if kinds[j] != DistKind.CUSTOM:
                raise ValueError(
                    "sampler-mode nd IS weights need CUSTOM dims"
                )
    sdim = _strat_dim(kinds, method)
    table_sizes = tuple(table_sizes) or (0,) * d
    for j in custom_dims:
        if j != sdim and table_sizes[j] % LANES != 0:
            raise ValueError(
                "full-inverse custom dims need lane-multiple tables"
            )

    n_dev = 1 if mesh is None else mesh.size
    # Antithetic blocks carry their mirrors, so the grid plans over half
    # the requested count and the unroll halves to keep in-flight sample
    # VMEM at the plain path's level (1-D kernel's convention).
    grid_samples = (
        -(-plan.actual_samples // 2) if anti else plan.actual_samples
    )
    block_rows = pick_nd_rows(
        k, d, grid_samples, n_dev, seed_batch, with_stderr,
        kinds=kinds, table_sizes=table_sizes, method=method,
        n_weight_tables=len(p_table_dims),
        # p/q/w value blocks per eval, +1 resident qs block when the
        # stratified dim samples in sampler mode.
        weight_extra=(
            (3 + int(sdim in sampler_dims)) if is_weight_nd else 0
        ),
    )
    if block_rows is None:
        raise ValueError(
            "nd fused workload exceeds the kernel VMEM budget; use the "
            "XLA backend"
        )

    programs, loops, actual = plan_pallas_grid(
        grid_samples, block_rows
    )
    programs = -(-programs // n_dev) * n_dev
    unroll = min(
        max(1, UNROLL_BLOCKS // 2) if anti else UNROLL_BLOCKS, loops
    )
    loops = -(-loops // unroll) * unroll
    actual = programs * loops * block_rows * LANES * (2 if anti else 1)
    local_programs = programs // n_dev

    sobol_vs = None
    qmc_seg_bits = None
    if method == "qmc":
        from . import qmc as _qmc

        if d > _qmc.SOBOL_MAX_DIMS:
            raise ValueError(
                f"method='qmc' supports up to {_qmc.SOBOL_MAX_DIMS} "
                f"dimensions, got {d}"
            )
        sobol_vs = [_qmc.sobol_direction_numbers(j) for j in range(d)]
        total_blocks = programs * loops
        if total_blocks >= 1 << 31:
            raise ValueError(
                "QMC block counter exceeds int32; reduce n_samples"
            )
        block_elems = block_rows * LANES
        assert block_elems & (block_elems - 1) == 0
        if actual >= _qmc.QMC_MAX_SAMPLES:
            qmc_seg_bits = max(
                0, (_qmc.QMC_MAX_SAMPLES // block_elems).bit_length() - 1
            )

    rng_factory = CounterRng if interpret else HardwareRng

    def kernel(seed_ref, params_ref, pid_base_ref, *rest):
        rest = list(rest)
        tabs = {}
        for j in custom_dims:
            if j == sdim and j in sampler_dims:
                tabs[j] = (rest.pop(0), rest.pop(0), rest.pop(0))
            else:
                tabs[j] = (rest.pop(0), rest.pop(0))
        p_tabs = {}
        for j in p_table_dims:
            p_tabs[j] = (rest.pop(0), rest.pop(0), rest.pop(0))
        pilot_ref = rest.pop(0) if with_stderr else None
        (out_ref,) = rest
        rep = pl.program_id(0)
        pid = pl.program_id(1)
        if with_stderr:
            pilot_row = pilot_ref[pl.ds(rep if param_batch else 0, 1), :]
            colk = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            pilots = [
                jnp.sum(jnp.where(colk == j, pilot_row, 0.0))
                for j in range(k)
            ]
        if method == "qmc":
            from .qmc import derive_shift, sobol_offset_bits

            seed_w = seed_ref[0, rep]
            shifts = [derive_shift(seed_w, j + 1) for j in range(d)]
            rng = None
            # Split Sobol generation (see qmc.sobol_base_bits): the
            # within-block offset XORs are CONSTANT across the sample
            # loop — hoist one per dimension here, leaving only a
            # scalar base-XOR + one broadcast XOR per (dim, iteration).
            qmc_pos_bits = (block_rows * LANES).bit_length() - 1
            sobol_offs = [
                sobol_offset_bits(
                    _qmc_pos(block_rows), sobol_vs[j], qmc_pos_bits
                )
                for j in range(d)
            ]
        else:
            rng = rng_factory()
            rng.seed(seed_ref[0, rep], pid_base_ref[0, 0] + pid)
        pbase = rep * d if param_batch else 0
        ps = [
            (params_ref[pbase + j, 0], params_ref[pbase + j, 1])
            for j in range(d)
        ]
        rows = block_rows

        def draw_custom(j, get_u):
            """One draw for custom dim j; sampler-mode weight dims
            additionally return the draw's own density q = du/dx —
            from the pre-tiled qs column (stratified dim) or the
            full-inverse slope table ((1/(m-1)) / dt[i0])."""
            want_q = j in sampler_dims
            w = get_u(False)
            if j == sdim:
                if want_q:
                    t, dt, qs = tabs[j]
                    return _stratified_sample_pdf_from_w(t, dt, qs, w)
                t, dt = tabs[j]
                # Row-stratified draw (one lane-gather): the pre-tiled
                # (rows, 128) tables bake each row's stratum.
                return _stratified_sample_from_w(t, dt, w)
            t, dt = tabs[j]
            m = t.shape[0] * LANES
            pos = w * jnp.float32(m - 1)
            i0 = jnp.clip(pos.astype(jnp.int32), 0, m - 2)
            frac = pos - i0.astype(jnp.float32)
            if not want_q:
                return _table_lookup_loop(t, dt, i0, frac, rows)
            x, dt_i0 = _table_lookup_loop(
                t, dt, i0, frac, rows, with_slope=True
            )
            inv_du = jnp.float32(1.0 / (m - 1))
            q = jnp.where(
                dt_i0 > 0, inv_du / jnp.maximum(dt_i0, 1e-38), 0.0
            )
            return x, q

        def draw_custom_pair(j, get_u):
            """Antithetic pair for a custom dim: w and 1-w through the
            same table — WITHIN the row's stratum for the stratified
            dim, so stratification survives the mirroring.  Sampler
            dims return ((x1, q1), (x2, q2))."""
            want_q = j in sampler_dims
            w = get_u(False)
            if j == sdim:
                if want_q:
                    t, dt, qs = tabs[j]
                    return (
                        _stratified_sample_pdf_from_w(t, dt, qs, w),
                        _stratified_sample_pdf_from_w(t, dt, qs, 1.0 - w),
                    )
                t, dt = tabs[j]
                return (
                    _stratified_sample_from_w(t, dt, w),
                    _stratified_sample_from_w(t, dt, 1.0 - w),
                )
            t, dt = tabs[j]
            m = t.shape[0] * LANES

            def look(ww):
                pos = ww * jnp.float32(m - 1)
                i0 = jnp.clip(pos.astype(jnp.int32), 0, m - 2)
                frac = pos - i0.astype(jnp.float32)
                if not want_q:
                    return _table_lookup_loop(t, dt, i0, frac, rows)
                x, dt_i0 = _table_lookup_loop(
                    t, dt, i0, frac, rows, with_slope=True
                )
                inv_du = jnp.float32(1.0 / (m - 1))
                q = jnp.where(
                    dt_i0 > 0, inv_du / jnp.maximum(dt_i0, 1e-38), 0.0
                )
                return x, q

            return look(w), look(1.0 - w)

        def _split_q(j, v):
            """(x, q) for sampler dims, (x, None) otherwise."""
            if j in sampler_dims:
                return v
            return v, None

        def weight(xs, qvals):
            """Product importance weight prod_j p_j(x_j)/q_j(x_j) with
            the 1-D kernel's per-dimension q > 0 guard (a zero-density
            draw carries zero mass, so weight 0 is exact)."""
            if is_weight_nd is None:
                return None
            w = None
            for j in range(d):
                p_arg, q_arg = is_weight_nd[j]
                p_val = (
                    uniform_table_value(xs[j], p_tabs[j], rows, 0.0)
                    if p_arg == "table"
                    else p_arg(xs[j]).astype(jnp.float32)
                )
                q_val = (
                    qvals[j]
                    if q_arg == "sampler"
                    else q_arg(xs[j]).astype(jnp.float32)
                )
                safe_q = jnp.where(q_val > 0, q_val, 1.0)
                r = jnp.where(q_val > 0, p_val / safe_q, 0.0)
                w = r if w is None else w * r
            return w

        def draw_all_pair(blk):
            """Two componentwise-mirrored d-tuples from ONE uniform set
            per dimension (the nd antithetic pair: x' mirrors x through
            every dimension's monotone inverse jointly).  Returns
            ((xs1, q1), (xs2, q2)) with per-dim sampler densities."""
            xs1, xs2, q1, q2 = [], [], [], []
            for j in range(d):
                get_u = (
                    lambda open01, j=j: _uniform_open01(
                        rng, (rows, LANES), blk, j
                    )
                    if open01
                    else _uniform_halfopen01(rng, (rows, LANES), blk, j)
                )
                if kinds[j] == DistKind.CUSTOM:
                    a, b2 = draw_custom_pair(j, get_u)
                    a, qa = _split_q(j, a)
                    b2, qb = _split_q(j, b2)
                else:
                    a, b2 = _draw_dim_pair(kinds[j], *ps[j], get_u)
                    qa = qb = None
                xs1.append(a)
                xs2.append(b2)
                q1.append(qa)
                q2.append(qb)
            return (tuple(xs1), q1), (tuple(xs2), q2)

        def draw_all(blk):
            """d equal-shape sample blocks for global block ``blk``."""
            if method == "qmc":
                from .qmc import (
                    derive_segment_shift,
                    sobol_base_bits,
                    sobol_u01_split,
                )

                b = (pid_base_ref[0, 0] + pid) * jnp.int32(loops) + blk
                if qmc_seg_bits is not None:
                    seg = b >> qmc_seg_bits
                    b = b & ((1 << qmc_seg_bits) - 1)
                    shifts_b = [
                        derive_segment_shift(s, seg) for s in shifts
                    ]
                else:
                    shifts_b = shifts
                # Split generation: scalar per-dimension base XOR for
                # this block + the hoisted offset blocks (bit-identical
                # to sobol_bits of the recombined index — see qmc.py).
                bases = [
                    sobol_base_bits(b, sobol_vs[j], qmc_pos_bits)
                    for j in range(d)
                ]
                xs, qv = [], []
                for j in range(d):
                    get_u = lambda open01, j=j: sobol_u01_split(
                        bases[j], sobol_offs[j], shifts_b[j],
                        open01=open01,
                    )
                    if kinds[j] == DistKind.CUSTOM:
                        x, q = _split_q(j, draw_custom(j, get_u))
                    else:
                        x, q = _draw_dim(kinds[j], *ps[j], get_u), None
                    xs.append(x)
                    qv.append(q)
                return tuple(xs), qv
            xs, qv = [], []
            for j in range(d):
                get_u = (
                    lambda open01, j=j: _uniform_open01(
                        rng, (rows, LANES), blk, j
                    )
                    if open01
                    else _uniform_halfopen01(rng, (rows, LANES), blk, j)
                )
                if kinds[j] == DistKind.CUSTOM:
                    x, q = _split_q(j, draw_custom(j, get_u))
                else:
                    x, q = _draw_dim(kinds[j], *ps[j], get_u), None
                xs.append(x)
                qv.append(q)
            return tuple(xs), qv

        def body(i, carry):
            # Same batch-generate-then-evaluate unroll shape as the 1-D
            # kernel: all d*unroll sample blocks are produced before any
            # integrand runs, handing Mosaic the ILP to overlap sampling
            # with eval math.
            accs = list(carry[:k])
            sqs = list(carry[k:])
            xsets = []
            for u in range(unroll):
                blk = i * jnp.int32(unroll) + jnp.int32(u)
                if anti:
                    xsets.extend(draw_all_pair(blk))
                else:
                    xsets.append(draw_all(blk))
            if anti and with_stderr:
                # Adjacent xsets are mirror pairs; squares accumulate on
                # the PAIR MEAN (the antithetic estimator's iid unit),
                # value adds stay per-member so means are bit-equal to
                # the stderr-off antithetic kernel (1-D convention).
                for (xs1, qv1), (xs2, qv2) in zip(
                    xsets[0::2], xsets[1::2]
                ):
                    w1 = weight(xs1, qv1)
                    w2 = weight(xs2, qv2)
                    for j, f in enumerate(eval_fns):
                        v1 = f(*xs1).astype(jnp.float32)
                        v2 = f(*xs2).astype(jnp.float32)
                        if w1 is not None:
                            v1 = v1 * w1
                            v2 = v2 * w2
                        accs[j] = accs[j] + v1
                        accs[j] = accs[j] + v2
                        dd = 0.5 * (v1 + v2) - pilots[j]
                        sqs[j] = sqs[j] + dd * dd
                return tuple(accs) + tuple(sqs)
            for xs, qv in xsets:
                w = weight(xs, qv)
                for j, f in enumerate(eval_fns):
                    v = f(*xs).astype(jnp.float32)
                    if w is not None:
                        v = v * w
                    accs[j] = accs[j] + v
                    if with_stderr:
                        dd = v - pilots[j]
                        sqs[j] = sqs[j] + dd * dd
            return tuple(accs) + tuple(sqs)

        n_blocks = 2 * k if with_stderr else k
        init = tuple(
            jnp.zeros((block_rows, LANES), jnp.float32)
            for _ in range(n_blocks)
        )
        carry = jax.lax.fori_loop(0, loops // unroll, body, init)

        col = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        row = jnp.zeros((1, LANES), jnp.float32)
        for i, acc in enumerate(carry[:k]):
            row = jnp.where(col == i, jnp.sum(acc), row)
        out_ref[pl.ds(rep * local_programs + pid, 1), :] = row
        if with_stderr:
            rowq = jnp.zeros((1, LANES), jnp.float32)
            for i, sq in enumerate(carry[k:]):
                rowq = jnp.where(col == i, jnp.sum(sq), rowq)
            out_ref[
                pl.ds(
                    seed_batch * local_programs
                    + rep * local_programs
                    + pid,
                    1,
                ),
                :,
            ] = rowq

    smem_seeds = pl.BlockSpec(
        (1, seed_batch), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_scalar = pl.BlockSpec(
        (1, 1), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    smem_params = pl.BlockSpec(
        (seed_batch * d if param_batch else d, 2),
        lambda r, i: (0, 0),
        memory_space=pltpu.SMEM,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_rows = seed_batch * local_programs
    total_out_rows = 2 * out_rows if with_stderr else out_rows

    smem_grid = pl.BlockSpec(
        (1, 4), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    n_custom_refs = 2 * len(custom_dims) + int(
        sdim in sampler_dims and sdim >= 0
    )

    def pallas_sweep(seed, params, pid_base, *extra):
        # extra = prepped table refs per custom dim (3 for a sampler-
        # mode stratified dim), 3 refs per p-side weight table, then
        # the pilot row when with_stderr.
        in_specs = [smem_seeds, smem_params, smem_scalar]
        in_specs += [vmem] * n_custom_refs
        in_specs += [vmem, vmem, smem_grid] * len(p_table_dims)
        if with_stderr:
            in_specs.append(vmem)
        out = pl.pallas_call(
            kernel,
            grid=(seed_batch, local_programs),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (total_out_rows, LANES),
                lambda r, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (total_out_rows, LANES), jnp.float32
            ),
            interpret=interpret,
        )(seed, params, pid_base, *extra)
        if with_stderr:
            return (
                jnp.sum(
                    out[:out_rows, :k].reshape(
                        seed_batch, local_programs, k
                    ),
                    axis=1,
                ),
                jnp.sum(
                    out[out_rows:, :k].reshape(
                        seed_batch, local_programs, k
                    ),
                    axis=1,
                ),
            )
        return jnp.sum(
            out[:, :k].reshape(seed_batch, local_programs, k), axis=1
        )

    def _prep(seed, params):
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, seed_batch)
        pshape = (seed_batch * d, 2) if param_batch else (d, 2)
        params_arr = jnp.asarray(params, jnp.float32).reshape(pshape)
        return seed_arr, params_arr

    def _prep_tables(x_tables, weight_tables=()):
        """Flat tuple of device table refs, kernel-arg order: the
        stratified dim gets (rows, 128) pre-tiled (value, slope[, qs])
        tables, full-inverse dims the (m/128, 128) segment layout +
        forward differences (shared with the MCMC kernel), then 3 refs
        per p-side weight table (pad_uniform_table)."""
        prepped = []
        for j in custom_dims:
            t = jnp.asarray(x_tables[j], jnp.float32)
            if j == sdim:
                prepped.extend(
                    prep_inv_table_stratified(
                        t, block_rows, with_pdf=j in sampler_dims
                    )
                )
            else:
                prepped.extend(prep_inv_table(t))
        wt = list(weight_tables)
        for _ in p_table_dims:
            xs = jnp.asarray(wt.pop(0), jnp.float32)
            vals = jnp.asarray(wt.pop(0), jnp.float32)
            prepped.extend(pad_uniform_table(xs, vals, 0.0))
        return tuple(prepped)

    def _shape_result(sums):
        # Param-batched programs always keep the batch axis, even at R=1
        # (the 1-D kernel's convention).
        return sums[0] if seed_batch == 1 and not param_batch else sums

    def _pilot_weight_nd(xs_list, x_tables, weight_tables):
        """Product IS weight at the pilot grid, OUTSIDE the kernel
        (plain XLA; the pilot is an arbitrary deterministic shift, so
        this need not be bit-equal to the in-kernel weight).  Sampler-
        mode q densities come from the raw x_table slopes via
        searchsorted."""
        if is_weight_nd is None:
            return None
        wt = list(weight_tables)
        w = None
        for j in range(d):
            p_arg, q_arg = is_weight_nd[j]
            x = xs_list[j]
            if p_arg == "table":
                gx = jnp.asarray(wt.pop(0), jnp.float32)
                gv = jnp.asarray(wt.pop(0), jnp.float32)
                inside = jnp.logical_and(x >= gx[0], x <= gx[-1])
                pv = jnp.where(inside, jnp.interp(x, gx, gv), 0.0)
            else:
                pv = p_arg(x).astype(jnp.float32)
            if q_arg == "sampler":
                t = jnp.asarray(x_tables[j], jnp.float32)
                m = t.shape[0]
                i = jnp.clip(
                    jnp.searchsorted(t, x, side="right") - 1, 0, m - 2
                )
                dt = jnp.take(t, i + 1) - jnp.take(t, i)
                qv = jnp.where(
                    dt > 0,
                    jnp.float32(1.0 / (m - 1))
                    / jnp.maximum(dt, 1e-38),
                    0.0,
                )
            else:
                qv = q_arg(x).astype(jnp.float32)
            safe_q = jnp.where(qv > 0, qv, 1.0)
            r = jnp.where(qv > 0, pv / safe_q, 0.0)
            w = r if w is None else w * r
        return w

    def _pilot_row_of(params_arr, x_tables=(), weight_tables=()):
        """(1, 128) pilot row: per-function means over per-dimension
        quantile grids, golden-ratio-offset per dim (deterministic, pure
        function of replicated inputs — devices agree).  Custom dims map
        the grid through their full inverse table (plain XLA lerp — this
        runs outside the kernel)."""
        n_p = 8 * LANES
        base = (
            jnp.arange(n_p, dtype=jnp.float32) + jnp.float32(0.5)
        ) / jnp.float32(n_p)
        xs = []
        for j in range(d):
            u = jnp.mod(base + jnp.float32(j) * jnp.float32(0.3819660113), 1.0)
            u = jnp.clip(u, 1e-7, 1.0 - 1e-7).reshape(8, LANES)
            p1, p2 = params_arr[j, 0], params_arr[j, 1]
            if kinds[j] == DistKind.UNIFORM:
                xs.append(p1 + u * (p2 - p1))
            elif kinds[j] == DistKind.NORMAL:
                from ..sampling import normal_from_u01

                xs.append(p1 + p2 * normal_from_u01(u))
            elif kinds[j] == DistKind.CUSTOM:
                t = jnp.asarray(x_tables[j], jnp.float32)
                m = t.shape[0]
                pos = u * jnp.float32(m - 1)
                i0 = jnp.clip(pos.astype(jnp.int32), 0, m - 2)
                frac = pos - i0.astype(jnp.float32)
                x0 = jnp.take(t, i0)
                xs.append(x0 + frac * (jnp.take(t, i0 + 1) - x0))
            elif kinds[j] == DistKind.EXPONENTIAL:
                xs.append(-jnp.log(u) / p1)
            else:
                from ..sampling import ANALYTIC_EXT

                xs.append(ANALYTIC_EXT[kinds[j]].inv_cdf(u, p1, p2))
        w = _pilot_weight_nd(xs, x_tables, weight_tables)

        def f_val(f):
            v = f(*xs).astype(jnp.float32)
            return v if w is None else v * w

        vals = jnp.stack([jnp.mean(f_val(f)) for f in eval_fns])
        return jnp.zeros((1, LANES), jnp.float32).at[0, :k].set(vals)

    def _pilot_of(params_arr, x_tables=(), weight_tables=()):
        """Pilot block: one shared row, or one row per rep when the
        params are batched (each rep's pilot comes from its own
        parameter rows, as in the 1-D kernel)."""
        if not param_batch:
            return _pilot_row_of(params_arr, x_tables, weight_tables)
        return jnp.concatenate(
            [
                _pilot_row_of(
                    params_arr[r * d : (r + 1) * d], x_tables,
                    weight_tables,
                )
                for r in range(seed_batch)
            ],
            axis=0,
        )

    def _finish_stderr(sums, sqs, pilot):
        n = jnp.float32(actual)
        # Antithetic squares are of pair means: pairs are the iid unit.
        n_units = jnp.float32(actual // 2 if anti else actual)
        mean = sums / n
        dlt = mean - pilot[:, :k]
        var = jnp.maximum(sqs / n_units - dlt * dlt, 0.0)
        se = jnp.sqrt(var / n_units)
        if seed_batch == 1 and not param_batch:
            return mean[0], se[0]
        return mean, se

    if mesh is None:

        @jax.jit
        def run(seed, params, x_tables=(), weight_tables=()):
            seed_arr, params_arr = _prep(seed, params)
            tabs = _prep_tables(x_tables, weight_tables)
            base = jnp.zeros((1, 1), jnp.int32)
            if with_stderr:
                pilot = _pilot_of(params_arr, x_tables, weight_tables)
                sums, sqs = pallas_sweep(
                    seed_arr, params_arr, base, *tabs, pilot
                )
                return _finish_stderr(sums, sqs, pilot)
            sums = pallas_sweep(seed_arr, params_arr, base, *tabs)
            return _shape_result(sums / jnp.float32(actual))

        run.actual_samples = actual
        run.block_rows = block_rows
        return run

    replicated = P()

    def sharded_body(seed_arr, params_arr, tabs, *pilot):
        dev = jax.lax.axis_index(axis_name)
        base = (dev * local_programs).astype(jnp.int32).reshape(1, 1)
        if with_stderr:
            sums, sqs = pallas_sweep(
                seed_arr, params_arr, base, *tabs, *pilot
            )
            return _finish_stderr(
                jax.lax.psum(sums, axis_name),
                jax.lax.psum(sqs, axis_name),
                pilot[0],
            )
        sums = pallas_sweep(seed_arr, params_arr, base, *tabs)
        return _shape_result(
            jax.lax.psum(sums, axis_name) / jnp.float32(actual)
        )

    tabs_rep = (replicated,) * (n_custom_refs + 3 * len(p_table_dims))
    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(replicated, replicated, tabs_rep)
        + ((replicated,) if with_stderr else ()),
        out_specs=(replicated, replicated) if with_stderr else replicated,
        check_vma=False,
    )

    @jax.jit
    def run(seed, params, x_tables=(), weight_tables=()):
        seed_arr, params_arr = _prep(seed, params)
        tabs = _prep_tables(x_tables, weight_tables)
        if with_stderr:
            pilot = _pilot_of(params_arr, x_tables, weight_tables)
            return shard_mapped(seed_arr, params_arr, tabs, pilot)
        return shard_mapped(seed_arr, params_arr, tabs)

    run.actual_samples = actual
    run.block_rows = block_rows
    return run
