"""Multi-dimensional fused Monte Carlo integration kernel (Pallas/Mosaic).

The kernel-speed tier of the nd family (ops/integrate_nd.py is the
portable XLA sweep): per fori_loop iteration the kernel draws d
(rows, 128) sample blocks — one per dimension, from the hardware PRNG
(tagged per-dim counter streams in the interpreter tier) or from
in-kernel Sobol dimensions (ops/qmc.py, pure uint32 lane math) — and
evaluates all K d-ary integrands on the shared tuple, accumulating into
K VMEM blocks with the same disjoint-output/grid/seed-batch design as
the 1-D kernel (ops/integrate_pallas.py).

Analytic per-dimension families only (uniform / normal / exponential):
table-sampled dimensions route to the XLA sweep, which handles any mix.
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
    _uniform_halfopen01,
    _uniform_open01,
    integrate_vmem_fits,
    plan_pallas_grid,
)

__all__ = ["build_integrate_nd_pallas", "nd_pallas_supports", "pick_nd_rows"]

_ANALYTIC = (DistKind.UNIFORM, DistKind.NORMAL, DistKind.EXPONENTIAL)


def nd_pallas_supports(kinds: Sequence[DistKind]) -> bool:
    return all(k in _ANALYTIC for k in kinds)


def pick_nd_rows(
    k: int,
    d: int,
    plan_samples: Optional[int] = None,
    n_dev: int = 1,
    seed_batch: int = 1,
    with_stderr: bool = False,
) -> Optional[int]:
    """Largest block row count fitting the VMEM budget with d sample
    blocks in flight per unroll step (the 1-D model charges one; each
    extra dimension adds UNROLL_BLOCKS in-flight blocks plus per-eval
    temporaries)."""
    rows = BLOCK_ROWS
    extra = (UNROLL_BLOCKS + 2) * max(d - 1, 0)
    while rows >= 8:
        out_rows = (
            _local_out_rows(plan_samples, rows, n_dev, seed_batch)
            if plan_samples is not None
            else seed_batch
        )
        if with_stderr:
            out_rows = 2 * out_rows + 1
        if integrate_vmem_fits(
            k, DistKind.UNIFORM, extra_blocks=extra, rows=rows,
            out_rows=out_rows, with_stderr=with_stderr,
        ):
            return rows
        rows //= 2
    return None


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
):
    """Build a jitted ``(seed, params) -> (K,) float32`` nd kernel
    program; ``params`` is the (d, 2) per-dimension family parameter
    array (SMEM-resident, like the 1-D kernel's row).  ``seed_batch=R``
    batches R independent sweeps as a grid dimension exactly like the
    1-D kernel (bit-equal to R single-seed calls); ``method="qmc"``
    draws in-kernel Sobol dimensions under per-(rep, dim) seed-derived
    rotations, auto-segmenting past one 2^32-point cycle."""
    if method not in ("mc", "qmc"):
        raise ValueError(f"method must be 'mc' or 'qmc', got {method!r}")
    kinds = tuple(kinds)
    d = len(kinds)
    if not nd_pallas_supports(kinds):
        raise ValueError(
            "nd Pallas kernel supports analytic families only; table "
            "dimensions take the XLA sweep"
        )
    k = len(eval_fns)
    if k > LANES:
        raise ValueError(f"at most {LANES} fused functions supported")
    from .fast_math import kernelize

    eval_fns = tuple(kernelize(f) for f in eval_fns)

    n_dev = 1 if mesh is None else mesh.size
    block_rows = pick_nd_rows(
        k, d, plan.actual_samples, n_dev, seed_batch, with_stderr
    )
    if block_rows is None:
        raise ValueError(
            "nd fused workload exceeds the kernel VMEM budget; use the "
            "XLA backend"
        )

    programs, loops, actual = plan_pallas_grid(
        plan.actual_samples, block_rows
    )
    programs = -(-programs // n_dev) * n_dev
    unroll = min(UNROLL_BLOCKS, loops)
    loops = -(-loops // unroll) * unroll
    actual = programs * loops * block_rows * LANES
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
        pilot_ref = rest.pop(0) if with_stderr else None
        (out_ref,) = rest
        rep = pl.program_id(0)
        pid = pl.program_id(1)
        if with_stderr:
            pilot_row = pilot_ref[pl.ds(0, 1), :]
            colk = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            pilots = [
                jnp.sum(jnp.where(colk == j, pilot_row, 0.0))
                for j in range(k)
            ]
        if method == "qmc":
            from .qmc import derive_shift

            seed_w = seed_ref[0, rep]
            shifts = [derive_shift(seed_w, j + 1) for j in range(d)]
            rng = None
        else:
            rng = rng_factory()
            rng.seed(seed_ref[0, rep], pid_base_ref[0, 0] + pid)
        ps = [(params_ref[j, 0], params_ref[j, 1]) for j in range(d)]
        rows = block_rows

        def draw_all(blk):
            """d equal-shape sample blocks for global block ``blk``."""
            if method == "qmc":
                from .qmc import (
                    derive_segment_shift,
                    sobol_u01_halfopen,
                    sobol_u01_open,
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
                g = (
                    b * jnp.int32(rows * LANES) + _qmc_pos(rows)
                ).astype(jnp.uint32)
                xs = []
                for j in range(d):
                    get_u = (
                        lambda open01, j=j: sobol_u01_open(
                            g, shifts_b[j], sobol_vs[j]
                        )
                        if open01
                        else sobol_u01_halfopen(g, shifts_b[j], sobol_vs[j])
                    )
                    xs.append(_draw_dim(kinds[j], *ps[j], get_u))
                return tuple(xs)
            xs = []
            for j in range(d):
                get_u = (
                    lambda open01, j=j: _uniform_open01(
                        rng, (rows, LANES), blk, j
                    )
                    if open01
                    else _uniform_halfopen01(rng, (rows, LANES), blk, j)
                )
                xs.append(_draw_dim(kinds[j], *ps[j], get_u))
            return tuple(xs)

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
                xsets.append(draw_all(blk))
            for xs in xsets:
                for j, f in enumerate(eval_fns):
                    v = f(*xs).astype(jnp.float32)
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
        (d, 2), lambda r, i: (0, 0), memory_space=pltpu.SMEM
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_rows = seed_batch * local_programs
    total_out_rows = 2 * out_rows if with_stderr else out_rows

    def pallas_sweep(seed, params, pid_base, *pilot):
        in_specs = [smem_seeds, smem_params, smem_scalar]
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
        )(seed, params, pid_base, *pilot)
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
        params_arr = jnp.asarray(params, jnp.float32).reshape(d, 2)
        return seed_arr, params_arr

    def _shape_result(sums):
        return sums[0] if seed_batch == 1 else sums

    def _pilot_of(params_arr):
        """(1, 128) pilot row: per-function means over per-dimension
        quantile grids, golden-ratio-offset per dim (deterministic, pure
        function of replicated inputs — devices agree)."""
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
            else:
                xs.append(-jnp.log(u) / p1)
        vals = jnp.stack(
            [jnp.mean(f(*xs).astype(jnp.float32)) for f in eval_fns]
        )
        return jnp.zeros((1, LANES), jnp.float32).at[0, :k].set(vals)

    def _finish_stderr(sums, sqs, pilot):
        n = jnp.float32(actual)
        mean = sums / n
        dlt = mean - pilot[:, :k]
        var = jnp.maximum(sqs / n - dlt * dlt, 0.0)
        se = jnp.sqrt(var / n)
        if seed_batch == 1:
            return mean[0], se[0]
        return mean, se

    if mesh is None:

        @jax.jit
        def run(seed, params):
            seed_arr, params_arr = _prep(seed, params)
            base = jnp.zeros((1, 1), jnp.int32)
            if with_stderr:
                pilot = _pilot_of(params_arr)
                sums, sqs = pallas_sweep(seed_arr, params_arr, base, pilot)
                return _finish_stderr(sums, sqs, pilot)
            sums = pallas_sweep(seed_arr, params_arr, base)
            return _shape_result(sums / jnp.float32(actual))

        run.actual_samples = actual
        run.block_rows = block_rows
        return run

    replicated = P()

    def sharded_body(seed_arr, params_arr, *pilot):
        dev = jax.lax.axis_index(axis_name)
        base = (dev * local_programs).astype(jnp.int32).reshape(1, 1)
        if with_stderr:
            sums, sqs = pallas_sweep(seed_arr, params_arr, base, *pilot)
            return _finish_stderr(
                jax.lax.psum(sums, axis_name),
                jax.lax.psum(sqs, axis_name),
                pilot[0],
            )
        sums = pallas_sweep(seed_arr, params_arr, base)
        return _shape_result(
            jax.lax.psum(sums, axis_name) / jnp.float32(actual)
        )

    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(replicated, replicated)
        + ((replicated,) if with_stderr else ()),
        out_specs=(replicated, replicated) if with_stderr else replicated,
        check_vma=False,
    )

    @jax.jit
    def run(seed, params):
        seed_arr, params_arr = _prep(seed, params)
        if with_stderr:
            pilot = _pilot_of(params_arr)
            return shard_mapped(seed_arr, params_arr, pilot)
        return shard_mapped(seed_arr, params_arr)

    run.actual_samples = actual
    run.block_rows = block_rows
    return run
