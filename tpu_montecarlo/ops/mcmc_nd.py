"""Multi-dimensional independence-sampler Metropolis-Hastings (XLA).

The d-dimensional member of the nd family (ops/integrate_nd.py): one
chain per lane with a d-vector state, proposals drawn independently per
dimension from per-dim proposal distributions, and a target that is
either a PRODUCT of per-dimension distributions or — the genuinely new
capability — an arbitrary user JOINT log-density f(x_1..x_d) (traced
Python or WGSL), which the strictly 1-D reference cannot express at all
(its MCMC binds one target Distribution per program,
src/shader_gen.rs:496-509).

MH semantics are the 1-D builder's, dimension-summed:

  * acceptance  ``log u < logp(x') + logq(x) - logp(x) - logq(x')`` with
    ``logq = sum_j log q_j(x_j)`` (independent proposal dims),
  * distinct streams for per-dim init, per-dim proposals, accepts,
  * burn-in advances but does not accumulate; f(current x) accumulates
    every sampling step; per-chain ``/ n_steps``; unweighted chain mean,
  * closed-form log-pdfs per family, -100-floored tables for CUSTOM.

``with_stderr``: between-chain variance of per-chain means with the
pilot shift + Chan recombination of the 1-D builder.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..sampling import DistKind, log_pdf, sample_block
from .mcmc_xla import _RW_LOG_STEP_MAX, _RW_LOG_STEP_MIN

__all__ = ["build_mcmc_nd_fn"]

_STREAM_INIT = 0
_STREAM_PROPOSAL = 1
_STREAM_ACCEPT = 2


def build_mcmc_nd_fn(
    eval_fns: Sequence[Callable],
    prop_kinds: Sequence[DistKind],
    n_steps: int,
    n_burnin: int,
    total_chains: int,
    targ_kinds: Optional[Sequence[DistKind]] = None,
    target_logpdf_fn: Optional[Callable] = None,
    targ_uniform: Sequence[bool] = (),
    prop_uniform: Sequence[bool] = (),
    prop_exact_inverses: Sequence[bool] = (),
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    with_stderr: bool = False,
    with_diagnostics: bool = False,
    with_state: bool = False,
    use_init_state: bool = False,
    random_walk: bool = False,
    rw_adapt: bool = False,
    with_samples: int = 0,
    hmc_leapfrog: int = 0,
):
    """Build a jitted d-dimensional MH program.

    ``with_samples=m``: additionally returns an (m, d, total_chains)
    float32 buffer of thinned post-burn-in draws (every ``n_steps // m``
    sampling steps; the 1-D builder's convention, ops/mcmc_xla.py) —
    stateless only, sharded over the chain axis on a mesh.

    Returned signature::

        (seed,
         prop_params_t, targ_params_t,      # d-tuples ((), for fn targets)
         prop_x_t, prop_cdf_t,              # proposal sampling tables
         targ_lx_t, targ_lp_t,              # target log-pdf tables
         prop_lx_t, prop_lp_t)              # proposal log-pdf tables
        -> ((K,) estimates, () acceptance_rate [, (K,) stderr]
            [, (K,) r_hat, (K,) ess])

    ``with_state=True`` appends trailing args ``(x0, logp0, segment)`` —
    ``x0`` a (d, total_chains) position matrix, ``logp0`` the cached
    target log-density, ``segment`` an int32 counter folded into the RNG
    key so continuations draw fresh streams (segment 0 skips the fold:
    a fresh stateful run reproduces the stateless estimates exactly, the
    1-D builder's convention) — and the program additionally returns
    ``(x_final, logp_final)``.  ``use_init_state=True`` consumes the
    incoming state instead of drawing initial positions; ``logq`` at the
    resume point is recomputed from x (a deterministic function).

    ``random_walk=True`` (see distributions.RandomWalk): the proposal
    becomes ``x'_j = x_j + step_j * z_j`` with ``z ~ N(0, I)`` and the
    symmetric density cancels from the acceptance ratio.
    ``prop_params_t`` is then a d-tuple of (4,) rows ``(step_j,
    init_lo_j, init_hi_j, target_accept)``; ``prop_kinds`` and the
    proposal-side tables are ignored (pass dummies), and fresh chains
    initialise uniformly over the per-dimension init ranges.
    ``rw_adapt=True``: each chain Robbins-Monro-tunes ONE log-scale
    multiplying its whole step vector toward ``target_accept`` during
    burn-in (``gamma_i = i^-0.6``; per-dimension relative scales are
    preserved), frozen for the sampling phase.

    ``hmc_leapfrog=L`` (with ``random_walk=True``; distributions.HMC):
    the proposal becomes an L-step leapfrog trajectory through
    ``H(x, p) = -log p(x) + |p|^2 / 2`` with fresh per-chain d-vector
    momenta each iteration and the exact energy correction in the
    acceptance.  Per-dimension steps act as a diagonal mass matrix
    (dimension j drifts with ``eps_j = scale * step_j``).  The position
    gradient is JAX autodiff of the summed target log-density — closed
    forms for analytic product targets, interpolant slopes for table
    dims, the traced expression's gradient for joint fn targets.
    """
    if (targ_kinds is None) == (target_logpdf_fn is None):
        raise ValueError(
            "exactly one of targ_kinds (product target) or "
            "target_logpdf_fn (joint target) must be given"
        )
    if use_init_state and not with_state:
        raise ValueError("use_init_state requires with_state=True")
    if with_state and (with_stderr or with_diagnostics):
        raise ValueError(
            "with_state applies to plain estimate runs only"
        )
    prop_kinds = tuple(prop_kinds)
    d = len(prop_kinds)
    exact_inverses = tuple(prop_exact_inverses) or (False,) * d
    prop_uniform = tuple(prop_uniform) or (False,) * d
    targ_uniform = tuple(targ_uniform) or (False,) * d
    k = len(eval_fns)
    vfns = [jax.vmap(f) for f in eval_fns]
    n_dev = 1 if mesh is None else mesh.size
    if total_chains % n_dev != 0:
        raise ValueError("total_chains must divide evenly over devices")
    local_chains = total_chains // n_dev
    n_iters = n_burnin + n_steps
    if with_diagnostics and n_steps < 4:
        raise ValueError("with_diagnostics needs n_steps >= 4")
    if with_samples:
        if with_state:
            raise ValueError(
                "with_samples applies to stateless MCMC programs only"
            )
        if not 1 <= int(with_samples) <= n_steps:
            raise ValueError(
                f"with_samples must be in [1, n_steps={n_steps}], got "
                f"{with_samples}"
            )
    sample_stride = n_steps // with_samples if with_samples else 0
    if target_logpdf_fn is not None:
        v_target = jax.vmap(target_logpdf_fn)

    def _chain_sweep(
        seed, prop_params_t, targ_params_t, prop_x_t, prop_cdf_t,
        targ_lx_t, targ_lp_t, prop_lx_t, prop_lp_t, device_idx,
        init_xs=None, init_logp=None, segment=None,
    ):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), device_idx)
        if segment is not None:
            # Fresh streams per resume segment; segment 0 skips the fold
            # (ops/mcmc_xla.py's convention).
            key = jnp.where(
                segment == 0, key, jax.random.fold_in(key, segment)
            )
        key_init = jax.random.fold_in(key, _STREAM_INIT)
        key_prop = jax.random.fold_in(key, _STREAM_PROPOSAL)
        key_acc = jax.random.fold_in(key, _STREAM_ACCEPT)

        def target_log(xs):
            if target_logpdf_fn is not None:
                return v_target(*xs).astype(jnp.float32)
            tot = None
            for j in range(d):
                lp = log_pdf(
                    targ_kinds[j], targ_params_t[j], xs[j],
                    targ_lx_t[j], targ_lp_t[j], uniform=targ_uniform[j],
                )
                tot = lp if tot is None else tot + lp
            return tot

        def proposal_log(xs):
            tot = None
            for j in range(d):
                lq = log_pdf(
                    prop_kinds[j], prop_params_t[j], xs[j],
                    prop_lx_t[j], prop_lp_t[j], uniform=prop_uniform[j],
                )
                tot = lq if tot is None else tot + lq
            return tot

        def draw_proposals(base_key):
            return tuple(
                sample_block(
                    jax.random.fold_in(base_key, j),
                    (local_chains,),
                    prop_kinds[j],
                    prop_params_t[j],
                    prop_x_t[j],
                    prop_cdf_t[j],
                    exact_inverse=exact_inverses[j],
                )
                for j in range(d)
            )

        if random_walk:
            # Per-dimension (step, init_lo, init_hi, target_accept) rows.
            rw_steps = [prop_params_t[j][0] for j in range(d)]
            rw_los = [prop_params_t[j][1] for j in range(d)]
            rw_his = [prop_params_t[j][2] for j in range(d)]
            rw_target = prop_params_t[0][3]

        if init_xs is not None:
            x0 = init_xs
            logp0 = init_logp
        elif random_walk:
            # Overdispersed per-dimension uniform init (there is no
            # proposal distribution to draw a start from).
            x0 = tuple(
                rw_los[j]
                + (rw_his[j] - rw_los[j])
                * jax.random.uniform(
                    jax.random.fold_in(key_init, j),
                    (local_chains,),
                    jnp.float32,
                )
                for j in range(d)
            )
            logp0 = target_log(x0)
        else:
            x0 = draw_proposals(key_init)
            logp0 = target_log(x0)
        # The carried third slot: the chain's own summed proposal
        # log-density for the independence sampler, the per-chain
        # log-scale multiplying the step vector for the random walk
        # (adapted during burn-in only; relative per-dim scales fixed).
        if random_walk:
            logq0 = jnp.zeros((local_chains,), jnp.float32)
        else:
            logq0 = proposal_log(x0)

        shift_needed = with_stderr or with_diagnostics
        if shift_needed:
            pilot = jnp.stack(
                [jnp.mean(vf(*x0).astype(jnp.float32)) for vf in vfns]
            )

        n1 = n_steps // 2  # split-half length (odd last step excluded)

        def step(carry, i):
            if with_samples:
                carry, buf = carry[:-1], carry[-1]
            if with_diagnostics:
                xs, logp, logq, acc, n_accept, halves = carry
            else:
                xs, logp, logq, acc, n_accept = carry
            key_i = jax.random.fold_in(key_prop, i)
            if random_walk:
                scale = jnp.exp(logq) if rw_adapt else jnp.float32(1.0)
                z = tuple(
                    jax.random.normal(
                        jax.random.fold_in(key_i, j),
                        (local_chains,),
                        jnp.float32,
                    )
                    for j in range(d)
                )
                if hmc_leapfrog:
                    # L kick-drift-kick leapfrog steps carrying the
                    # gradient tuple (one grad eval per step); the
                    # per-dimension steps are a diagonal mass matrix.
                    grad_logp = jax.grad(
                        lambda xv: jnp.sum(target_log(xv))
                    )
                    eps = tuple(scale * rw_steps[j] for j in range(d))

                    def leap(_, c):
                        xq, p, g = c
                        p = tuple(
                            p[j] + 0.5 * eps[j] * g[j] for j in range(d)
                        )
                        xq = tuple(
                            xq[j] + eps[j] * p[j] for j in range(d)
                        )
                        g = grad_logp(xq)
                        p = tuple(
                            p[j] + 0.5 * eps[j] * g[j] for j in range(d)
                        )
                        return xq, p, g

                    xp, pf, _ = jax.lax.fori_loop(
                        0, hmc_leapfrog, leap, (xs, z, grad_logp(xs))
                    )
                    logp_prop = target_log(xp)
                    kin0 = sum(p_j * p_j for p_j in z)
                    kinf = sum(p_j * p_j for p_j in pf)
                    log_alpha = (logp_prop - 0.5 * kinf) - (
                        logp - 0.5 * kin0
                    )
                    # Diverged trajectories (inf - inf) reject rather
                    # than NaN-poison the step adaptation.
                    log_alpha = jnp.where(
                        jnp.isnan(log_alpha), -jnp.inf, log_alpha
                    )
                else:
                    xp = tuple(
                        x_j + scale * rw_steps[j] * z[j]
                        for j, x_j in enumerate(xs)
                    )
                    logp_prop = target_log(xp)
                    # Symmetric proposal: the q terms cancel.
                    log_alpha = logp_prop - logp
            else:
                xp = draw_proposals(key_i)
                logp_prop = target_log(xp)
                logq_prop = proposal_log(xp)
                log_alpha = logp_prop + logq - logp - logq_prop
            u = jax.random.uniform(
                jax.random.fold_in(key_acc, i), (local_chains,), jnp.float32
            )
            accept = jnp.log(jnp.maximum(u, 1e-38)) < log_alpha
            xs = tuple(
                jnp.where(accept, xp_j, x_j) for xp_j, x_j in zip(xp, xs)
            )
            logp = jnp.where(accept, logp_prop, logp)
            if random_walk:
                if rw_adapt:
                    # Robbins-Monro on the per-chain log-scale, burn-in
                    # only (the 1-D builder's update, ops/mcmc_xla.py):
                    # driven by the step's acceptance PROBABILITY.
                    alpha_p = jnp.exp(jnp.minimum(log_alpha, 0.0))
                    gamma = jnp.exp(
                        jnp.float32(-0.6)
                        * jnp.log((i + 1).astype(jnp.float32))
                    )
                    logq = jnp.where(
                        i < n_burnin,
                        jnp.clip(
                            logq + gamma * (alpha_p - rw_target),
                            _RW_LOG_STEP_MIN,
                            _RW_LOG_STEP_MAX,
                        ),
                        logq,
                    )
            else:
                logq = jnp.where(accept, logq_prop, logq)

            collect = i >= n_burnin
            ys = jnp.stack([vf(*xs) for vf in vfns]).astype(jnp.float32)
            if shift_needed:
                sv = ys - pilot[:, None]
            vals = sv if with_stderr else ys
            acc = acc + jnp.where(collect, vals, 0.0)
            n_accept = n_accept + jnp.where(
                collect, jnp.sum(accept.astype(jnp.float32)), 0.0
            )
            if with_samples:
                # Thinned draw: the post-step d-vector state at sampling
                # steps n_burnin + j*stride (1-D builder's convention).
                j = (i - jnp.int32(n_burnin)) // jnp.int32(sample_stride)
                on_grid = (
                    i - jnp.int32(n_burnin)
                ) % jnp.int32(sample_stride) == 0
                hit = jnp.logical_and(
                    i >= n_burnin,
                    jnp.logical_and(on_grid, j < with_samples),
                )
                pos = jnp.clip(j, 0, with_samples - 1)
                cur = jax.lax.dynamic_index_in_dim(
                    buf, pos, 0, keepdims=False
                )
                buf = jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(hit, jnp.stack(xs), cur), pos, 0
                )
            samp = (buf,) if with_samples else ()
            if with_diagnostics:
                # Split-half accumulators (1-D builder's layout,
                # ops/mcmc_xla.py): first/second half of the sampling
                # phase, pilot-shifted sums and squares.
                acc1, sq1, acc2, sq2 = halves
                h1 = jnp.logical_and(i >= n_burnin, i < n_burnin + n1)
                h2 = jnp.logical_and(
                    i >= n_burnin + n1, i < n_burnin + 2 * n1
                )
                acc1 = acc1 + jnp.where(h1, sv, 0.0)
                sq1 = sq1 + jnp.where(h1, sv * sv, 0.0)
                acc2 = acc2 + jnp.where(h2, sv, 0.0)
                sq2 = sq2 + jnp.where(h2, sv * sv, 0.0)
                return (
                    xs, logp, logq, acc, n_accept,
                    (acc1, sq1, acc2, sq2),
                ) + samp, None
            return (xs, logp, logq, acc, n_accept) + samp, None

        zk = lambda: jnp.zeros((k, local_chains), jnp.float32)  # noqa: E731
        init = (x0, logp0, logq0, zk(), jnp.float32(0.0))
        if with_diagnostics:
            init = init + ((zk(), zk(), zk(), zk()),)
        if with_samples:
            init = init + (
                jnp.zeros((with_samples, d, local_chains), jnp.float32),
            )
        carry, _ = jax.lax.scan(
            step, init, jnp.arange(n_iters, dtype=jnp.int32)
        )
        samples_buf = ()
        if with_samples:
            carry, samples_buf = carry[:-1], (carry[-1],)
        if with_diagnostics:
            _, _, _, acc, n_accept, halves = carry
        else:
            xs_f, logp_f, _, acc, n_accept = carry

        diag = ()
        if with_diagnostics:
            # Per-sequence (= half-chain) means and within-sequence
            # variances, reduced to Chan-recombinant local statistics
            # exactly as the 1-D builder.
            acc1, sq1, acc2, sq2 = halves
            n1f = jnp.float32(max(n1, 1))
            mh = [acc1 / n1f, acc2 / n1f]
            within = [
                (sq - n1f * m * m) / jnp.float32(max(n1 - 1, 1))
                for sq, m in zip((sq1, sq2), mh)
            ]
            w_sum = jnp.sum(within[0] + within[1], axis=1)
            seq = jnp.concatenate(mh, axis=1)
            mb_d = jnp.mean(seq, axis=1)
            ss_d = jnp.sum((seq - mb_d[:, None]) ** 2, axis=1)
            diag = ((w_sum, mb_d + pilot, ss_d),)

        chain_means = acc / jnp.float32(n_steps)
        if with_stderr:
            mb_s = jnp.mean(chain_means, axis=1)
            ss = jnp.sum((chain_means - mb_s[:, None]) ** 2, axis=1)
            sums = (
                jnp.sum(chain_means, axis=1)
                + jnp.float32(local_chains) * pilot
            )
            return (sums, n_accept, ss, mb_s + pilot) + diag + samples_buf
        out = (jnp.sum(chain_means, axis=1), n_accept) + diag + samples_buf
        if with_state:
            out = out + (jnp.stack(xs_f), logp_f)
        return out

    denom_vals = jnp.float32(total_chains)
    denom_acc = jnp.float32(total_chains) * jnp.float32(max(n_steps, 1))

    def _stderr_of(ss_total):
        var = ss_total / jnp.maximum(denom_vals - 1.0, 1.0)
        return jnp.sqrt(var / denom_vals)

    m_total = jnp.float32(2 * total_chains)  # split-half sequence count

    def _rhat_of(w_tot, ss_tot):
        from .mcmc_xla import split_rhat_ess

        return split_rhat_ess(w_tot, ss_tot, m_total, n_steps // 2)

    if mesh is None:
        if with_state:

            @jax.jit
            def run(seed, *args):
                tables = args[:-3]
                x0, logp0, segment = args[-3:]
                init_xs = None
                if use_init_state:
                    x0a = jnp.asarray(x0, jnp.float32)
                    init_xs = tuple(x0a[j] for j in range(d))
                out = _chain_sweep(
                    seed, *tables, jnp.int32(0),
                    init_xs=init_xs,
                    init_logp=(
                        jnp.asarray(logp0, jnp.float32)
                        if use_init_state else None
                    ),
                    segment=jnp.asarray(segment, jnp.int32),
                )
                sums, n_accept, x_f, logp_f = out
                return (
                    sums / denom_vals, n_accept / denom_acc, x_f, logp_f
                )

            return run

        @jax.jit
        def run(seed, *args):
            out = _chain_sweep(seed, *args, jnp.int32(0))
            res = (out[0] / denom_vals, out[1] / denom_acc)
            pos = 4 if with_stderr else 2
            if with_stderr:
                res = res + (_stderr_of(out[2]),)
            if with_diagnostics:
                w_sum, _, ss_d = out[pos]
                pos += 1
                res = res + _rhat_of(w_sum, ss_d)  # (r_hat, ess)
            if with_samples:
                res = res + (out[pos],)  # (m, d, total_chains) draws
            return res

        return run

    replicated = P()
    dim_rep = (replicated,) * d

    def sharded_body(seed, *args):
        dev = jax.lax.axis_index(axis_name)
        if with_state:
            tables = args[:-3]
            x0, logp0, segment = args[-3:]
            init_xs = None
            if use_init_state:
                x0a = jnp.asarray(x0, jnp.float32)
                init_xs = tuple(x0a[j] for j in range(d))
            out = _chain_sweep(
                seed, *tables, dev,
                init_xs=init_xs,
                init_logp=(
                    jnp.asarray(logp0, jnp.float32)
                    if use_init_state else None
                ),
                segment=jnp.asarray(segment, jnp.int32).reshape(()),
            )
        else:
            out = _chain_sweep(seed, *args, dev)
        sums = jax.lax.psum(out[0], axis_name)
        n_accept = jax.lax.psum(out[1], axis_name)
        res = (sums / denom_vals, n_accept / denom_acc)
        if with_stderr:
            ss, mb = out[2], out[3]
            m_global = sums / denom_vals
            corr = jnp.float32(local_chains) * (mb - m_global) ** 2
            ss_total = jax.lax.psum(ss + corr, axis_name)
            res = res + (_stderr_of(ss_total),)
        pos = 4 if with_stderr else 2
        if with_diagnostics:
            # Chan recombination over the 2x split-half sequences
            # (1-D builder's pattern).
            w_sum, mb_d, ss_d = out[pos]
            pos += 1
            n_loc = jnp.float32(2 * local_chains)
            m_seq = jax.lax.psum(n_loc * mb_d, axis_name) / m_total
            ss_tot = jax.lax.psum(
                ss_d + n_loc * (mb_d - m_seq) ** 2, axis_name
            )
            w_tot = jax.lax.psum(w_sum, axis_name)
            res = res + _rhat_of(w_tot, ss_tot)
        if with_samples:
            res = res + (out[pos],)  # (m, d, local) -> sharded chains
        if with_state:
            res = res + (out[2], out[3])  # (d, local) xs, (local,) logp
        return res

    td = len(targ_kinds) if targ_kinds is not None else 0
    targ_rep = (replicated,) * td
    in_specs = (
        replicated,  # seed
        dim_rep, targ_rep,  # params
        dim_rep, dim_rep,  # proposal sampling tables
        targ_rep, targ_rep,  # target log tables
        dim_rep, dim_rep,  # proposal log tables
    )
    out_specs = (replicated, replicated)
    if with_stderr:
        out_specs = out_specs + (replicated,)
    if with_diagnostics:
        out_specs = out_specs + (replicated, replicated)
    if with_samples:
        # (m, d, total_chains): thinned draws sharded over chains.
        out_specs = out_specs + (P(None, None, axis_name),)
    if with_state:
        # Chain state shards over the chain axis (x is (d, chains)).
        in_specs = in_specs + (
            P(None, axis_name), P(axis_name), replicated,
        )
        out_specs = out_specs + (P(None, axis_name), P(axis_name))

    shard_mapped = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def run(seed, *args):
        return shard_mapped(seed, *args)

    return run
