"""Parallel tempering (replica exchange) MCMC — XLA.

A capability beyond both the reference (whose MCMC is a 1-D
independence sampler, src/shader_gen.rs:466-539) and plain local
samplers: T replicas of every chain run against the tempered targets
``pi_t(x) ∝ pi(x)^beta_t`` (``beta_t = 1 / temperature_t``, rung 0 at
temperature 1 = the true target), and adjacent rungs periodically
propose to EXCHANGE states.  Hot rungs flatten the target's barriers
and diffuse freely between modes; exchanges percolate those global
moves down to the cold rung, so the beta=1 chains mix across modes that
would trap a plain random walk or HMC forever.  Estimates come from the
cold rung only.

Design (TPU-first): the whole ladder is ONE flat ensemble of
``T * chains`` lanes — rung t owns the contiguous block
``[t*chains, (t+1)*chains)`` and every within-rung MH update is the
ordinary vectorised update with ``log_alpha`` scaled by the per-lane
``beta``.  A swap step is a lane PERMUTATION gather: replica exchange
only ever pairs rung t with rung t+1 *within the same chain column*, so
the partner index is a static permutation, the pair's shared uniform is
a ``take`` at the pair's lower index, and the accepted swap is an
elementwise select — no scatter, no cross-chain traffic, and on a mesh
no cross-device traffic at all (chains shard over devices, the full
ladder of any one chain lives on one device).

Swap acceptance for the pair (t, u = t +- 1):

    log v < (beta_t - beta_u) * (log pi(x_u) - log pi(x_t))

which is symmetric in (t, u), so both lanes of a pair compute the same
decision from the same shared uniform.  Pairings alternate between
(0,1),(2,3),... and (1,2),(3,4),... on successive swap steps (the
classic even/odd scheme: every adjacent pair is attempted every other
swap).  The per-chain step scale adapted during burn-in stays with the
RUNG (a temperature property), not the exchanged state.

MH semantics within a rung are ops/mcmc_nd.py's random-walk / HMC
updates (symmetric proposal, tempered acceptance ``beta * (logp' -
logp)``; HMC integrates the tempered Hamiltonian ``-beta log pi +
|p|^2/2``, so hot rungs feel weaker gradients and roam).  Burn-in
advances but does not accumulate; f(cold-rung x) accumulates every
sampling step; per-chain ``/ n_steps``; unweighted chain mean.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..sampling import log_pdf, sample_block
from .mcmc_xla import _RW_LOG_STEP_MAX, _RW_LOG_STEP_MIN

__all__ = ["build_pt_mcmc_fn"]

_STREAM_INIT = 0
_STREAM_PROPOSAL = 1
_STREAM_ACCEPT = 2
_STREAM_SWAP = 3


def _swap_perms(n_temps: int, local_chains: int):
    """Static flat-lane partner permutations for the even and odd
    pairings, plus each parity's attempted-pair count (per chain
    column).  Lane ``t * L + c`` pairs with ``partner(t) * L + c``;
    an unpaired boundary rung partners with itself (a no-op swap)."""
    perms = []
    counts = []
    for parity in (0, 1):
        partner = np.arange(n_temps)
        t = parity
        while t + 1 < n_temps:
            partner[t], partner[t + 1] = t + 1, t
            t += 2
        flat = (
            partner[:, None] * local_chains + np.arange(local_chains)
        ).reshape(-1)
        perms.append(jnp.asarray(flat, jnp.int32))
        counts.append(int(np.sum(partner != np.arange(n_temps)) // 2))
    return perms[0], perms[1], counts[0], counts[1]


def build_pt_mcmc_fn(
    eval_fns: Sequence[Callable],
    d: int,
    betas: Sequence[float],
    n_steps: int,
    n_burnin: int,
    total_chains: int,
    targ_kinds=None,
    target_logpdf_fn: Optional[Callable] = None,
    targ_uniform: Sequence[bool] = (),
    mesh: Optional[jax.sharding.Mesh] = None,
    axis_name: str = "mc",
    with_stderr: bool = False,
    with_diagnostics: bool = False,
    rw_adapt: bool = False,
    hmc_leapfrog: int = 0,
    swap_every: int = 1,
    with_samples: int = 0,
    prop_kinds=None,
    prop_uniform: Sequence[bool] = (),
    prop_exact_inverses: Sequence[bool] = (),
):
    """Build a jitted parallel-tempering MH program.

    ``total_chains`` counts the COLD-RUNG chains (the estimate
    population); every rung replicates it, so ``len(betas) *
    total_chains`` lanes run.  ``betas`` must start at 1.0 and strictly
    decrease (validated at the API layer from the user's ascending
    temperature ladder).

    Proposals: random-walk / HMC (``hmc_leapfrog=L`` switches to
    leapfrog trajectories; ``rw_adapt=True`` Robbins-Monro-tunes one
    log step-scale per LANE during burn-in, so each rung finds its own
    temperature-matched step), or — ``prop_kinds`` given — INDEPENDENCE
    sampling per dimension (the reference's native proposal family,
    src/shader_gen.rs:466-539, tempered): every rung draws fresh
    proposals from q and accepts with ``beta * (logp' - logp) +
    logq(x) - logq(x')`` — the state-independent log-q terms stay
    untempered because q never changes with the rung.  Tempering is
    usually paired with local samplers (an independence sampler already
    proposes globally), but a tempered independence chain is
    well-defined and useful when q covers every mode weakly: hot rungs
    accept q's distant proposals more often and feed them down-ladder.

    Returned signature::

        (seed,
         prop_params_t,   # d-tuple of (4,) walk rows, or of (2,) family
                          # rows under prop_kinds (independence)
         targ_params_t, targ_lx_t, targ_lp_t)   # target params/tables
        -> ((K,) estimates, () cold-rung acceptance, () swap rate
            [, (K,) stderr] [, (K,) r_hat, (K,) ess])

    Independence mode appends proposal-table args after the target's:
    ``(..., prop_x_t, prop_cdf_t, prop_lx_t, prop_lp_t)`` — d-tuples of
    inverse-CDF x/cdf tables and log-pdf tables (dummies for analytic
    dims), the nd builder's slots (ops/mcmc_nd.py).

    The swap rate is accepted / attempted adjacent exchanges over the
    whole run — the ladder-tuning diagnostic (healthy ladders sit
    around 0.2-0.6; ~0 means the rungs don't overlap, ~1 means wasted
    rungs).

    ``with_samples=m``: additionally returns an (m, d, total_chains)
    float32 buffer of thinned post-burn-in COLD-RUNG draws (every
    ``n_steps // m`` sampling steps, the nd builder's convention,
    ops/mcmc_nd.py) — appended last, sharded over chains on a mesh.
    """
    if (targ_kinds is None) == (target_logpdf_fn is None):
        raise ValueError(
            "exactly one of targ_kinds (product target) or "
            "target_logpdf_fn (joint target) must be given"
        )
    betas = tuple(float(b) for b in betas)
    n_temps = len(betas)
    if n_temps < 2:
        raise ValueError("parallel tempering needs >= 2 temperatures")
    if betas[0] != 1.0 or any(
        b2 >= b1 for b1, b2 in zip(betas, betas[1:])
    ):
        raise ValueError(
            f"betas must start at 1.0 and strictly decrease, got {betas}"
        )
    if swap_every < 1:
        raise ValueError(f"swap_every must be >= 1, got {swap_every}")
    if targ_kinds is not None:
        targ_kinds = tuple(targ_kinds)
        if len(targ_kinds) != d:
            raise ValueError("targ_kinds must have one entry per dim")
    targ_uniform = tuple(targ_uniform) or (False,) * d
    independence = prop_kinds is not None
    if independence:
        prop_kinds = tuple(prop_kinds)
        if len(prop_kinds) != d:
            raise ValueError("prop_kinds must have one entry per dim")
        if rw_adapt or hmc_leapfrog:
            raise ValueError(
                "independence tempering has no step to adapt or "
                "integrate (rw_adapt/hmc_leapfrog are walk-only)"
            )
    prop_uniform = tuple(prop_uniform) or (False,) * d
    prop_exact_inverses = tuple(prop_exact_inverses) or (False,) * d
    k = len(eval_fns)
    vfns = [jax.vmap(f) for f in eval_fns]
    n_dev = 1 if mesh is None else mesh.size
    if total_chains % n_dev != 0:
        raise ValueError("total_chains must divide evenly over devices")
    local_chains = total_chains // n_dev
    n_lanes = n_temps * local_chains  # flat ladder ensemble per device
    n_iters = n_burnin + n_steps
    if with_diagnostics and n_steps < 4:
        raise ValueError("with_diagnostics needs n_steps >= 4")
    if with_samples and not 1 <= int(with_samples) <= n_steps:
        raise ValueError(
            f"with_samples must be in [1, n_steps={n_steps}], got "
            f"{with_samples}"
        )
    sample_stride = n_steps // with_samples if with_samples else 0
    if target_logpdf_fn is not None:
        v_target = jax.vmap(target_logpdf_fn)

    beta_vec = jnp.repeat(
        jnp.asarray(betas, jnp.float32), local_chains
    )  # (n_lanes,)
    perm0, perm1, n_pairs0, n_pairs1 = _swap_perms(n_temps, local_chains)
    lane_idx = jnp.arange(n_lanes, dtype=jnp.int32)

    def _chain_sweep(seed, *sweep_args):
        if independence:
            (
                prop_params_t, targ_params_t, prop_x_t, prop_cdf_t,
                targ_lx_t, targ_lp_t, prop_lx_t, prop_lp_t, device_idx,
            ) = sweep_args
        else:
            (
                prop_params_t, targ_params_t, targ_lx_t, targ_lp_t,
                device_idx,
            ) = sweep_args
        key = jax.random.fold_in(jax.random.PRNGKey(seed), device_idx)
        key_init = jax.random.fold_in(key, _STREAM_INIT)
        key_prop = jax.random.fold_in(key, _STREAM_PROPOSAL)
        key_acc = jax.random.fold_in(key, _STREAM_ACCEPT)
        key_swap = jax.random.fold_in(key, _STREAM_SWAP)

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

        if independence:

            def proposal_log(xs):
                tot = None
                for j in range(d):
                    lq = log_pdf(
                        prop_kinds[j], prop_params_t[j], xs[j],
                        prop_lx_t[j], prop_lp_t[j],
                        uniform=prop_uniform[j],
                    )
                    tot = lq if tot is None else tot + lq
                return tot

            def sample_prop(key_i):
                return tuple(
                    sample_block(
                        jax.random.fold_in(key_i, j), (n_lanes,),
                        prop_kinds[j], prop_params_t[j],
                        prop_x_t[j], prop_cdf_t[j],
                        exact_inverse=prop_exact_inverses[j],
                    )
                    for j in range(d)
                )

            # Init from the proposal itself, every rung alike (the 1-D
            # independence sampler's init, ops/mcmc_xla.py).
            xs0 = sample_prop(key_init)
            logp0 = target_log(xs0)
            # The carried third slot holds the chain's own proposal
            # log-density (it changes on acceptance AND on exchange —
            # logq is a function of the swapped state).
            scale0 = proposal_log(xs0)
        else:
            rw_steps = [prop_params_t[j][0] for j in range(d)]
            rw_los = [prop_params_t[j][1] for j in range(d)]
            rw_his = [prop_params_t[j][2] for j in range(d)]
            rw_target = prop_params_t[0][3]

            # Overdispersed uniform init over the per-dimension ranges,
            # every rung alike (ops/mcmc_nd.py's random-walk init).
            xs0 = tuple(
                rw_los[j]
                + (rw_his[j] - rw_los[j])
                * jax.random.uniform(
                    jax.random.fold_in(key_init, j), (n_lanes,),
                    jnp.float32,
                )
                for j in range(d)
            )
            logp0 = target_log(xs0)
            # Per-lane log step-scale (adapted in burn-in when rw_adapt).
            scale0 = jnp.zeros((n_lanes,), jnp.float32)

        shift_needed = with_stderr or with_diagnostics
        if shift_needed:
            cold0 = tuple(x_j[:local_chains] for x_j in xs0)
            pilot = jnp.stack(
                [jnp.mean(vf(*cold0).astype(jnp.float32)) for vf in vfns]
            )

        n1 = n_steps // 2  # split-half length (odd last step excluded)

        def step(carry, i):
            if with_samples:
                carry, buf = carry[:-1], carry[-1]
            if with_diagnostics:
                xs, logp, lsc, acc, n_accept, sw_acc, halves = carry
            else:
                xs, logp, lsc, acc, n_accept, sw_acc = carry
            key_i = jax.random.fold_in(key_prop, i)
            scale = jnp.exp(lsc) if rw_adapt else jnp.float32(1.0)
            if independence:
                # Tempered independence MH: q is rung-independent, so
                # its log terms enter the acceptance untempered.
                xp = sample_prop(key_i)
                logp_prop = target_log(xp)
                logq_prop = proposal_log(xp)
                log_alpha = (
                    beta_vec * (logp_prop - logp) + lsc - logq_prop
                )
                z = None
            else:
                z = tuple(
                    jax.random.normal(
                        jax.random.fold_in(key_i, j), (n_lanes,),
                        jnp.float32,
                    )
                    for j in range(d)
                )
            if independence:
                pass
            elif hmc_leapfrog:
                # Tempered Hamiltonian: H_t = -beta_t log pi + |p|^2/2,
                # so the leapfrog force is beta * grad log pi (hot rungs
                # feel weaker gradients and roam further per step).
                grad_logp = jax.grad(lambda xv: jnp.sum(target_log(xv)))

                def tgrad(xv):
                    g = grad_logp(xv)
                    return tuple(beta_vec * g_j for g_j in g)

                eps = tuple(scale * rw_steps[j] for j in range(d))

                def leap(_, c):
                    xq, p, g = c
                    p = tuple(
                        p[j] + 0.5 * eps[j] * g[j] for j in range(d)
                    )
                    xq = tuple(xq[j] + eps[j] * p[j] for j in range(d))
                    g = tgrad(xq)
                    p = tuple(
                        p[j] + 0.5 * eps[j] * g[j] for j in range(d)
                    )
                    return xq, p, g

                xp, pf, _ = jax.lax.fori_loop(
                    0, hmc_leapfrog, leap, (xs, z, tgrad(xs))
                )
                logp_prop = target_log(xp)
                kin0 = sum(p_j * p_j for p_j in z)
                kinf = sum(p_j * p_j for p_j in pf)
                log_alpha = (beta_vec * logp_prop - 0.5 * kinf) - (
                    beta_vec * logp - 0.5 * kin0
                )
                # Diverged trajectories (inf - inf) reject rather than
                # NaN-poison the step adaptation.
                log_alpha = jnp.where(
                    jnp.isnan(log_alpha), -jnp.inf, log_alpha
                )
            else:
                xp = tuple(
                    x_j + scale * rw_steps[j] * z[j]
                    for j, x_j in enumerate(xs)
                )
                logp_prop = target_log(xp)
                # Symmetric proposal against the rung's tempered target.
                log_alpha = beta_vec * (logp_prop - logp)
            u = jax.random.uniform(
                jax.random.fold_in(key_acc, i), (n_lanes,), jnp.float32
            )
            accept = jnp.log(jnp.maximum(u, 1e-38)) < log_alpha
            xs = tuple(
                jnp.where(accept, xp_j, x_j)
                for xp_j, x_j in zip(xp, xs)
            )
            logp = jnp.where(accept, logp_prop, logp)
            if independence:
                lsc = jnp.where(accept, logq_prop, lsc)
            if rw_adapt:
                # Robbins-Monro on the per-lane log-scale, burn-in only
                # (ops/mcmc_xla.py's update) — each rung self-tunes to
                # its own temperature's optimal step.
                alpha_p = jnp.exp(jnp.minimum(log_alpha, 0.0))
                gamma = jnp.exp(
                    jnp.float32(-0.6)
                    * jnp.log((i + 1).astype(jnp.float32))
                )
                lsc = jnp.where(
                    i < n_burnin,
                    jnp.clip(
                        lsc + gamma * (alpha_p - rw_target),
                        _RW_LOG_STEP_MIN,
                        _RW_LOG_STEP_MAX,
                    ),
                    lsc,
                )

            # --- Replica exchange: alternating even/odd adjacent pairs.
            do_swap = (i % swap_every) == 0
            parity_even = ((i // swap_every) % 2) == 0
            perm = jnp.where(parity_even, perm0, perm1)
            logp_part = jnp.take(logp, perm)
            delta = (beta_vec - jnp.take(beta_vec, perm)) * (
                logp_part - logp
            )
            # One uniform per PAIR, read by both lanes at the pair's
            # lower index; the acceptance expression is symmetric in the
            # pair, so both lanes decide identically.
            v = jax.random.uniform(
                jax.random.fold_in(key_swap, i), (n_lanes,), jnp.float32
            )
            v_shared = jnp.take(v, jnp.minimum(lane_idx, perm))
            acc_sw = jnp.logical_and(
                jnp.logical_and(
                    jnp.log(jnp.maximum(v_shared, 1e-38)) < delta,
                    perm != lane_idx,
                ),
                do_swap,
            )
            xs = tuple(
                jnp.where(acc_sw, jnp.take(x_j, perm), x_j)
                for x_j in xs
            )
            logp = jnp.where(acc_sw, logp_part, logp)
            if independence:
                # logq travels with the exchanged STATE (it is a
                # function of x); a walk's step scale stays with its
                # rung instead (a temperature property).
                lsc = jnp.where(acc_sw, jnp.take(lsc, perm), lsc)
            n_att = jnp.where(
                parity_even, jnp.float32(n_pairs0), jnp.float32(n_pairs1)
            ) * jnp.float32(local_chains) * do_swap.astype(jnp.float32)
            sw_acc = (
                sw_acc[0] + 0.5 * jnp.sum(acc_sw.astype(jnp.float32)),
                sw_acc[1] + n_att,
            )

            # --- Accumulate the post-swap COLD-rung state.
            collect = i >= n_burnin
            cold = tuple(x_j[:local_chains] for x_j in xs)
            ys = jnp.stack([vf(*cold) for vf in vfns]).astype(jnp.float32)
            if shift_needed:
                sv = ys - pilot[:, None]
            vals = sv if with_stderr else ys
            acc = acc + jnp.where(collect, vals, 0.0)
            n_accept = n_accept + jnp.where(
                collect,
                jnp.sum(accept[:local_chains].astype(jnp.float32)),
                0.0,
            )
            if with_samples:
                # Thinned post-swap cold-rung draw at sampling steps
                # n_burnin + j*stride (ops/mcmc_nd.py's convention).
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
                    buf, jnp.where(hit, jnp.stack(cold), cur), pos, 0
                )
            samp = (buf,) if with_samples else ()
            if with_diagnostics:
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
                    xs, logp, lsc, acc, n_accept, sw_acc,
                    (acc1, sq1, acc2, sq2),
                ) + samp, None
            return (xs, logp, lsc, acc, n_accept, sw_acc) + samp, None

        zk = lambda: jnp.zeros((k, local_chains), jnp.float32)  # noqa: E731
        init = (
            xs0, logp0, scale0, zk(), jnp.float32(0.0),
            (jnp.float32(0.0), jnp.float32(0.0)),
        )
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
            _, _, _, acc, n_accept, sw_acc, halves = carry
        else:
            _, _, _, acc, n_accept, sw_acc = carry

        diag = ()
        if with_diagnostics:
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
            return (
                sums, n_accept, sw_acc, ss, mb_s + pilot
            ) + diag + samples_buf
        return (
            jnp.sum(chain_means, axis=1), n_accept, sw_acc
        ) + diag + samples_buf

    denom_vals = jnp.float32(total_chains)
    denom_acc = jnp.float32(total_chains) * jnp.float32(max(n_steps, 1))

    def _stderr_of(ss_total):
        var = ss_total / jnp.maximum(denom_vals - 1.0, 1.0)
        return jnp.sqrt(var / denom_vals)

    m_total = jnp.float32(2 * total_chains)

    def _rhat_of(w_tot, ss_tot):
        from .mcmc_xla import split_rhat_ess

        return split_rhat_ess(w_tot, ss_tot, m_total, n_steps // 2)

    def _swap_rate(sw_acc):
        return sw_acc[0] / jnp.maximum(sw_acc[1], 1.0)

    if mesh is None:

        @jax.jit
        def run(seed, *args):
            out = _chain_sweep(seed, *args, jnp.int32(0))
            res = (
                out[0] / denom_vals,
                out[1] / denom_acc,
                _swap_rate(out[2]),
            )
            pos = 5 if with_stderr else 3
            if with_stderr:
                res = res + (_stderr_of(out[3]),)
            if with_diagnostics:
                w_sum, _, ss_d = out[pos]
                pos += 1
                res = res + _rhat_of(w_sum, ss_d)
            if with_samples:
                res = res + (out[pos],)  # (m, d, total_chains) draws
            return res

        return run

    replicated = P()

    def sharded_body(seed, *args):
        dev = jax.lax.axis_index(axis_name)
        out = _chain_sweep(seed, *args, dev)
        sums = jax.lax.psum(out[0], axis_name)
        n_accept = jax.lax.psum(out[1], axis_name)
        sw = (
            jax.lax.psum(out[2][0], axis_name),
            jax.lax.psum(out[2][1], axis_name),
        )
        res = (sums / denom_vals, n_accept / denom_acc, _swap_rate(sw))
        if with_stderr:
            ss, mb = out[3], out[4]
            m_global = sums / denom_vals
            corr = jnp.float32(local_chains) * (mb - m_global) ** 2
            ss_total = jax.lax.psum(ss + corr, axis_name)
            res = res + (_stderr_of(ss_total),)
        pos = 5 if with_stderr else 3
        if with_diagnostics:
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
        return res

    dim_rep = (replicated,) * d
    td = len(targ_kinds) if targ_kinds is not None else 0
    targ_rep = (replicated,) * td
    if independence:
        in_specs = (
            replicated, dim_rep, targ_rep, dim_rep, dim_rep,
            targ_rep, targ_rep, dim_rep, dim_rep,
        )
    else:
        in_specs = (replicated, dim_rep, targ_rep, targ_rep, targ_rep)
    out_specs = (replicated, replicated, replicated)
    if with_stderr:
        out_specs = out_specs + (replicated,)
    if with_diagnostics:
        out_specs = out_specs + (replicated, replicated)
    if with_samples:
        # (m, d, total_chains): thinned cold-rung draws over chains.
        out_specs = out_specs + (P(None, None, axis_name),)

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
