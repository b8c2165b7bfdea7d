"""No-U-Turn sampler — iterative, multinomial, fully ``jit``-compiled.

Why it exists: the reference's engine is fixed-trajectory Pyro ``HMC``
(``model_bnn.py:269-270``), which mixes poorly on sharp high-dimensional BNN
posteriors (observed: the 60k-input full-batch multimodality chain stays at
~10% accuracy from a random init — PERFORMANCE.md). NUTS adapts the
trajectory length per draw and is the standard fix; Pyro itself ships it as
the recommended kernel.

TPU-first design — recursion-free NUTS:

* the textbook algorithm is recursive tree doubling; recursion cannot be
  compiled by XLA. This is the **iterative** formulation: an outer
  ``lax.while_loop`` doubles the trajectory, an inner ``lax.while_loop`` runs
  the ``2^depth`` leapfrog leaves of each subtree;
* sub-U-turn checks (the part naive iterative ports drop) use level-indexed
  checkpoints: at most one dyadic node of size ``2^(j+1)`` is live per level
  ``j``, so row ``j`` of a ``(max_depth, D)`` buffer holds its first-leaf
  velocity and momentum-prefix — (re)written at leaves with
  ``i % 2^(j+1) == 0``, tested at leaves with ``(i+1) % 2^(j+1) == 0`` via
  the generalized U-turn condition
  ``rho·(M⁻¹ p_first) < 0 or rho·(M⁻¹ p_last) < 0``. Both masks are bit-
  functions of the leaf counter, so the whole bookkeeping is one masked
  ``(rows, D)`` select plus one fused masked reduction per leaf — no
  sequential inner loops (whose turnaround latency measured ~2.6 ms/leaf on
  a 2M-param model, round 5). This checks exactly the node set the
  recursive algorithm checks, in O(max_depth) memory;
* proposals are **multinomial** with biased progressive sampling (Stan's
  scheme): within a subtree each leaf replaces the running proposal with
  probability ``exp(logw_leaf − logsumexp_so_far)``; across subtrees the new
  subtree's proposal is accepted with probability
  ``min(1, exp(logw_subtree − logw_trajectory))``;
* positions are flat ``(D,)`` vectors (like :mod:`.hmc`), so every leapfrog
  update is one fused vector op and the potential gradient is one batched
  MXU forward/backward;
* each tree leaf costs exactly ONE ``value_and_grad`` evaluation: the
  gradient at the leaf's start position is carried from the previous leaf
  (and across subtree doublings via the trajectory's two edge states), and
  the leaf's energy reuses the primal from the same fused evaluation — the
  same K+1-gradients-for-K-steps caching :func:`.hmc._leapfrog` does. The
  naive formulation (2 ``grad`` + 1 forward per leaf, what this module did
  through round 5a) costs ~2.3× the FLOPs for bit-identical trajectories;
* warmup reuses the HMC machinery: ``find_reasonable_step_size`` guard, dual
  averaging on the trajectory-averaged acceptance statistic, and the windowed
  diagonal-mass scheme with post-switch step-size re-adaptation (see
  :mod:`robustbnns_tpu.inference.hmc`); ``"high"`` (bf16_3x) matmul
  precision by default (``NUTSConfig.precision`` /
  ``ROBUSTBNNS_MCMC_PRECISION`` — see the hmc module for the precision
  ladder evidence).

Divergences use Stan's ``ΔH > 1000`` cutoff. ``num_chains`` vmaps whole
chains, shardable over a mesh's ``sample`` axis like HMC chains.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from robustbnns_tpu.inference.hmc import (
    MCMC_PRECISION_DEFAULT,
    _dual_averaging_update,
    _find_reasonable_step_size,
    _heartbeat,
    _kinetic,
    _mass_switch,
    run_windowed_warmup,
)


class NUTSConfig(NamedTuple):
    """Sampler knobs (Stan/NumPyro defaults).

    ``precision`` — matmul precision inside the sampler; default ``"high"``
    (bf16_3x, env override ``ROBUSTBNNS_MCMC_PRECISION``): measured
    statistically indistinguishable from full-f32 ``"highest"`` on the
    round-3 collapse repro at 1.65× the throughput, while single-pass bf16
    ``"default"`` collapses adaptation outright — see
    :class:`robustbnns_tpu.inference.hmc.HMCConfig` and PERFORMANCE.md
    rounds 3 and 5.
    """

    num_samples: int
    warmup: int
    step_size: float = 0.1
    max_depth: int = 10
    adapt_step_size: bool = True
    adapt_mass_matrix: bool = True
    target_accept: float = 0.8
    num_chains: int = 1
    precision: str = MCMC_PRECISION_DEFAULT


class NUTSInfo(NamedTuple):
    accept_stat: jax.Array  # (S,) trajectory-averaged acceptance statistic
    num_leapfrog: jax.Array  # (S,) leapfrog steps per draw
    diverging: jax.Array  # (S,) divergence flag per draw
    step_size: jax.Array  # final (adapted) step size
    inv_mass: jax.Array  # final diagonal inverse mass


def _trailing_ones(i: jax.Array, nbits: int = 32) -> jax.Array:
    """Number of trailing 1-bits of ``i`` = how many tree nodes close at leaf i."""
    bits = (i >> jnp.arange(nbits, dtype=i.dtype)) & 1
    return jnp.sum(jnp.cumprod(bits)).astype(jnp.int32)


def _trailing_zeros(i: jax.Array, nbits: int = 32) -> jax.Array:
    """Number of trailing 0-bits of ``i`` (32 for i == 0)."""
    bits = 1 - ((i >> jnp.arange(nbits, dtype=i.dtype)) & 1)
    return jnp.sum(jnp.cumprod(bits)).astype(jnp.int32)


_MAX_DELTA_ENERGY = 1000.0  # Stan's divergence cutoff


def _build_subtree(
    potential_fn, vg_u, h0, q0, p0, g0, direction, depth, eps, inv_mass,
    max_depth, key,
):
    """Integrate the ``2**depth`` leaves of one subtree from (q0, p0).

    ``vg_u = jax.value_and_grad(potential_fn)``; ``g0`` is the potential
    gradient at ``q0`` (carried by the caller so a subtree build never
    re-evaluates its start state). Each leaf is one velocity-Verlet step
    costing exactly one ``vg_u`` call: the first momentum half-step uses the
    carried gradient, the second uses the fresh one, and the leaf energy
    reuses the fused primal.

    Returns (q_end, p_end, psum, q_prop, logw, sum_accept, n_done, turning,
    diverging, sp_end, g_end). ``psum`` is the sum of the *new* leaves'
    momenta (true trajectory momenta — backward builds use a negative step,
    so collected momenta are the real ones at those points). ``sp_end`` is
    the checkpoint stack pointer after the build — 0 for a complete,
    non-terminated build (every opened node was closed; asserted by tests).
    ``g_end`` is the gradient at ``q_end`` for the caller's edge carry.

    Checkpoint bookkeeping: a dyadic node ``[i, i + 2^j - 1]`` OPENS at its
    first leaf ``i`` — for each ``j ∈ [1, trailing_zeros(i)]`` (``depth``
    nodes at leaf 0) — and CLOSES at its last leaf, one per trailing 1-bit.
    Leaf ``i`` therefore pushes ``trailing_zeros(i)`` identical checkpoints
    (same position/momentum/momentum-prefix: all those nodes start at this
    leaf), keeping pushes and pops balanced at ``2^depth - 1`` each. (The
    original one-push-per-even-leaf scheme underflowed the stack for any
    subtree of ≥4 leaves, so U-turn checks for size-≥4 nodes read stale or
    zeroed slots — caught in round-2 review.)
    """
    d = q0.shape[0]
    signed_eps = direction * eps
    n_leaves = jnp.asarray(2, jnp.int32) ** depth
    n_ckpt = max_depth + 1

    def cond(state):
        i = state[1]
        turning, diverging = state[11], state[12]
        return (i < n_leaves) & ~turning & ~diverging

    def body(state):
        (key, i, q, p, g, psum, q_prop, logw, sum_acc,
         ckpt_q, ckpt_p, turning, diverging, ckpt_psum, sp) = state

        key, k_mult = jax.random.split(key)
        # One velocity-Verlet step, one fused potential evaluation: the
        # entering half-step uses the carried gradient g = ∇U(q).
        p_half = p - 0.5 * signed_eps * g
        q = q + signed_eps * inv_mass * p_half
        u, g = vg_u(q)
        p = p_half - 0.5 * signed_eps * g
        h = u + _kinetic(p, inv_mass)
        delta = h - h0
        delta = jnp.where(jnp.isfinite(delta), delta, jnp.inf)
        diverging = delta > _MAX_DELTA_ENERGY
        logw_leaf = -delta
        sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(-delta))

        # Multinomial proposal within the subtree.
        logw_new = jnp.logaddexp(logw, logw_leaf)
        take = jnp.log(jax.random.uniform(k_mult)) < (logw_leaf - logw_new)
        q_prop = jnp.where(take, q, q_prop)
        logw = logw_new

        # Open nodes: one push per node whose FIRST leaf is i — that is
        # trailing_zeros(i) nodes (depth of them at i == 0), all sharing this
        # leaf's state.
        n_opens = jnp.where(i == 0, depth, _trailing_zeros(i))

        def push(j, carry):
            cq, cp, cps = carry
            do = j < n_opens
            cq = jnp.where(do, cq.at[sp + j].set(q), cq)
            cp = jnp.where(do, cp.at[sp + j].set(p), cp)
            cps = jnp.where(do, cps.at[sp + j].set(psum), cps)
            return cq, cp, cps

        ckpt_q, ckpt_p, ckpt_psum = jax.lax.fori_loop(
            0, max_depth + 1, push, (ckpt_q, ckpt_p, ckpt_psum)
        )
        sp = sp + n_opens

        psum = psum + p

        # Close nodes: one U-turn test per trailing 1-bit of i (LIFO pops).
        n_checks = _trailing_ones(i)

        def check(j, turning):
            idx = sp - 1 - j
            valid = j < n_checks
            # ckpt_psum was recorded BEFORE the node's first-leaf momentum was
            # added, so this difference is exactly Σ p over the node's leaves.
            rho = psum - ckpt_psum[idx]
            turn = (
                jnp.dot(rho, inv_mass * ckpt_p[idx]) < 0.0
            ) | (jnp.dot(rho, inv_mass * p) < 0.0)
            return turning | (valid & turn)

        turning = jax.lax.fori_loop(0, max_depth + 1, check, turning)
        sp = sp - n_checks

        return (key, i + 1, q, p, g, psum, q_prop, logw, sum_acc,
                ckpt_q, ckpt_p, turning, diverging, ckpt_psum, sp)

    init = (
        key,
        jnp.zeros((), jnp.int32),
        q0,
        p0,
        g0,
        jnp.zeros((d,), q0.dtype),
        q0,
        jnp.asarray(-jnp.inf, q0.dtype),
        jnp.zeros((), q0.dtype),
        jnp.zeros((n_ckpt, d), q0.dtype),
        jnp.zeros((n_ckpt, d), q0.dtype),
        jnp.zeros((), bool),
        jnp.zeros((), bool),
        jnp.zeros((n_ckpt, d), q0.dtype),
        jnp.zeros((), jnp.int32),
    )
    (_, i, q, p, g, psum, q_prop, logw, sum_acc,
     _, _, turning, diverging, _, sp) = jax.lax.while_loop(cond, body, init)
    return q, p, psum, q_prop, logw, sum_acc, i, turning, diverging, sp, g


def _nuts_transition_nested(potential_fn, max_depth):
    """One NUTS draw, nested-loop formulation (outer ``while`` over
    doublings, inner ``while`` over subtree leaves — the direct iterative
    transcription of the recursive algorithm).

    Kept as the semantic reference: :func:`_nuts_transition` (the flat
    single-loop, vectorized-checkpoint formulation actually used by the
    sampler) is asserted bit-identical to this in ``tests/test_nuts.py``.
    This version keeps the textbook structure — and the sequential
    ``fori_loop`` checkpoint pushes/pops whose loop-turnaround latency is
    what the shipped formulation removes (measured round 5: ~135 vs ~190
    gradient evals/s on the 2M-param multimodal config, against a ~213/s
    pure-gradient floor).
    """
    vg_u = jax.value_and_grad(potential_fn)

    def transition(q, key, eps, inv_mass):
        key, k_mom = jax.random.split(key)
        p0 = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(inv_mass)
        # One fused evaluation at the root: the primal feeds H0, the gradient
        # seeds both trajectory edges.
        u0, g0 = vg_u(q)
        h0 = u0 + _kinetic(p0, inv_mass)

        def cond(state):
            depth, turning, diverging = state[1], state[14], state[15]
            return (depth < max_depth) & ~turning & ~diverging

        def body(state):
            (key, depth, q_l, p_l, g_l, q_r, p_r, g_r, psum, q_prop, logw,
             sum_acc, n_leaves, n_sub_ok, turning, diverging) = state
            key, k_dir, k_sub, k_merge = jax.random.split(key, 4)
            go_right = jax.random.bernoulli(k_dir)
            direction = jnp.where(go_right, 1.0, -1.0).astype(q_prop.dtype)
            q0 = jnp.where(go_right, q_r, q_l)
            p0 = jnp.where(go_right, p_r, p_l)
            g_start = jnp.where(go_right, g_r, g_l)

            (q_end, p_end, psum_sub, q_prop_sub, logw_sub, acc_sub, n_done,
             turn_sub, div_sub, _, g_end) = _build_subtree(
                potential_fn, vg_u, h0, q0, p0, g_start, direction,
                depth, eps, inv_mass,
                max_depth, k_sub,
            )
            sum_acc = sum_acc + acc_sub
            n_leaves = n_leaves + n_done
            sub_ok = ~(turn_sub | div_sub)

            # Biased progressive sampling across subtrees (Stan).
            take = sub_ok & (
                jnp.log(jax.random.uniform(k_merge)) < (logw_sub - logw)
            )
            q_prop = jnp.where(take, q_prop_sub, q_prop)
            logw = jnp.where(sub_ok, jnp.logaddexp(logw, logw_sub), logw)

            q_l = jnp.where(sub_ok & ~go_right, q_end, q_l)
            p_l = jnp.where(sub_ok & ~go_right, p_end, p_l)
            g_l = jnp.where(sub_ok & ~go_right, g_end, g_l)
            q_r = jnp.where(sub_ok & go_right, q_end, q_r)
            p_r = jnp.where(sub_ok & go_right, p_end, p_r)
            g_r = jnp.where(sub_ok & go_right, g_end, g_r)
            psum = jnp.where(sub_ok, psum + psum_sub, psum)

            # Whole-trajectory generalized U-turn after a successful doubling.
            turn_total = sub_ok & (
                (jnp.dot(psum, inv_mass * p_l) < 0.0)
                | (jnp.dot(psum, inv_mass * p_r) < 0.0)
            )
            return (key, depth + 1, q_l, p_l, g_l, q_r, p_r, g_r, psum,
                    q_prop, logw,
                    sum_acc, n_leaves, n_sub_ok + sub_ok.astype(jnp.int32),
                    turning | turn_sub | turn_total, diverging | div_sub)

        init = (
            key,
            jnp.zeros((), jnp.int32),
            q, p0, g0, q, p0, g0,
            p0,  # psum starts with the root leaf's momentum
            q,
            jnp.zeros((), q.dtype),  # root leaf weight: H0 - H0 = 0
            jnp.zeros((), q.dtype),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), bool),
            jnp.zeros((), bool),
        )
        (_, _, _, _, _, _, _, _, _, q_new, _, sum_acc, n_leaves, _, _,
         diverging) = jax.lax.while_loop(cond, body, init)
        accept_stat = sum_acc / jnp.maximum(n_leaves, 1)
        return q_new, accept_stat, n_leaves, diverging

    return transition


def _nuts_transition(potential_fn, max_depth):
    """One NUTS draw: (q, key, eps, inv_mass) → (q', accept_stat, n_leapfrog,
    diverging).

    Flat single-loop formulation: ONE leaf-level ``lax.while_loop`` carries
    both the subtree-local and the whole-trajectory state, with the
    doubling-boundary work (direction draw, subtree reset, biased
    progressive merge) predicated on the leaf counter instead of living in
    an outer loop. Equivalent to :func:`_nuts_transition_nested` — the PRNG
    split schedule is replicated exactly (the per-doubling ``split(key, 4)``
    happens at each subtree's first leaf, the per-leaf split consumes the
    subtree key) — asserted draw-for-draw in ``tests/test_nuts.py``.

    Checkpoint bookkeeping is **level-indexed and vectorized**: the dyadic
    node of size ``2^(j+1)`` live at any moment is unique per level ``j``,
    so checkpoints live in fixed rows of a ``(max_depth, D)`` buffer — row
    ``j`` is (re)written at leaves with ``i % 2^(j+1) == 0`` and checked at
    leaves with ``(i+1) % 2^(j+1) == 0``, both masks pure bit-functions of
    the leaf counter. One masked ``(rows, D)`` select replaces the push
    loop; one fused rows×D masked reduction replaces the U-turn check loop.
    This is the round-5 anatomy result: sequential ``fori_loop`` pushes and
    checks cost ~2.6 ms/leaf in loop-turnaround latency whenever their
    result is live on the next-iteration path (which in a real sampler it
    always is — ``turning`` feeds the loop condition), which held the 2M-
    param multimodal config at ~130 gradient evals/s against the ~213/s
    pure-gradient floor measured by both plain HMC and a bookkeeping-dead
    anatomy loop. The same node set is checked with the same stored values
    as the nested reference; only the loop structure differs.
    """
    vg_u = jax.value_and_grad(potential_fn)

    def transition(q, key, eps, inv_mass):
        key, k_mom = jax.random.split(key)
        p0 = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(inv_mass)
        u0, g0 = vg_u(q)
        h0 = u0 + _kinetic(p0, inv_mass)

        d = q.shape[0]
        # Row j holds the live level-(j+1) node's checkpoint (nodes of size
        # 2^(j+1); single leaves are never U-turn-checked). Subtrees reach
        # depth max_depth - 1, so max_depth rows cover every checkable level.
        n_rows = max_depth
        levels = jnp.asarray(2, jnp.int32) ** jnp.arange(1, n_rows + 1)
        dt = q.dtype

        def cond(state):
            depth, turning, diverging = state[4], state[20], state[21]
            return (depth < max_depth) & ~turning & ~diverging

        def body(state):
            (key_out, key_in, k_merge, direction, depth, i,
             qc, pc, gc, psum_sub, q_prop_sub, logw_sub, turning_sub,
             ckpt_v, ckpt_psum,
             eq, ep, eg,
             psum, q_prop, turning, diverging, logw, sum_acc,
             n_leaves, go_right, acc_sub) = state

            # -- Subtree start (i == 0): consume the outer key exactly like
            # the nested outer body, pick a direction, reset subtree state.
            is_start = i == 0
            ko_new, k_dir, k_sub, k_merge_new = jax.random.split(key_out, 4)
            key_out = jnp.where(is_start, ko_new, key_out)
            key_in = jnp.where(is_start, k_sub, key_in)
            k_merge = jnp.where(is_start, k_merge_new, k_merge)
            go_right = jnp.where(
                is_start, jax.random.bernoulli(k_dir), go_right
            )
            direction = jnp.where(
                is_start,
                jnp.where(go_right, 1.0, -1.0).astype(dt),
                direction,
            )
            # Edge states live as rows of (3, D) buffers (0 = left, 1 =
            # right, 2 = scratch): loads are one dynamic-slice + select, and
            # the sub_end stores below are one row write each instead of two
            # full-vector selects — this merge → edge-load chain feeds the
            # next leaf's gradient, so every byte here is critical-path.
            side = go_right.astype(jnp.int32)
            qc = jnp.where(is_start, eq[side], qc)
            pc = jnp.where(is_start, ep[side], pc)
            gc = jnp.where(is_start, eg[side], gc)
            psum_sub = jnp.where(is_start, jnp.zeros_like(psum_sub), psum_sub)
            q_prop_sub = jnp.where(is_start, qc, q_prop_sub)
            logw_sub = jnp.where(is_start, -jnp.inf, logw_sub)
            turning_sub = jnp.where(is_start, False, turning_sub)
            acc_sub = jnp.where(is_start, jnp.zeros_like(acc_sub), acc_sub)
            # No checkpoint-stack reset: at i == 0 the open-mask below is
            # all-true, so every row is rewritten with this subtree's state
            # before any row can be read (a level-(j+1) close needs
            # i ≥ 2^(j+1) − 1 > 0).

            # -- One leaf: identical math to _build_subtree's body.
            signed_eps = direction * eps
            key_in, k_mult = jax.random.split(key_in)
            p_half = pc - 0.5 * signed_eps * gc
            qc = qc + signed_eps * inv_mass * p_half
            u, gc = vg_u(qc)
            pc = p_half - 0.5 * signed_eps * gc
            # The leaf velocity, computed ONCE: the U-turn checks need
            # inv_mass·p for this leaf and for every checkpointed node, so
            # the checkpoint rows store velocities rather than momenta —
            # same bits as the nested formulation's per-check
            # `inv_mass * ckpt_p[idx]`, multiplied earlier.
            vc = inv_mass * pc
            h = u + _kinetic(pc, inv_mass)
            delta = h - h0
            delta = jnp.where(jnp.isfinite(delta), delta, jnp.inf)
            div_leaf = delta > _MAX_DELTA_ENERGY
            logw_leaf = -delta
            acc_sub = acc_sub + jnp.minimum(1.0, jnp.exp(-delta))

            logw_new = jnp.logaddexp(logw_sub, logw_leaf)
            take = jnp.log(jax.random.uniform(k_mult)) < (logw_leaf - logw_new)
            q_prop_sub = jnp.where(take, qc, q_prop_sub)
            logw_sub = logw_new

            # Open nodes: the level-(j+1) node whose FIRST leaf is i exists
            # iff i % 2^(j+1) == 0 (all rows at a subtree's first leaf).
            # ONE masked (rows, D) select per buffer replaces the push loop
            # — sequential fori pushes/checks cost ~2.6 ms/leaf in loop
            # turnarounds on the 2M-param config (round-5 anatomy bisect);
            # positions are never checkpointed (the generalized U-turn test
            # reads only velocities and momentum prefix-sums), and storing
            # velocities instead of momenta does the inv_mass multiply once
            # per leaf instead of once per check.
            open_mask = (i % levels) == 0
            ckpt_v = jnp.where(open_mask[:, None], vc[None, :], ckpt_v)
            ckpt_psum = jnp.where(
                open_mask[:, None], psum_sub[None, :], ckpt_psum
            )

            psum_sub = psum_sub + pc

            # Close nodes: the level-(j+1) node whose LAST leaf is i exists
            # iff (i+1) % 2^(j+1) == 0. ckpt_psum row j was recorded BEFORE
            # the node's first-leaf momentum was added, so rho is exactly
            # Σ p over the node's leaves. Fused masked rows×D reductions
            # replace the check loop; same node set, same stored values.
            close_mask = ((i + 1) % levels) == 0
            rho_rows = psum_sub[None, :] - ckpt_psum
            dot_first = jnp.sum(rho_rows * ckpt_v, axis=1)
            dot_last = rho_rows @ vc
            turning_sub = turning_sub | jnp.any(
                close_mask & ((dot_first < 0.0) | (dot_last < 0.0))
            )

            i = i + 1
            n_leaves = n_leaves + 1

            # -- Subtree end: the inner loop's exit condition, evaluated in
            # the same body iteration as its terminating leaf.
            n_sub = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)
            sub_end = (i >= n_sub) | turning_sub | div_leaf
            # Add the subtree's acceptance mass at its end (NOT per leaf):
            # preserves the nested version's float association exactly.
            sum_acc = jnp.where(sub_end, sum_acc + acc_sub, sum_acc)
            sub_ok = sub_end & ~(turning_sub | div_leaf)

            # Biased progressive sampling across subtrees (Stan).
            take_sub = sub_ok & (
                jnp.log(jax.random.uniform(k_merge)) < (logw_sub - logw)
            )
            q_prop = jnp.where(take_sub, q_prop_sub, q_prop)
            logw = jnp.where(sub_ok, jnp.logaddexp(logw, logw_sub), logw)

            row = jnp.where(sub_ok, side, 2)
            eq = eq.at[row].set(qc)
            ep = ep.at[row].set(pc)
            eg = eg.at[row].set(gc)
            psum = jnp.where(sub_ok, psum + psum_sub, psum)

            turn_total = sub_ok & (
                (jnp.dot(psum, inv_mass * ep[0]) < 0.0)
                | (jnp.dot(psum, inv_mass * ep[1]) < 0.0)
            )
            turning = turning | (sub_end & turning_sub) | turn_total
            diverging = diverging | (sub_end & div_leaf)
            depth = jnp.where(sub_end, depth + 1, depth)
            i = jnp.where(sub_end, 0, i)

            return (key_out, key_in, k_merge, direction, depth, i,
                    qc, pc, gc, psum_sub, q_prop_sub, logw_sub, turning_sub,
                    ckpt_v, ckpt_psum,
                    eq, ep, eg,
                    psum, q_prop, turning, diverging, logw, sum_acc,
                    n_leaves, go_right, acc_sub)

        init = (
            key, key, key,                      # key_out, key_in, k_merge
            jnp.ones((), dt),                   # direction
            jnp.zeros((), jnp.int32),           # depth
            jnp.zeros((), jnp.int32),           # i
            q, p0, g0,                          # current point
            jnp.zeros((d,), dt),                # psum_sub
            q,                                  # q_prop_sub
            jnp.asarray(-jnp.inf, dt),          # logw_sub
            jnp.zeros((), bool),                # turning_sub
            jnp.zeros((n_rows, d), dt),         # ckpt_v (row j: level j+1)
            jnp.zeros((n_rows, d), dt),         # ckpt_psum
            jnp.stack([q, q, q]),               # eq (left/right/scratch)
            jnp.stack([p0, p0, p0]),            # ep
            jnp.stack([g0, g0, g0]),            # eg
            p0,                                 # psum (root leaf momentum)
            q,                                  # q_prop
            jnp.zeros((), bool),                # turning
            jnp.zeros((), bool),                # diverging
            jnp.zeros((), dt),                  # logw (root: H0 - H0 = 0)
            jnp.zeros((), dt),                  # sum_acc
            jnp.zeros((), jnp.int32),           # n_leaves
            jnp.zeros((), bool),                # go_right
            jnp.zeros((), dt),                  # acc_sub
        )
        out = jax.lax.while_loop(cond, body, init)
        q_new, diverging = out[19], out[21]
        sum_acc, n_leaves = out[23], out[24]
        accept_stat = sum_acc / jnp.maximum(n_leaves, 1)
        return q_new, accept_stat, n_leaves, diverging

    return transition


# --------------------------------------------------------------------------- #
# Chunked chain driver.
#
# A NUTS chain over a large model can spend up to 2^max_depth gradient evals
# PER DRAW; warmup+sampling as one jitted dispatch then runs for many minutes,
# which the remote-TPU worker kills ("TPU worker crashed" — observed on the
# 50-draw/100-warmup multimodal config). The chain is therefore driven in
# bounded chunks: each chunk is one jitted scan over at most ``chunk_size``
# iterations and the carried state (position, PRNG key, dual-averaging and
# Welford accumulators) crosses the host between chunks. The key-split
# structure is identical to a single monolithic scan, so results are
# bit-identical for any chunk size (tested).
# --------------------------------------------------------------------------- #


@partial(
    jax.jit,
    static_argnames=("raw_potential_fn", "adapt_step_size", "precision"),
)
def _nuts_init(
    raw_potential_fn, data, init_q, key, step_size, adapt_step_size,
    precision="highest",
):
    """Initial step size (find-reasonable guard) + fresh adaptation state."""
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        d = init_q.shape[0]
        inv_mass0 = jnp.ones((d,), init_q.dtype)

        key, k_find = jax.random.split(key)
        if adapt_step_size:
            eps_found = _find_reasonable_step_size(
                potential_fn, init_q, k_find, step_size, inv_mass0
            )
            eps_init = jnp.minimum(eps_found, jnp.asarray(step_size, init_q.dtype))
        else:
            eps_init = jnp.asarray(step_size, init_q.dtype)
        mu = jnp.log(10.0 * eps_init)
        da0 = (jnp.log(eps_init), jnp.log(eps_init), jnp.zeros(()), mu)
        welford0 = (
            jnp.zeros((d,), init_q.dtype), jnp.zeros((d,), init_q.dtype), 0.0
        )
        key, k_warm = jax.random.split(key)
        return (init_q, k_warm, da0, welford0, inv_mass0), key


@partial(
    jax.jit,
    static_argnames=(
        "raw_potential_fn", "chunk_len", "max_depth",
        "adapt_step_size", "welford_on", "precision",
    ),
)
def _nuts_warmup_chunk(
    raw_potential_fn, data, carry, it0, chunk_len, step_size,
    max_depth, adapt_step_size, welford_on, target_accept, precision="highest",
):
    """``chunk_len`` warmup transitions; ``welford_on`` marks the mass window
    (see the windowed-warmup note in :mod:`robustbnns_tpu.inference.hmc`)."""
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        transition = _nuts_transition(potential_fn, max_depth)

        def warmup_step(carry, it):
            q, k, da, wf, inv_mass = carry
            k, k_t = jax.random.split(k)
            eps = jnp.exp(da[0]) if adapt_step_size else jnp.asarray(step_size)
            q, accept_stat, _, _ = transition(q, k_t, eps, inv_mass)
            if adapt_step_size:
                da = _dual_averaging_update(da, accept_stat, target_accept, it)
            if welford_on:
                mean, m2, count = wf
                new_count = count + 1.0
                delta = q - mean
                new_mean = mean + delta / new_count
                new_m2 = m2 + delta * (q - new_mean)
                wf = (new_mean, new_m2, new_count)
            return (q, k, da, wf, inv_mass), accept_stat

        carry, _ = jax.lax.scan(
            warmup_step, carry, it0 + jnp.arange(chunk_len)
        )
        return carry


@partial(
    jax.jit,
    static_argnames=("raw_potential_fn", "chunk_len", "max_depth", "precision"),
)
def _nuts_sample_chunk(
    raw_potential_fn, data, q, key, final_eps, inv_mass, chunk_len, max_depth,
    precision="highest",
):
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        transition = _nuts_transition(potential_fn, max_depth)

        def sample_step(carry, _):
            q, k = carry
            k, k_t = jax.random.split(k)
            q, accept_stat, n_lf, div = transition(q, k_t, final_eps, inv_mass)
            return (q, k), (q, accept_stat, n_lf, div)

        (q, key), outs = jax.lax.scan(
            sample_step, (q, key), None, length=chunk_len
        )
        return (q, key), outs


def _run_chain_chunked(raw_fn, data, init_q, key, config, chunk_size):
    num_samples, warmup = config.num_samples, config.warmup
    adapt_eps = config.adapt_step_size and warmup > 0
    prec = config.precision
    C = chunk_size or max(warmup, num_samples, 1)

    warm_carry, sample_key = _nuts_init(
        raw_fn, data, init_q, key, config.step_size, adapt_eps, precision=prec
    )

    def warmup_chunk(carry, it0, n, welford_on):
        return _nuts_warmup_chunk(
            raw_fn, data, carry, it0, n, config.step_size, config.max_depth,
            adapt_eps, welford_on, config.target_accept, precision=prec,
        )

    def mass_switch(q, k_ms, da, wf):
        return _mass_switch(raw_fn, data, q, k_ms, da, wf, adapt_eps,
                            precision=prec)

    q, _, da, _, inv_mass = run_windowed_warmup(
        warmup_chunk, mass_switch, warm_carry, config, chunk_size
    )
    if adapt_eps:
        final_eps = jnp.exp(da[1])
    else:
        final_eps = jnp.asarray(config.step_size, init_q.dtype)

    carry = (q, sample_key)
    chunks = []
    done = 0
    while done < num_samples:
        n = min(C, num_samples - done)
        carry, outs = _nuts_sample_chunk(
            raw_fn, data, carry[0], carry[1], final_eps, inv_mass, n,
            config.max_depth, precision=prec,
        )
        chunks.append(outs)
        done += n
        _heartbeat("nuts-sample", done, num_samples, carry[0])

    samples, accept_stats, n_lfs, divs = (
        jnp.concatenate([c[i] for c in chunks]) for i in range(4)
    )
    return samples, NUTSInfo(accept_stats, n_lfs, divs, final_eps, inv_mass)


def nuts_sample(
    potential_fn: Callable,
    init_position: jax.Array,
    key: jax.Array,
    config: NUTSConfig,
    data: tuple = None,
    chunk_size: int = None,
):
    """Run NUTS on a flat position vector — the drop-in upgrade of
    :func:`robustbnns_tpu.inference.hmc.hmc_sample` (same calling convention,
    same traced-``data`` compile-cache behavior, chains vmapped).

    ``chunk_size`` bounds how many warmup iterations / draws run per device
    dispatch (default: everything in one warmup + one sampling dispatch).
    Results are bit-identical for any chunk size; chunking exists so chains
    over big models never exceed the remote backend's per-dispatch tolerance
    (``ROBUSTBNNS_NUTS_CHUNK`` sets a process-wide default).
    """
    import os

    if chunk_size is None and os.environ.get("ROBUSTBNNS_NUTS_CHUNK"):
        chunk_size = int(os.environ["ROBUSTBNNS_NUTS_CHUNK"])
    if chunk_size is not None and chunk_size < 1:
        # 0 is falsy, so the chunked driver would silently treat it as "no
        # chunking" (C = chunk_size or ...) — reject it like hmc_sample does.
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if data is None:
        if not hasattr(potential_fn, "_rbnn_nullary"):
            fn = potential_fn
            shim = lambda q, *unused: fn(q)
            fn._rbnn_nullary = shim
        potential_fn = potential_fn._rbnn_nullary
        data = ()
    run = lambda q0, k: _run_chain_chunked(
        potential_fn, tuple(data), q0, k, config, chunk_size
    )
    if config.num_chains == 1:
        return run(init_position, key)
    keys = jax.random.split(key, config.num_chains)
    if init_position.ndim == 1:
        init_position = jnp.broadcast_to(
            init_position, (config.num_chains,) + init_position.shape
        )
    return jax.vmap(run)(init_position, keys)
