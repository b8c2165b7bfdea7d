"""Hamiltonian Monte Carlo as a jitted ``lax.scan`` leapfrog integrator.

Replaces Pyro's ``HMC`` kernel + ``MCMC`` driver (reference
``model_bnn.py:269-277``) with a functional sampler:

* positions are a single flat vector (``ravel_pytree``) so each leapfrog
  half-step is one fused vector op instead of a tree of small ones;
* the integrator is ``lax.scan`` over ``num_steps`` inside ``lax.scan`` over
  draws — the whole chain is one compiled program; the per-step gradient is
  ``jax.grad(potential)``, i.e. one full-batch forward+backward on the MXU;
* warmup adapts the step size by dual averaging toward ``target_accept=0.8``
  and (optionally) a diagonal mass matrix via Stan's windowed scheme — an
  init buffer (eps only), a Welford mass window, then a step-size
  RE-ADAPTATION phase under the new metric (see the chunked-driver note
  below) — the same knobs Pyro's defaults adapt
  (``adapt_step_size=True, adapt_mass_matrix=True``);
* every potential/gradient evaluation runs at ``"high"`` (bf16_3x) matmul
  precision by default (``HMCConfig.precision``, env override
  ``ROBUSTBNNS_MCMC_PRECISION``) — XLA:TPU's single-pass bf16 ``"default"``
  injects enough Hamiltonian noise to collapse adaptation on sharp
  posteriors, while the round-5 precision study measured ``"high"``
  statistically indistinguishable from full-f32 ``"highest"`` at 1.65× the
  leapfrog throughput (PERFORMANCE.md, round 5);
* chains are a ``vmap`` axis: ``num_chains`` chains integrate in lockstep as
  one batched program (and can be sharded across TPU cores, see
  :mod:`robustbnns_tpu.parallel`) — vs Pyro's ``num_chains=1`` serial chain;
* the returned posterior is a **stacked** ``(S, D)`` array / pytree, not the
  reference's N deep-copied modules (``model_bnn.py:279-294``).

Reference quirk (documented, reproduced by :func:`hmc_train_batched`): the
reference calls ``mcmc.run`` once per 5000-image batch in a loop
(``model_bnn.py:274-277``); each run *replaces* the previous samples, so
``mcmc.get_samples(n_samples)`` afterwards resamples **with replacement** from
only the final batch's ``n_samples//num_batches + 1`` draws, conditioned only
on that final batch. ``hmc_train_batched(mode='faithful')`` reproduces exactly
that; ``mode='full'`` runs one proper full-data chain (what
``test_multimodal.py:72-74`` does via ``batch_size = n_inputs``).

Pyro-source basis for the faithful-mode semantics (pyro-ppl 1.3.0,
``pyro/infer/mcmc/api.py`` — not installable on this box, cited from source):

* ``MCMC.run`` rebuilds its sample accumulator (``z_flat_acc``) from scratch
  on every call and assigns ``self._samples`` at the end — a second ``run``
  call therefore *discards* the first run's draws rather than appending;
* ``MCMC.get_samples(num_samples)`` subsamples the stored draws with
  ``torch.randint(0, batch_size, size=[num_samples])`` + ``index_select`` —
  ``randint`` draws indices independently, i.e. **with replacement** (and
  with ``num_samples`` larger than the stored count, as here, duplicates are
  guaranteed by pigeonhole).

The reference then indexes the ``num_samples`` returned dicts one by one into
network copies (``model_bnn.py:279-294``), inheriting both behaviors.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def _default_mcmc_precision() -> str:
    """Sampler matmul precision default, overridable per-process via
    ``ROBUSTBNNS_MCMC_PRECISION`` (read at import time, before any config is
    built). Round-5 precision study (PERFORMANCE.md): ``"high"`` (bf16_3x,
    three bf16 passes ≈ f32 accuracy) mixes statistically indistinguishably
    from full-f32 ``"highest"`` on the round-3 collapse repro — same adapted
    ε, O(1) inverse mass, interleaved posterior spreads across a 4-seed HMC
    sweep — at 1.65× the leapfrog throughput, so it is the default.
    Single-pass bf16 ``"default"`` collapses NUTS adaptation outright and
    degrades HMC acceptance; it stays an explicit opt-in."""
    import os

    val = os.environ.get("ROBUSTBNNS_MCMC_PRECISION", "high")
    if val not in ("default", "high", "highest"):
        raise ValueError(
            f"ROBUSTBNNS_MCMC_PRECISION={val!r}: expected one of "
            "'default' (1-pass bf16), 'high' (bf16_3x), 'highest' (f32)"
        )
    return val


MCMC_PRECISION_DEFAULT = _default_mcmc_precision()


class HMCConfig(NamedTuple):
    """Sampler knobs (reference defaults: ``model_bnn.py:73``, Pyro HMC).

    ``precision`` sets the matmul precision of every potential/gradient
    evaluation inside the sampler. Default ``"high"`` (bf16_3x; env override
    ``ROBUSTBNNS_MCMC_PRECISION``): XLA:TPU's single-pass bf16 ``"default"``
    matmuls inject enough Hamiltonian noise on sharp full-batch posteriors to
    collapse step-size/mass adaptation entirely (measured: a 5000-point chain
    froze at eps≈3e-8 with the Welford variance at its regularization floor;
    the identical run at ``"highest"`` mixes with eps≈4e-3 and O(1) mass —
    PERFORMANCE.md round 3), while the round-5 three-way study measured
    ``"high"`` statistically indistinguishable from ``"highest"`` at 1.65×
    the throughput. The Pyro/CPU reference runs full f32 — set
    ``"highest"`` (or the env var) for strict bit-level parity work;
    ``"default"`` opts into the fast path for experiments that tolerate it.
    """

    num_samples: int
    warmup: int
    step_size: float = 0.005
    num_steps: int = 10
    adapt_step_size: bool = True
    adapt_mass_matrix: bool = True
    target_accept: float = 0.8
    num_chains: int = 1
    precision: str = MCMC_PRECISION_DEFAULT


class HMCInfo(NamedTuple):
    accept_prob: jax.Array  # (S,) mean MH accept probability per draw
    step_size: jax.Array  # final (possibly adapted) step size
    inv_mass: jax.Array  # final diagonal inverse mass


def _leapfrog(potential_fn, q, p, step_size, inv_mass, num_steps):
    """Velocity-Verlet integration of Hamilton's equations, ``lax.scan``-rolled."""
    grad_u = jax.grad(potential_fn)

    p = p - 0.5 * step_size * grad_u(q)

    def body(carry, _):
        q, p = carry
        q = q + step_size * inv_mass * p
        g = grad_u(q)
        return (q, p - step_size * g), None

    # num_steps-1 full updates, then the final position update + half step.
    (q, p), _ = jax.lax.scan(body, (q, p), None, length=num_steps - 1)
    q = q + step_size * inv_mass * p
    p = p - 0.5 * step_size * jax.grad(potential_fn)(q)
    return q, p


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


def _hmc_transition(potential_fn, num_steps):
    def transition(q, key, step_size, inv_mass):
        k_mom, k_acc = jax.random.split(key)
        # momentum ~ N(0, M): sample in mass space.
        p = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(inv_mass)
        h0 = potential_fn(q) + _kinetic(p, inv_mass)
        q_new, p_new = _leapfrog(potential_fn, q, p, step_size, inv_mass, num_steps)
        h1 = potential_fn(q_new) + _kinetic(p_new, inv_mass)
        # Guard NaN/inf trajectories: treat as rejected.
        log_accept = jnp.where(jnp.isfinite(h1), h0 - h1, -jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
        accept = jax.random.uniform(k_acc) < accept_prob
        q = jnp.where(accept, q_new, q)
        return q, accept_prob

    return transition


def _find_reasonable_step_size(potential_fn, q, key, eps0, inv_mass):
    """Stan/Pyro's doubling-halving heuristic: scale ``eps`` by 2 until the
    one-step leapfrog acceptance crosses 1/2. Run before dual averaging so a
    wildly mis-scaled initial step (e.g. a 60k-point likelihood making the
    posterior razor sharp) cannot poison the adaptation — without this the
    averaged step collapses to ~0 and the chain never moves.
    """
    grad_u = jax.grad(potential_fn)
    p = jax.random.normal(key, q.shape, q.dtype) / jnp.sqrt(inv_mass)
    h0 = potential_fn(q) + _kinetic(p, inv_mass)

    def log_accept(eps):
        p1 = p - 0.5 * eps * grad_u(q)
        q1 = q + eps * inv_mass * p1
        p1 = p1 - 0.5 * eps * grad_u(q1)
        h1 = potential_fn(q1) + _kinetic(p1, inv_mass)
        la = h0 - h1
        return jnp.where(jnp.isfinite(la), la, -jnp.inf)

    la0 = log_accept(eps0)
    direction = jnp.where(la0 > jnp.log(0.5), 1.0, -1.0)

    def cond(state):
        eps, it = state
        la = log_accept(eps)
        # direction=+1: keep doubling while acceptance stays above 1/2;
        # direction=-1: keep halving while acceptance stays below 1/2.
        keep = direction * la > direction * jnp.log(0.5)
        return jnp.logical_and(keep, it < 60)

    def body(state):
        eps, it = state
        return eps * jnp.exp2(direction), it + 1.0

    eps, _ = jax.lax.while_loop(cond, body, (jnp.asarray(eps0, q.dtype), 0.0))
    # Clamp away from degenerate extremes.
    return jnp.clip(eps, 1e-10, 1e3)


def map_warm_start(
    potential_fn,
    init_q,
    data: tuple = (),
    *,
    steps: int = 200,
    lr: float = 1e-2,
):
    """Adam descent on the potential to a high-density start point.

    Plain fixed-trajectory HMC from a random init cannot reach the typical set
    of a sharp, high-dimensional posterior within a short warmup (observed:
    full-batch 60k-input chains stuck at their init). A few hundred Adam steps
    on ``U`` give a MAP-ish start the chain can actually explore from — the
    practical analogue of Pyro's informed init strategies.
    """
    import optax

    optimizer = optax.adam(lr)

    @partial(jax.jit, static_argnames=("raw_potential_fn",))
    def run(raw_potential_fn, data, q0):
        # Full-f32 matmuls for the same reason as the samplers (HMCConfig
        # docstring): the MAP point seeds an MCMC chain.
        with jax.default_matmul_precision("highest"):
            opt_state = optimizer.init(q0)

            def step(carry, _):
                q, opt_state = carry
                u, g = jax.value_and_grad(lambda q: raw_potential_fn(q, *data))(q)
                updates, opt_state = optimizer.update(g, opt_state, q)
                return (optax.apply_updates(q, updates), opt_state), u

            (q, _), us = jax.lax.scan(step, (q0, opt_state), None, length=steps)
            return q, us

    if data == () and not hasattr(potential_fn, "_rbnn_nullary"):
        fn = potential_fn
        shim = lambda q, *unused: fn(q)
        fn._rbnn_nullary = shim
    raw = potential_fn._rbnn_nullary if data == () and hasattr(potential_fn, "_rbnn_nullary") else potential_fn
    return run(raw, tuple(data), init_q)


def _dual_averaging_update(state, accept_prob, target, t):
    """Nesterov dual averaging on log step size (Stan/Pyro scheme)."""
    log_eps, log_eps_bar, h_bar, mu = state
    t = t + 1.0
    kappa, gamma, t0 = 0.75, 0.05, 10.0
    eta = 1.0 / (t + t0)
    h_bar = (1.0 - eta) * h_bar + eta * (target - accept_prob)
    log_eps = mu - jnp.sqrt(t) / gamma * h_bar
    w = t ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
    return (log_eps, log_eps_bar, h_bar, mu)


# --------------------------------------------------------------------------- #
# Chunked chain driver (the ONLY driver — ``chunk_size=None`` runs each warmup
# phase / the sampling phase as single scans). Bounding each device dispatch
# matters on the remote-TPU backend (it kills multi-minute dispatches; a
# full-batch 60k-input chain is ~1500 full-batch gradients ≈ minutes as one
# program). The key-split structure is chunk-invariant, so results are
# bit-identical for any chunk size up to XLA fusion rounding at chunk
# boundaries (tested).
#
# Warmup is Stan's windowed scheme (when both adaptations are on):
#   phase A (¼W): dual-averaging on eps, unit mass;
#   phase B (½W): dual-averaging continues, Welford variance accumulates;
#   mass switch:  inv_mass := regularized Welford variance (unit-mass fallback
#                 when the phase never moved), eps := find_reasonable_step_size
#                 under the NEW metric, fresh dual-averaging state;
#   phase C (¼W): dual-averaging re-adapts eps for the new mass.
# Without the re-anchoring, a sharp posterior whose unit-mass warmup barely
# moves drives the Welford variance to its regularization floor and the
# adapted step to ~0 — the sampling phase then freezes at one bit-identical
# position (observed on TPU; PERFORMANCE.md round 3).
# --------------------------------------------------------------------------- #


@partial(
    jax.jit, static_argnames=("raw_potential_fn", "adapt_step_size", "precision")
)
def _hmc_init(
    raw_potential_fn, data, init_q, key, step_size, adapt_step_size,
    precision="highest",
):
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        d = init_q.shape[0]
        inv_mass0 = jnp.ones((d,), init_q.dtype)
        key, k_find = jax.random.split(key)
        if adapt_step_size:
            # Guard against a catastrophically-large initial step: rescale
            # until a single leapfrog step has ~1/2 acceptance (Stan/Pyro's
            # heuristic), but never RAISE the user's step — one-step
            # acceptance overestimates what a full trajectory tolerates, and
            # dual averaging can grow the step during warmup anyway.
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
        "raw_potential_fn", "chunk_len", "num_steps",
        "adapt_step_size", "welford_on", "precision",
    ),
)
def _hmc_warmup_chunk(
    raw_potential_fn, data, carry, it0, chunk_len, step_size,
    num_steps, adapt_step_size, welford_on, target_accept, precision="highest",
):
    """``chunk_len`` warmup transitions. ``welford_on`` marks the
    mass-estimation window (phase B); ``it0`` is the phase-local iteration
    index feeding dual averaging."""
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        transition = _hmc_transition(potential_fn, num_steps)

        def warmup_step(carry, it):
            q, k, da, wf, inv_mass = carry
            k, k_t = jax.random.split(k)
            eps = jnp.exp(da[0]) if adapt_step_size else jnp.asarray(step_size)
            q, accept_prob = transition(q, k_t, eps, inv_mass)
            if adapt_step_size:
                da = _dual_averaging_update(da, accept_prob, target_accept, it)
            if welford_on:
                mean, m2, count = wf
                new_count = count + 1.0
                delta = q - mean
                new_mean = mean + delta / new_count
                new_m2 = m2 + delta * (q - new_mean)
                wf = (new_mean, new_m2, new_count)
            return (q, k, da, wf, inv_mass), accept_prob

        carry, _ = jax.lax.scan(warmup_step, carry, it0 + jnp.arange(chunk_len))
        return carry


@partial(
    jax.jit,
    static_argnames=("raw_potential_fn", "adapt_step_size", "precision"),
)
def _mass_switch(
    raw_potential_fn, data, q, key, da, wf, adapt_step_size, precision="highest"
):
    """End of the Welford window: install the estimated diagonal mass and
    re-anchor step-size adaptation under the new metric (fresh dual-averaging
    state seeded by ``find_reasonable_step_size``). Degenerate variance (a
    window that never moved) falls back to unit mass instead of freezing the
    chain at the regularization floor."""
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        mean, m2, count = wf
        var = m2 / jnp.maximum(count - 1.0, 1.0)
        n = jnp.maximum(count, 1.0)
        var = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * 1e-3  # Stan shrinkage
        degenerate = jnp.logical_or(count <= 1.0, jnp.max(m2) <= 0.0)
        inv_mass = jnp.where(degenerate, jnp.ones_like(var), var)
        if adapt_step_size:
            eps_f = _find_reasonable_step_size(
                potential_fn, q, key, jnp.exp(da[1]), inv_mass
            )
            da = (
                jnp.log(eps_f), jnp.log(eps_f), jnp.zeros(()),
                jnp.log(10.0 * eps_f),
            )
        return da, inv_mass


@partial(
    jax.jit,
    static_argnames=("raw_potential_fn", "chunk_len", "num_steps", "precision"),
)
def _hmc_sample_chunk(
    raw_potential_fn, data, q, key, final_eps, inv_mass, chunk_len, num_steps,
    precision="highest",
):
    with jax.default_matmul_precision(precision):
        potential_fn = lambda q: raw_potential_fn(q, *data)
        transition = _hmc_transition(potential_fn, num_steps)

        def sample_step(carry, _):
            q, k = carry
            k, k_t = jax.random.split(k)
            q, accept_prob = transition(q, k_t, final_eps, inv_mass)
            return (q, k), (q, accept_prob)

        (q, key), outs = jax.lax.scan(
            sample_step, (q, key), None, length=chunk_len
        )
        return (q, key), outs


def warmup_phase_lengths(warmup, adapt_step_size, adapt_mass_matrix):
    """(init-buffer, mass-window, term-buffer) split of the warmup budget.

    Stan's proportions (¼, ½, ¼) when both adaptations run; the whole budget
    is one step-size phase without mass adaptation; the legacy half/half split
    when only the mass adapts (no step re-anchoring possible).
    """
    if warmup <= 0 or not adapt_mass_matrix:
        return warmup, 0, 0
    if adapt_step_size:
        w1 = warmup // 4
        w3 = warmup // 4
        return w1, warmup - w1 - w3, w3
    w1 = warmup // 2
    return w1, warmup - w1, 0


def _heartbeat(tag, done, total, sync_leaf):
    """Env-gated per-chunk progress line for long chained dispatches.

    ``ROBUSTBNNS_MCMC_HEARTBEAT=1`` prints one stderr line per chunk, synced
    via a scalar host transfer of ``sum(sync_leaf)`` (``block_until_ready``
    is unreliable on the remote-TPU backend), so stall-guarded sweep runners
    (``scripts/stall_guard.sh``) can tell a healthy long cell apart from a
    dispatch wedged in the tunnel. Off by default: the sync point serializes
    chunk dispatch, which only matters when chunks are tiny.
    """
    import os
    import sys
    import time

    if os.environ.get("ROBUSTBNNS_MCMC_HEARTBEAT") != "1":
        return
    val = float(jnp.sum(sync_leaf))
    print(
        f"[mcmc {time.strftime('%H:%M:%S')}] {tag} {done}/{total}"
        f" sync={val:.3e}",
        file=sys.stderr, flush=True,
    )


def run_windowed_warmup(
    warmup_chunk, mass_switch, warm_carry, config, chunk_size
):
    """Drive the windowed warmup host-side in bounded chunks.

    ``warmup_chunk(carry, it0, n, welford_on)`` runs ``n`` transitions;
    ``mass_switch(q, key, da, wf)`` installs the mass and re-anchors eps.
    Chunks never span phase boundaries, so chunking is bit-invariant.
    Returns the final ``(q, key, da, wf, inv_mass)`` carry.
    """
    warmup = config.warmup
    adapt_eps = config.adapt_step_size and warmup > 0
    adapt_mass = config.adapt_mass_matrix and warmup > 0
    C = chunk_size or max(warmup, config.num_samples, 1)

    def phase(carry, length, welford_on, it_start=0):
        # ``it_start`` keeps the dual-averaging iteration counter continuous
        # across the init buffer and mass window (Stan's behavior) — resetting
        # it mid-adaptation would snap log_eps back toward mu and reweight the
        # Robbins-Monro averages. It restarts at 0 only after the mass switch,
        # where the dual-averaging state is legitimately re-initialized.
        it = 0
        while it < length:
            n = min(C, length - it)
            carry = warmup_chunk(
                carry, jnp.asarray(it_start + it, jnp.int32), n, welford_on
            )
            it += n
            _heartbeat("warmup", it_start + it, warmup, carry[0])
        return carry

    w1, w2, w3 = warmup_phase_lengths(warmup, adapt_eps, adapt_mass)
    carry = phase(warm_carry, w1, False)
    if adapt_mass:
        carry = phase(carry, w2, True, it_start=w1)
        q, k, da, wf, _ = carry
        k, k_ms = jax.random.split(k)
        da, inv_mass = mass_switch(q, k_ms, da, wf)
        d = q.shape[0]
        welford_reset = (
            jnp.zeros((d,), q.dtype), jnp.zeros((d,), q.dtype), 0.0
        )
        carry = phase((q, k, da, welford_reset, inv_mass), w3, False)
    return carry


def _run_hmc_chain_chunked(raw_fn, data, init_q, key, config, chunk_size):
    num_samples, warmup = config.num_samples, config.warmup
    adapt_eps = config.adapt_step_size and warmup > 0
    prec = config.precision
    C = chunk_size or max(warmup, num_samples, 1)

    warm_carry, sample_key = _hmc_init(
        raw_fn, data, init_q, key, config.step_size, adapt_eps, precision=prec
    )

    def warmup_chunk(carry, it0, n, welford_on):
        return _hmc_warmup_chunk(
            raw_fn, data, carry, it0, n, config.step_size, config.num_steps,
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
        carry, outs = _hmc_sample_chunk(
            raw_fn, data, carry[0], carry[1], final_eps, inv_mass, n,
            config.num_steps, precision=prec,
        )
        chunks.append(outs)
        done += n
        _heartbeat("hmc-sample", done, num_samples, carry[0])

    samples, accept_probs = (
        jnp.concatenate([c[i] for c in chunks]) for i in range(2)
    )
    return samples, HMCInfo(accept_probs, final_eps, inv_mass)


def hmc_sample(
    potential_fn: Callable,
    init_position: jax.Array,
    key: jax.Array,
    config: HMCConfig,
    data: tuple = None,
    chunk_size: int = None,
):
    """Run HMC on a flat position vector.

    ``potential_fn`` is either ``U(q)`` (pass ``data=None``) or
    ``U(q, *data)`` with ``data`` a tuple of traced arrays — the latter lets
    repeated calls over same-shaped data reuse one compiled chain.

    Returns ``(samples, info)`` — ``samples`` has shape ``(num_samples, D)``
    for one chain or ``(num_chains, num_samples, D)`` for several; chains run
    as a single vmapped (batched) program.

    ``chunk_size`` (env default ``ROBUSTBNNS_HMC_CHUNK``) bounds warmup
    iterations / draws per device dispatch for big full-batch chains on the
    remote backend (see :mod:`robustbnns_tpu.inference.nuts` for the
    motivating failure); ``None`` runs each phase as one scan. The key stream
    is chunk-invariant; values may drift in the last float bits across chunk
    boundaries.
    """
    import os

    if chunk_size is None and os.environ.get("ROBUSTBNNS_HMC_CHUNK"):
        chunk_size = int(os.environ["ROBUSTBNNS_HMC_CHUNK"])
    if chunk_size is not None and chunk_size < 1:
        # 0 is falsy, so the chunked driver would silently treat it as "no
        # chunking" (C = chunk_size or ...) — reject the ambiguity loudly.
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if data is None:
        # Cache the nullary shim ON the function so the jit cache still hits
        # across calls with the same potential.
        if not hasattr(potential_fn, "_rbnn_nullary"):
            fn = potential_fn
            shim = lambda q, *unused: fn(q)
            fn._rbnn_nullary = shim
        potential_fn = potential_fn._rbnn_nullary
        data = ()
    run = lambda q0, k: _run_hmc_chain_chunked(
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


def hmc_train_batched(
    potential_fn: Callable,  # U(q, x, labels)
    batches,  # iterable of (x, labels)
    init_position: jax.Array,
    key: jax.Array,
    *,
    n_samples: int,
    warmup: int,
    step_size: float = 0.005,
    num_steps: int = 10,
    mode: str = "faithful",
    num_chains: int = 1,
    sampler: str = "hmc",
    verbose: bool = True,
):
    """The reference's training driver semantics (``model_bnn.py:260-301``).

    ``mode='faithful'``: run warmup+sampling once per batch (each run starts
    from the previous run's final position — Pyro's kernel keeps its state);
    keep only the LAST batch's ``n_samples//num_batches + 1`` draws and
    resample **with replacement** up to ``n_samples`` (what
    ``mcmc.get_samples(n_samples)`` does after the loop since each ``run``
    replaced the samples).

    ``mode='full'``: concatenate all batches into one dataset and run a single
    proper chain (the ``test_multimodal.py:72-74`` configuration).

    ``sampler='nuts'`` swaps the fixed-trajectory kernel for the No-U-Turn
    sampler (:mod:`robustbnns_tpu.inference.nuts`) in either mode — the
    principled fix for sharp posteriors where 10-step HMC cannot mix;
    ``num_steps`` is then ignored.
    """
    batches = list(batches)
    num_batches = len(batches)

    def make_cfg(num_samples):
        if sampler == "nuts":
            from robustbnns_tpu.inference.nuts import NUTSConfig

            return NUTSConfig(
                num_samples=num_samples,
                warmup=warmup,
                step_size=step_size,
                num_chains=num_chains,
            )
        if sampler != "hmc":
            raise ValueError(f"unknown sampler {sampler!r}")
        return HMCConfig(
            num_samples=num_samples,
            warmup=warmup,
            step_size=step_size,
            num_steps=num_steps,
            num_chains=num_chains,
        )

    def run_sampler(q0, k, cfg, data):
        if sampler == "nuts":
            from robustbnns_tpu.inference.nuts import nuts_sample

            return nuts_sample(potential_fn, q0, k, cfg, data=data)
        return hmc_sample(potential_fn, q0, k, cfg, data=data)

    if mode == "full":
        xs = jnp.concatenate([b[0] for b in batches])
        ys = jnp.concatenate([b[1] for b in batches])
        return run_sampler(init_position, key, make_cfg(n_samples), (xs, ys))

    if mode != "faithful":
        raise ValueError(f"unknown HMC training mode {mode!r}")

    batch_samples = n_samples // num_batches + 1
    cfg = make_cfg(batch_samples)
    q = init_position
    samples, info = None, None
    for i, (x, labels) in enumerate(batches):
        key, k_run = jax.random.split(key)
        samples, info = run_sampler(q, k_run, cfg, (x, labels))
        q = samples[-1] if cfg.num_chains == 1 else samples[:, -1]
        if verbose:
            acc_arr = getattr(info, "accept_prob", None)
            if acc_arr is None:
                acc_arr = info.accept_stat
            acc = float(jnp.mean(acc_arr))
            print(
                f"[{sampler.upper()} batch {i + 1}/{num_batches}] "
                f"{batch_samples} draws, mean accept {acc:.2f}, "
                f"step {float(jnp.mean(info.step_size)):.2e}"  # (C,) when chains>1
            )

    # get_samples(n_samples) with fewer stored draws resamples with replacement.
    key, k_idx = jax.random.split(key)
    stored = samples.shape[0] if cfg.num_chains == 1 else samples.shape[1]
    idx = jax.random.randint(k_idx, (n_samples,), 0, stored)
    out = samples[idx] if cfg.num_chains == 1 else samples[:, idx]
    return out, info
