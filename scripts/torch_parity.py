"""Cross-framework accuracy parity: reference math in torch vs robustbnns_tpu.

VERDICT round-1 item 5 / BASELINE accuracy north-star evidence. Pyro is not
installable on this box, but torch is — so this script reimplements the
reference's *exact* math (not its architecture) in plain torch:

* mean-field SVI with the reference's guide init ``loc, rho ~ randn``
  (``model_bnn.py:125-126``), ``TraceMeanField_ELBO`` = analytic N‖N(0,1) KL
  + single-draw categorical log-likelihood summed over the batch, unscaled KL
  (``model_bnn.py:105-136,303-325``), Adam;
* posterior-predictive forward = mean of per-draw softmax probabilities,
  seeded draws for evaluation (``model_bnn.py:198-258,367-391``);
* FGSM ε=0.3 / PGD (0.5, 2/225, 40) with the probability-CE quirk
  (``adversarialAttacks.py:69-108`` — ``CrossEntropyLoss`` applied to averaged
  *probabilities*), fresh posterior draws per attack forward;
* ``attack_evaluation`` with seed-0 defence draws + double-softmax robustness
  (``adversarialAttacks.py:151-198,30-62``);
* expected loss gradients with fixed per-sample seeds reused across images
  (``lossGradients.py:20-40``).

Both stacks train on the SAME real Half Moons arrays (sklearn ``make_moons``
— real data, available offline; ``utils.py:67-92`` preprocessing), config =
BASELINE parity config 1 (fc2, hidden=32, leaky, SVI). RNG streams cannot be
shared across frameworks, so parity is statistical: clean/adversarial
accuracy, softmax robustness and expected-gradient norms are compared within
tolerances and the raw deltas are recorded to ``data/torch_parity.json``.

The torch attack/gradient loops are batched rather than per-image
(``adversarialAttacks.py:118`` loops one image at a time): CE with sum
reduction has a block-diagonal input Jacobian, so per-image gradients — and
therefore sign-step attacks and expected gradients — are identical; only
wall-clock differs, which this script does not measure.

Run: ``python scripts/torch_parity.py`` (~2-4 min, CPU only; ``--quick`` for
the smoke-sized variant used in tests).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIG = dict(
    hidden=32, n_inputs=10000, epochs=30, lr=0.01, batch=64,
    eval_n=1000, pgd_n=500, grads_n=200, grads_samples=(10, 50), seeds=5,
)
QUICK = dict(
    hidden=32, n_inputs=1024, epochs=3, lr=0.01, batch=64,
    eval_n=128, pgd_n=32, grads_n=32, grads_samples=(5,), seeds=1,
)

TOLERANCES = dict(
    clean_acc=2.0,        # percentage points
    fgsm_adv_acc=3.0,
    pgd_adv_acc=3.0,
    softmax_rob=0.10,
    grad_norm_ratio=(0.5, 2.0),
)


# --------------------------------------------------------------------------- #
# torch reference-math stack
# --------------------------------------------------------------------------- #


def run_torch(cfg, x_train, y_train, x_eval, y_eval, seed=0):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    h, in_size, out = cfg["hidden"], 2, 2
    shapes = [(h, in_size), (h,), (h, h), (h,), (out, h), (out,)]
    locs = [torch.randn(s, requires_grad=True) for s in shapes]
    rhos = [torch.randn(s, requires_grad=True) for s in shapes]

    def net(ws, x):  # fc2, leaky (model_nn.py:84-91)
        z = F.leaky_relu(F.linear(x.flatten(1), ws[0], ws[1]))
        z = F.leaky_relu(F.linear(z, ws[2], ws[3]))
        return F.linear(z, ws[4], ws[5])

    def draw():  # guide rsample: w = loc + softplus(rho)·eps (model_bnn.py:127)
        return [l + F.softplus(r) * torch.randn_like(l) for l, r in zip(locs, rhos)]

    def forward(x, n_samples, seeds=None):
        # probability averaging over guide draws (model_bnn.py:230-257)
        preds = []
        for i in range(n_samples):
            if seeds is not None:
                torch.manual_seed(seeds[i])
            preds.append(F.softmax(net(draw(), x), dim=-1))
        return torch.stack(preds).mean(0)

    xt = torch.from_numpy(x_train)
    yt = torch.from_numpy(y_train).argmax(-1)

    # --- SVI training: unscaled KL + batch-summed 1-draw loglik ------------- #
    # Per-epoch shuffles, matching svi_train's permutation (the reference's
    # DataLoader(shuffle=True) path, utils.py:30-31).
    opt = torch.optim.Adam(locs + rhos, lr=cfg["lr"])
    for _ in range(cfg["epochs"]):
        perm = torch.randperm(len(xt))
        xs, ys = xt[perm], yt[perm]
        for b in range(0, len(xs), cfg["batch"]):
            xb, yb = xs[b : b + cfg["batch"]], ys[b : b + cfg["batch"]]
            opt.zero_grad()
            logits = net(draw(), xb)
            loglik = -F.cross_entropy(logits, yb, reduction="sum")
            kl = sum(
                (0.5 * (F.softplus(r) ** 2 + l**2 - 1.0)
                 - torch.log(F.softplus(r))).sum()
                for l, r in zip(locs, rhos)
            )
            (kl - loglik).backward()
            opt.step()

    locs = [l.detach() for l in locs]
    rhos = [r.detach() for r in rhos]

    xe = torch.from_numpy(x_eval)
    labels = torch.from_numpy(y_eval).argmax(-1)

    # Posterior diagnostics: systematic ELBO-optimization differences would
    # show up here even when accuracy deltas are basin noise.
    with torch.no_grad():
        numel = sum(l.numel() for l in locs)
        mean_scale = sum(F.softplus(r).sum() for r in rhos).item() / numel
        mean_abs_loc = sum(l.abs().sum() for l in locs).item() / numel
        out = forward(torch.from_numpy(x_train), 10, seeds=list(range(10)))
        yt_all = torch.from_numpy(y_train).argmax(-1)
        train_loglik = (
            torch.log(out.gather(-1, yt_all[:, None]).clamp_min(1e-12))
            .mean().item()
        )

    # --- evaluation: seeded draws 0..9 (model_bnn.py:373-376) --------------- #
    with torch.no_grad():
        out = forward(xe, 10, seeds=list(range(10)))
        clean_acc = 100.0 * (out.argmax(-1) == labels).float().mean().item()

    def prob_ce_grad(x, y):
        # CrossEntropyLoss applied to averaged PROBABILITIES — the reference
        # quirk (adversarialAttacks.py:74-77). Sum reduction: per-image grads
        # identical to the reference's one-image loop.
        x = x.clone().requires_grad_(True)
        loss = F.cross_entropy(forward(x, 10), y, reduction="sum")
        loss.backward()
        return x.grad.data

    torch.manual_seed(seed + 1)  # attack-time fresh-draw stream
    # FGSM ε=0.3 (adversarialAttacks.py:69-83)
    g = prob_ce_grad(xe, labels)
    x_fgsm = torch.clamp(xe + 0.3 * g.sign(), 0, 1)

    # PGD defaults (0.5, 2/225, 40) (adversarialAttacks.py:91)
    n_pgd = cfg["pgd_n"]
    xp, yp = xe[:n_pgd], labels[:n_pgd]
    image, eps, alpha = xp.clone(), 0.5, 2.0 / 225.0
    for _ in range(40):
        g = prob_ce_grad(image, yp)
        image = torch.clamp(
            xp + torch.clamp(image + alpha * g.sign() - xp, -eps, eps), 0, 1
        ).detach()
    x_pgd = image

    # --- attack_evaluation: seed-0 defence draws, double softmax ----------- #
    def evaluate(x_clean, x_adv, y):
        torch.manual_seed(0)  # pyro.set_rng_seed(0) (adversarialAttacks.py:160)
        with torch.no_grad():
            o, a = forward(x_clean, 10), forward(x_adv, 10)
            acc0 = 100.0 * (o.argmax(-1) == y).float().mean().item()
            acc1 = 100.0 * (a.argmax(-1) == y).float().mean().item()
            diff = (F.softmax(a, -1) - F.softmax(o, -1)).abs().amax(-1)
            return acc0, acc1, (1.0 - diff).mean().item()

    _, fgsm_acc, fgsm_rob = evaluate(xe, x_fgsm, labels)
    _, pgd_acc, pgd_rob = evaluate(xp, x_pgd, yp)

    # --- expected loss gradients: fixed seeds reused across images --------- #
    grad_norms = {}
    ng = cfg["grads_n"]
    xg, yg = xe[:ng], labels[:ng]
    for S in cfg["grads_samples"]:
        per_draw = []
        for i in range(S):
            x = xg.clone().requires_grad_(True)
            torch.manual_seed(i)  # seeds=[i] (lossGradients.py:33)
            probs = F.softmax(net(draw(), x), dim=-1)
            F.cross_entropy(probs, yg, reduction="sum").backward()
            per_draw.append(x.grad.data)
        g = torch.stack(per_draw).mean(0).flatten(1)
        grad_norms[S] = g.norm(dim=-1).mean().item()

    return dict(
        clean_acc=clean_acc, fgsm_adv_acc=fgsm_acc, fgsm_rob=fgsm_rob,
        pgd_adv_acc=pgd_acc, pgd_rob=pgd_rob,
        grad_norms={str(k): v for k, v in grad_norms.items()},
        mean_scale=mean_scale, mean_abs_loc=mean_abs_loc,
        train_loglik=train_loglik,
    )


# --------------------------------------------------------------------------- #
# HMC mode: the grid-search engine (reference _train_hmc, model_bnn.py:260-301)
# --------------------------------------------------------------------------- #

HMC_CONFIG = dict(
    hidden=32, n_inputs=10000, n_samples=250, warmup=100, step_size=0.001,
    num_steps=10, batch=1024, eval_n=1000, grads_n=200, grads_samples=(10, 50),
    seeds=3,
)
HMC_QUICK = dict(
    hidden=32, n_inputs=1024, n_samples=20, warmup=20, step_size=0.001,
    num_steps=10, batch=512, eval_n=128, grads_n=32, grads_samples=(5,),
    seeds=1,
)


def run_torch_hmc(cfg, x_train, y_train, x_eval, y_eval, seed=0):
    """Faithful batched HMC in plain torch: per-batch warmup+sampling runs
    with chain carry-over, dual-averaged step size (find-reasonable guard,
    clamped to never raise the configured step), Welford diagonal mass over
    the second half of warmup, final-batch draws resampled with replacement
    (the Pyro ``get_samples(n)`` semantics, see inference/hmc.py docstring)."""
    import math

    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    h = cfg["hidden"]
    shapes = [(h, 2), (h,), (h, h), (h,), (2, h), (2,)]
    sizes = [int(np.prod(s)) for s in shapes]
    d = sum(sizes)

    def unpack(q):
        out, i = [], 0
        for s, n in zip(shapes, sizes):
            out.append(q[i : i + n].view(s))
            i += n
        return out

    def net(q, x):
        ws = unpack(q)
        z = F.leaky_relu(F.linear(x.flatten(1), ws[0], ws[1]))
        z = F.leaky_relu(F.linear(z, ws[2], ws[3]))
        return F.linear(z, ws[4], ws[5])

    def grad_U(q, x, yl):
        qq = q.detach().requires_grad_(True)
        logits = net(qq, x)
        ll = -F.cross_entropy(logits, yl, reduction="sum")
        (0.5 * torch.sum(qq * qq) - ll).backward()
        return qq.grad

    def U(q, x, yl):
        with torch.no_grad():
            ll = -F.cross_entropy(net(q, x), yl, reduction="sum")
            return 0.5 * torch.sum(q * q) - ll

    def leapfrog(q, p, eps, inv_mass, x, yl):
        p = p - 0.5 * eps * grad_U(q, x, yl)
        for _ in range(cfg["num_steps"] - 1):
            q = q + eps * inv_mass * p
            p = p - eps * grad_U(q, x, yl)
        q = q + eps * inv_mass * p
        p = p - 0.5 * eps * grad_U(q, x, yl)
        return q, p

    def transition(q, eps, inv_mass, x, yl):
        p = torch.randn(d) / torch.sqrt(inv_mass)
        h0 = U(q, x, yl) + 0.5 * torch.sum(p * p * inv_mass)
        q1, p1 = leapfrog(q.clone(), p, eps, inv_mass, x, yl)
        h1 = U(q1, x, yl) + 0.5 * torch.sum(p1 * p1 * inv_mass)
        la = (h0 - h1) if torch.isfinite(h1) else torch.tensor(-math.inf)
        a = min(1.0, float(torch.exp(la)))
        if float(torch.rand(())) < a:
            q = q1
        return q, a

    def run_chain(q, x, yl, n_draws):
        inv_mass = torch.ones(d)
        # find-reasonable, clamped to never raise the configured step
        eps = cfg["step_size"]
        mu = math.log(10.0 * eps)
        log_eps = log_eps_bar = math.log(eps)
        h_bar = 0.0
        mean = torch.zeros(d)
        m2 = torch.zeros(d)
        count = 0.0
        warm = cfg["warmup"]
        for it in range(warm):
            q, a = transition(q, math.exp(log_eps), inv_mass, x, yl)
            t = it + 1.0
            eta = 1.0 / (t + 10.0)
            h_bar = (1 - eta) * h_bar + eta * (0.8 - a)
            log_eps = mu - math.sqrt(t) / 0.05 * h_bar
            w = t ** (-0.75)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
            if it >= warm // 2:
                count += 1.0
                delta = q - mean
                mean = mean + delta / count
                m2 = m2 + delta * (q - mean)
        if count > 1.0:
            var = m2 / max(count - 1.0, 1.0)
            inv_mass = (count / (count + 5.0)) * var + (5.0 / (count + 5.0)) * 1e-3
        final_eps = math.exp(log_eps_bar)
        draws = []
        for _ in range(n_draws):
            q, _ = transition(q, final_eps, inv_mass, x, yl)
            draws.append(q.clone())
        return q, draws

    xt = torch.from_numpy(x_train)
    yt = torch.from_numpy(y_train).argmax(-1)
    nb = max(int(len(xt) / cfg["batch"]), 1)  # reference int division :265
    batch_samples = cfg["n_samples"] // nb + 1
    q = torch.randn(d) * 0.1
    draws = []
    for b in range(nb):
        xb = xt[b * cfg["batch"] : (b + 1) * cfg["batch"]]
        yb = yt[b * cfg["batch"] : (b + 1) * cfg["batch"]]
        q, draws = run_chain(q, xb, yb, batch_samples)
    idx = torch.randint(0, len(draws), (cfg["n_samples"],))
    posterior = torch.stack([draws[i] for i in idx])  # (S, d)

    S = cfg["n_samples"]
    xe = torch.from_numpy(x_eval)
    labels = torch.from_numpy(y_eval).argmax(-1)

    def forward(x, n_samples):
        with torch.no_grad():
            probs = [F.softmax(net(posterior[i], x), -1) for i in range(n_samples)]
            return torch.stack(probs).mean(0)

    out = forward(xe, S)
    clean_acc = 100.0 * (out.argmax(-1) == labels).float().mean().item()

    # FGSM ε=0.3 with probability-CE over the S-draw mean (grid_attack path)
    x = xe.clone().requires_grad_(True)
    probs = torch.stack(
        [F.softmax(net(posterior[i], x), -1) for i in range(S)]
    ).mean(0)
    F.cross_entropy(probs, labels, reduction="sum").backward()
    x_fgsm = torch.clamp(xe + 0.3 * x.grad.data.sign(), 0, 1)

    with torch.no_grad():
        o, a = forward(xe, S), forward(x_fgsm, S)
        fgsm_acc = 100.0 * (a.argmax(-1) == labels).float().mean().item()
        diff = (F.softmax(a, -1) - F.softmax(o, -1)).abs().amax(-1)
        fgsm_rob = (1.0 - diff).mean().item()

    grad_norms = {}
    ng = cfg["grads_n"]
    xg, yg = xe[:ng], labels[:ng]
    for Sg in cfg["grads_samples"]:
        per_draw = []
        for i in range(Sg):
            x = xg.clone().requires_grad_(True)
            p = F.softmax(net(posterior[i], x), -1)
            F.cross_entropy(p, yg, reduction="sum").backward()
            per_draw.append(x.grad.data)
        g = torch.stack(per_draw).mean(0).flatten(1)
        grad_norms[str(Sg)] = g.norm(dim=-1).mean().item()

    spread = posterior.std(0).mean().item()
    return dict(
        clean_acc=clean_acc, fgsm_adv_acc=fgsm_acc, fgsm_rob=fgsm_rob,
        grad_norms=grad_norms, mean_abs_param=posterior.abs().mean().item(),
        sample_spread=spread,
    )


def run_jax_hmc(cfg, x_train, y_train, x_eval, y_eval, seed=0):
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.analysis.gradients import expected_loss_gradients
    from robustbnns_tpu.attacks.gradient_attacks import attack, attack_evaluation
    from robustbnns_tpu.experiments.grid_search import moons_config
    from robustbnns_tpu.models.bnn import BNN

    config = moons_config(
        cfg["hidden"], "leaky", "fc2", "hmc", None, None,
        cfg["n_samples"], cfg["warmup"],
    )
    bnn = BNN.from_config(
        config, input_shape=x_train.shape[1:], output_size=2,
        n_inputs=cfg["n_inputs"],
    )
    bnn.train(
        x_train, y_train, batch_size=cfg["batch"], seed=seed,
        hmc_mode="faithful", verbose=False,
    )

    S = cfg["n_samples"]
    clean_acc = bnn.evaluate(
        x_eval, y_eval, n_samples=S, seeds=list(range(S)), verbose=False
    )
    x_fgsm = attack(
        bnn, x_eval, y_eval, method="fgsm", epsilon=0.3, n_samples=S,
        key=jax.random.key(seed + 1), save=False, verbose=False,
    )
    _, fgsm_acc, fgsm_rob = attack_evaluation(
        bnn, x_eval, x_fgsm, y_eval, n_samples=S, verbose=False
    )

    grad_norms = {}
    ng = cfg["grads_n"]
    for Sg in cfg["grads_samples"]:
        g = np.asarray(
            expected_loss_gradients(bnn, x_eval[:ng], y_eval[:ng], n_samples=Sg)
        ).reshape(ng, -1)
        grad_norms[str(Sg)] = float(np.mean(np.linalg.norm(g, axis=-1)))

    flat = np.concatenate(
        [np.asarray(x).reshape(S, -1) for x in jax.tree_util.tree_leaves(bnn.samples)],
        axis=-1,
    )
    return dict(
        clean_acc=float(clean_acc), fgsm_adv_acc=float(fgsm_acc),
        fgsm_rob=float(np.mean(fgsm_rob)), grad_norms=grad_norms,
        mean_abs_param=float(np.abs(flat).mean()),
        sample_spread=float(flat.std(0).mean()),
    )


def seed_median_hmc(results):
    out = {}
    for k in ("clean_acc", "fgsm_adv_acc", "fgsm_rob", "mean_abs_param",
              "sample_spread"):
        out[k] = float(np.median([r[k] for r in results]))
    out["grad_norms"] = {
        S: float(np.median([r["grad_norms"][S] for r in results]))
        for S in results[0]["grad_norms"]
    }
    return out


def compare_hmc(torch_res, jax_res, tol=TOLERANCES):
    deltas, checks = {}, {}
    for k, t in (("clean_acc", tol["clean_acc"]),
                 ("fgsm_adv_acc", tol["fgsm_adv_acc"])):
        deltas[k] = jax_res[k] - torch_res[k]
        checks[k] = abs(deltas[k]) <= t
    deltas["fgsm_rob"] = jax_res["fgsm_rob"] - torch_res["fgsm_rob"]
    checks["fgsm_rob"] = abs(deltas["fgsm_rob"]) <= tol["softmax_rob"]
    lo, hi = tol["grad_norm_ratio"]
    for S, tv in torch_res["grad_norms"].items():
        ratio = jax_res["grad_norms"][S] / tv if tv else float("inf")
        deltas[f"grad_norm_ratio_S{S}"] = ratio
        checks[f"grad_norm_S{S}"] = lo <= ratio <= hi
    return deltas, checks


# --------------------------------------------------------------------------- #
# robustbnns_tpu stack
# --------------------------------------------------------------------------- #


def run_jax(cfg, x_train, y_train, x_eval, y_eval, seed=0):
    import jax

    from robustbnns_tpu.analysis.gradients import expected_loss_gradients
    from robustbnns_tpu.attacks.gradient_attacks import attack, attack_evaluation
    from robustbnns_tpu.experiments.grid_search import moons_config
    from robustbnns_tpu.models.bnn import BNN

    config = moons_config(
        cfg["hidden"], "leaky", "fc2", "svi", cfg["epochs"], cfg["lr"], None, None
    )
    bnn = BNN.from_config(
        config, input_shape=x_train.shape[1:], output_size=2,
        n_inputs=cfg["n_inputs"],
    )
    bnn.train(x_train, y_train, batch_size=cfg["batch"], seed=seed, verbose=False)

    import jax.numpy as jnp

    post = bnn.posterior
    scales = jax.tree_util.tree_map(jax.nn.softplus, post.rho)
    numel = sum(x.size for x in jax.tree_util.tree_leaves(post.loc))
    mean_scale = (
        sum(float(jnp.sum(s)) for s in jax.tree_util.tree_leaves(scales)) / numel
    )
    mean_abs_loc = (
        sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(post.loc))
        / numel
    )
    fwd = bnn.predictive_fn(n_samples=10, seeds=list(range(10)))
    from robustbnns_tpu.predict import batched_eval

    probs, _ = batched_eval(fwd, x_train, y_train, batch_size=1024)
    yt_all = jnp.argmax(jnp.asarray(y_train), axis=-1)
    train_loglik = float(
        jnp.mean(jnp.log(jnp.clip(
            jnp.take_along_axis(jnp.asarray(probs), yt_all[:, None], axis=-1),
            1e-12, None,
        )))
    )

    clean_acc = bnn.evaluate(x_eval, y_eval, n_samples=10, verbose=False)

    x_fgsm = attack(
        bnn, x_eval, y_eval, method="fgsm", epsilon=0.3, n_samples=10,
        key=jax.random.key(seed + 1), save=False, verbose=False,
    )
    _, fgsm_acc, fgsm_rob = attack_evaluation(
        bnn, x_eval, x_fgsm, y_eval, n_samples=10, verbose=False
    )

    n_pgd = cfg["pgd_n"]
    xp, yp = x_eval[:n_pgd], y_eval[:n_pgd]
    x_pgd = attack(
        bnn, xp, yp, method="pgd", epsilon=None, n_samples=10,
        key=jax.random.key(seed + 2), save=False, verbose=False,
    )
    _, pgd_acc, pgd_rob = attack_evaluation(
        bnn, xp, x_pgd, yp, n_samples=10, verbose=False
    )

    grad_norms = {}
    ng = cfg["grads_n"]
    for S in cfg["grads_samples"]:
        g = np.asarray(
            expected_loss_gradients(bnn, x_eval[:ng], y_eval[:ng], n_samples=S)
        ).reshape(ng, -1)
        grad_norms[str(S)] = float(np.mean(np.linalg.norm(g, axis=-1)))

    return dict(
        clean_acc=float(clean_acc), fgsm_adv_acc=float(fgsm_acc),
        fgsm_rob=float(np.mean(fgsm_rob)), pgd_adv_acc=float(pgd_acc),
        pgd_rob=float(np.mean(pgd_rob)), grad_norms=grad_norms,
        mean_scale=mean_scale, mean_abs_loc=mean_abs_loc,
        train_loglik=train_loglik,
    )


# --------------------------------------------------------------------------- #


def seed_median(results):
    """Median metrics over per-seed result dicts. RNG streams differ across
    frameworks, so parity is judged on seed statistics; the median is robust
    to the reference init's occasional collapsed run (loc,rho ~ randn gives a
    bimodal training outcome — observed torch seed with 48.9% clean acc next
    to two 85%+ seeds)."""
    out = {}
    for k in ("clean_acc", "fgsm_adv_acc", "fgsm_rob", "pgd_adv_acc", "pgd_rob",
              "mean_scale", "mean_abs_loc", "train_loglik"):
        out[k] = float(np.median([r[k] for r in results]))
    out["grad_norms"] = {
        S: float(np.median([r["grad_norms"][S] for r in results]))
        for S in results[0]["grad_norms"]
    }
    return out


def compare(torch_res, jax_res, tol=TOLERANCES):
    deltas, checks = {}, {}
    for k in ("clean_acc", "fgsm_adv_acc", "pgd_adv_acc"):
        deltas[k] = jax_res[k] - torch_res[k]
        checks[k] = abs(deltas[k]) <= tol[k if k != "clean_acc" else "clean_acc"]
    for k in ("fgsm_rob", "pgd_rob"):
        deltas[k] = jax_res[k] - torch_res[k]
        checks[k] = abs(deltas[k]) <= tol["softmax_rob"]
    lo, hi = tol["grad_norm_ratio"]
    for S, tv in torch_res["grad_norms"].items():
        jv = jax_res["grad_norms"][S]
        ratio = jv / tv if tv else float("inf")
        deltas[f"grad_norm_ratio_S{S}"] = ratio
        checks[f"grad_norm_S{S}"] = lo <= ratio <= hi
    return deltas, checks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--inference", default="svi", choices=["svi", "hmc"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.inference == "hmc":
        cfg = HMC_QUICK if args.quick else HMC_CONFIG
    else:
        cfg = QUICK if args.quick else CONFIG
    out_path = args.out or os.path.join(
        "data", f"torch_parity_{args.inference}.json"
    )

    # Parity is about numbers, not speed — force CPU so the script never
    # contends for the TPU tunnel (CLAUDE.md: one JAX process at a time).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from robustbnns_tpu.data.datasets import load_half_moons

    x_train, y_train, x_test, y_test, _, _ = load_half_moons()
    x_train, y_train = x_train[: cfg["n_inputs"]], y_train[: cfg["n_inputs"]]
    x_eval, y_eval = x_test[: cfg["eval_n"]], y_test[: cfg["eval_n"]]

    print(f"config ({args.inference}): {cfg}", file=sys.stderr)
    if args.inference == "hmc":
        fns = (run_torch_hmc, run_jax_hmc, seed_median_hmc, compare_hmc)
    else:
        fns = (run_torch, run_jax, seed_median, compare)
    torch_fn, jax_fn, median_fn, compare_fn = fns

    seeds = [args.seed + 10 * i for i in range(cfg["seeds"])]
    torch_runs, jax_runs = [], []
    for s in seeds:
        torch_runs.append(torch_fn(cfg, x_train, y_train, x_eval, y_eval, seed=s))
        print(f"torch seed {s}: {torch_runs[-1]}", file=sys.stderr)
        jax_runs.append(jax_fn(cfg, x_train, y_train, x_eval, y_eval, seed=s))
        print(f"jax   seed {s}: {jax_runs[-1]}", file=sys.stderr)
    torch_res, jax_res = median_fn(torch_runs), median_fn(jax_runs)

    deltas, checks = compare_fn(torch_res, jax_res)
    result = dict(
        inference=args.inference,
        config=cfg, seeds=seeds, torch=torch_res, jax=jax_res,
        torch_per_seed=torch_runs, jax_per_seed=jax_runs, deltas=deltas,
        checks=checks, all_within_tolerance=all(checks.values()),
        tolerances={k: list(v) if isinstance(v, tuple) else v
                    for k, v in TOLERANCES.items()},
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0 if result["all_within_tolerance"] else 1


if __name__ == "__main__":
    sys.exit(main())
