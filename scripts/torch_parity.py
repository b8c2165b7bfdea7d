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
    ap.add_argument("--out", default=os.path.join("data", "torch_parity.json"))
    args = ap.parse_args()
    cfg = QUICK if args.quick else CONFIG

    # Parity is about numbers, not speed — force CPU so the script never
    # contends for the TPU tunnel (CLAUDE.md: one JAX process at a time).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from robustbnns_tpu.data.datasets import load_half_moons

    x_train, y_train, x_test, y_test, _, _ = load_half_moons()
    x_train, y_train = x_train[: cfg["n_inputs"]], y_train[: cfg["n_inputs"]]
    x_eval, y_eval = x_test[: cfg["eval_n"]], y_test[: cfg["eval_n"]]

    print(f"config: {cfg}", file=sys.stderr)
    seeds = [args.seed + 10 * i for i in range(cfg["seeds"])]
    torch_runs, jax_runs = [], []
    for s in seeds:
        torch_runs.append(run_torch(cfg, x_train, y_train, x_eval, y_eval, seed=s))
        print(f"torch seed {s}: {torch_runs[-1]}", file=sys.stderr)
        jax_runs.append(run_jax(cfg, x_train, y_train, x_eval, y_eval, seed=s))
        print(f"jax   seed {s}: {jax_runs[-1]}", file=sys.stderr)
    torch_res, jax_res = seed_median(torch_runs), seed_median(jax_runs)

    deltas, checks = compare(torch_res, jax_res)
    result = dict(
        config=cfg, seeds=seeds, torch=torch_res, jax=jax_res,
        torch_per_seed=torch_runs, jax_per_seed=jax_runs, deltas=deltas,
        checks=checks, all_within_tolerance=all(checks.values()),
        tolerances={k: list(v) if isinstance(v, tuple) else v
                    for k, v in TOLERANCES.items()},
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0 if result["all_within_tolerance"] else 1


if __name__ == "__main__":
    sys.exit(main())
