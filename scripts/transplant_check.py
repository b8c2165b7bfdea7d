"""Cross-framework posterior transplant: is the SVI FGSM gap model or attack?

The SVI torch-parity run leaves one out-of-tolerance metric: FGSM adversarial
accuracy (torch ~27%, robustbnns_tpu ~14% — PERFORMANCE.md). Two hypotheses:
(a) the stacks land in different optimization basins whose models differ in
robustness, or (b) the attack implementations differ in strength. Posteriors
are just arrays, so transplanting decides it: train a posterior in each
stack, attack BOTH posteriors with BOTH stacks' FGSM, and see whether the
adversarial accuracy follows the MODEL (→ basin) or the ATTACK (→ attack).

Run: ``python scripts/transplant_check.py`` (CPU, ~6 min).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CFG = dict(hidden=32, n_inputs=10000, epochs=30, lr=0.01, batch=64, eval_n=1000)
SEED = 0
S = 10  # attack/defence samples


def train_torch(x_train, y_train):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(SEED)
    h = CFG["hidden"]
    shapes = [(h, 2), (h,), (h, h), (h,), (2, h), (2,)]
    locs = [torch.randn(s, requires_grad=True) for s in shapes]
    rhos = [torch.randn(s, requires_grad=True) for s in shapes]

    def net(ws, x):
        z = F.leaky_relu(F.linear(x.flatten(1), ws[0], ws[1]))
        z = F.leaky_relu(F.linear(z, ws[2], ws[3]))
        return F.linear(z, ws[4], ws[5])

    opt = torch.optim.Adam(locs + rhos, lr=CFG["lr"])
    xt = torch.from_numpy(x_train)
    yt = torch.from_numpy(y_train).argmax(-1)
    for _ in range(CFG["epochs"]):
        perm = torch.randperm(len(xt))
        xs, ys = xt[perm], yt[perm]
        for b in range(0, len(xs), CFG["batch"]):
            xb, yb = xs[b : b + CFG["batch"]], ys[b : b + CFG["batch"]]
            opt.zero_grad()
            ws = [l + F.softplus(r) * torch.randn_like(l)
                  for l, r in zip(locs, rhos)]
            loglik = -F.cross_entropy(net(ws, xb), yb, reduction="sum")
            kl = sum((0.5 * (F.softplus(r) ** 2 + l**2 - 1.0)
                      - torch.log(F.softplus(r))).sum()
                     for l, r in zip(locs, rhos))
            (kl - loglik).backward()
            opt.step()
    return [l.detach() for l in locs], [r.detach() for r in rhos]


def train_jax(x_train, y_train):
    from robustbnns_tpu.experiments.grid_search import moons_config
    from robustbnns_tpu.models.bnn import BNN

    config = moons_config(CFG["hidden"], "leaky", "fc2", "svi",
                          CFG["epochs"], CFG["lr"], None, None)
    bnn = BNN.from_config(config, input_shape=x_train.shape[1:], output_size=2,
                          n_inputs=CFG["n_inputs"])
    bnn.train(x_train, y_train, batch_size=CFG["batch"], seed=SEED,
              verbose=False)
    return bnn


def torch_lists_to_posterior(locs, rhos):
    """torch Linear weights are (out, in); our dense 'w' is (in, out)."""
    import jax.numpy as jnp

    from robustbnns_tpu.inference.svi import MeanFieldPosterior

    def tree(ts):
        return tuple(
            {"w": jnp.asarray(ts[2 * i].numpy().T),
             "b": jnp.asarray(ts[2 * i + 1].numpy())}
            for i in range(3)
        )

    return MeanFieldPosterior(loc=tree(locs), rho=tree(rhos))


def posterior_to_torch_lists(posterior):
    import torch

    locs, rhos = [], []
    for layer_loc, layer_rho in zip(posterior.loc, posterior.rho):
        locs += [torch.from_numpy(np.asarray(layer_loc["w"]).T.copy()),
                 torch.from_numpy(np.asarray(layer_loc["b"]).copy())]
        rhos += [torch.from_numpy(np.asarray(layer_rho["w"]).T.copy()),
                 torch.from_numpy(np.asarray(layer_rho["b"]).copy())]
    return locs, rhos


def jax_attack_eval(posterior, arch, x_eval, y_eval):
    """Our FGSM + seed-0 defence evaluation on an arbitrary posterior."""
    import jax
    import jax.numpy as jnp

    from robustbnns_tpu.attacks.gradient_attacks import fgsm_attack
    from robustbnns_tpu.attacks.measures import softmax_robustness
    from robustbnns_tpu.predict import batched_eval, svi_predict

    def forward(xb, key):
        return svi_predict(arch, posterior, xb, jax.random.split(key, S))

    forward._rbnn_takes_key = True
    x = jnp.asarray(x_eval)
    x_adv = fgsm_attack(forward, x, jnp.asarray(y_eval), epsilon=0.3,
                        key=jax.random.key(SEED + 1))
    k1, k2 = jax.random.split(jax.random.key(0))
    o, c0 = batched_eval(forward, x, y_eval, batch_size=128, key=k1)
    a, c1 = batched_eval(forward, x_adv, y_eval, batch_size=128, key=k2)
    n = len(x_eval)
    rob = float(np.mean(softmax_robustness(o, a, verbose=False)))
    return 100.0 * float(c0) / n, 100.0 * float(c1) / n, rob


def torch_attack_eval(locs, rhos, x_eval, y_eval):
    """The reference's FGSM (probability-CE, fresh draws) + seed-0 defence."""
    import torch
    import torch.nn.functional as F

    def net(ws, x):
        z = F.leaky_relu(F.linear(x.flatten(1), ws[0], ws[1]))
        z = F.leaky_relu(F.linear(z, ws[2], ws[3]))
        return F.linear(z, ws[4], ws[5])

    def forward(x, n):
        return torch.stack([
            F.softmax(net([l + F.softplus(r) * torch.randn_like(l)
                           for l, r in zip(locs, rhos)], x), -1)
            for _ in range(n)
        ]).mean(0)

    xe = torch.from_numpy(x_eval)
    labels = torch.from_numpy(y_eval).argmax(-1)
    torch.manual_seed(SEED + 1)
    x = xe.clone().requires_grad_(True)
    F.cross_entropy(forward(x, S), labels, reduction="sum").backward()
    x_adv = torch.clamp(xe + 0.3 * x.grad.data.sign(), 0, 1)
    torch.manual_seed(0)
    with torch.no_grad():
        o, a = forward(xe, S), forward(x_adv, S)
        acc0 = 100.0 * (o.argmax(-1) == labels).float().mean().item()
        acc1 = 100.0 * (a.argmax(-1) == labels).float().mean().item()
        rob = (1.0 - (F.softmax(a, -1) - F.softmax(o, -1)).abs().amax(-1)).mean().item()
    return acc0, acc1, rob


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from robustbnns_tpu.data.datasets import load_half_moons

    x_train, y_train, x_test, y_test, _, _ = load_half_moons()
    x_train, y_train = x_train[: CFG["n_inputs"]], y_train[: CFG["n_inputs"]]
    x_eval, y_eval = x_test[: CFG["eval_n"]], y_test[: CFG["eval_n"]]

    locs, rhos = train_torch(x_train, y_train)
    bnn = train_jax(x_train, y_train)

    torch_post_in_jax = torch_lists_to_posterior(locs, rhos)
    jax_locs, jax_rhos = posterior_to_torch_lists(bnn.posterior)

    # FGSM at S=10 is a single-step attack whose strength depends on the
    # particular 10 draws used for the gradient — repeat over attack seeds to
    # separate attack-implementation differences from draw variance.
    global SEED
    base = SEED
    cells = {name: [] for name in
             ("torch-model / torch-attack", "torch-model / jax-attack",
              "jax-model   / jax-attack", "jax-model   / torch-attack")}
    for k in range(5):
        SEED = base + 100 * k  # shifts only the attack/defence draw streams
        cells["torch-model / torch-attack"].append(
            torch_attack_eval(locs, rhos, x_eval, y_eval)[1])
        cells["torch-model / jax-attack"].append(
            jax_attack_eval(torch_post_in_jax, bnn.arch, x_eval, y_eval)[1])
        cells["jax-model   / jax-attack"].append(
            jax_attack_eval(bnn.posterior, bnn.arch, x_eval, y_eval)[1])
        cells["jax-model   / torch-attack"].append(
            torch_attack_eval(jax_locs, jax_rhos, x_eval, y_eval)[1])
    SEED = base
    print(f"{'configuration':<28} {'adv acc over 5 attack seeds':>34}")
    for name, vals in cells.items():
        print(f"{name:<28} mean {np.mean(vals):5.1f}  std {np.std(vals):4.1f}  "
              f"vals {[round(v,1) for v in vals]}", flush=True)


if __name__ == "__main__":
    main()
