import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend())
from robustbnns_tpu.inference.svi import init_meanfield
from robustbnns_tpu.models import build_architecture
from robustbnns_tpu.predict import svi_predict
from robustbnns_tpu.ops import svi_predict_fused
from robustbnns_tpu.attacks.gradient_attacks import ce_on_outputs

arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
x = jax.random.uniform(jax.random.key(2), (128, 28, 28, 1))
labels = jnp.zeros((128,), jnp.int32)
S = 100

@jax.jit
def xla_fwd(x, key):
    return svi_predict(arch, posterior, x, jax.random.split(key, S))

@jax.jit
def fused_fwd(x, seed):
    return svi_predict_fused(arch, posterior, x, S, seed)

@jax.jit
def xla_grad(x, key):
    return jax.grad(lambda xx: jnp.sum(ce_on_outputs(svi_predict(arch, posterior, xx, jax.random.split(key, S)), labels)))(x)

@jax.jit
def fused_grad(x, seed):
    return jax.grad(lambda xx: jnp.sum(ce_on_outputs(svi_predict_fused(arch, posterior, xx, S, seed), labels)))(x)

def timeit(fn, *args, n=20):
    r = fn(*args); float(jnp.sum(r))  # compile + sync
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n

t_xla_f = timeit(xla_fwd, x, jax.random.key(3))
print(f"fwd  S=100 B=128 fc2-512: xla {t_xla_f*1e3:.2f} ms", flush=True)
t_fused_f = timeit(fused_fwd, x, jnp.int32(3))
print(f"fwd  fused: {t_fused_f*1e3:.2f} ms  speedup {t_xla_f/t_fused_f:.2f}x", flush=True)
t_xla_g = timeit(xla_grad, x, jax.random.key(3))
print(f"grad xla: {t_xla_g*1e3:.2f} ms", flush=True)
t_fused_g = timeit(fused_grad, x, jnp.int32(3))
print(f"grad fused: {t_fused_g*1e3:.2f} ms  speedup {t_xla_g/t_fused_g:.2f}x", flush=True)
