import sys, time; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp
from robustbnns_tpu.inference.svi import init_meanfield
from robustbnns_tpu.models import build_architecture
from robustbnns_tpu.predict import svi_predict
from robustbnns_tpu.attacks.gradient_attacks import ce_on_outputs

arch = build_architecture("fc2", "leaky", (28, 28, 1), 10, 512)
posterior = init_meanfield(jax.random.key(0), arch.init(jax.random.key(1)))
x = jax.random.uniform(jax.random.key(2), (128, 28, 28, 1))
labels = jnp.zeros((128,), jnp.int32)
S = 100

@jax.jit
def fwd(x, key):
    return svi_predict(arch, posterior, x, jax.random.split(key, S))

@jax.jit
def grad(x, key):
    return jax.grad(lambda xx: jnp.sum(ce_on_outputs(svi_predict(arch, posterior, xx, jax.random.split(key, S)), labels)))(x)

def timeit(fn, *args, n=20):
    r = fn(*args); float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n): r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter()-t0)/n

for impl in ["threefry2x32", "rbg"]:
    key = jax.random.key(3, impl=impl)
    tf = timeit(fwd, x, key)
    tg = timeit(grad, x, key)
    print(f"{impl}: fwd {tf*1e3:.2f} ms  grad {tg*1e3:.2f} ms", flush=True)
