"""Is returning large pytrees from jit slow on the tunneled TPU backend?"""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax, jax.numpy as jnp

def timeit(name, fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:>28s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")
    return out

x = jnp.zeros((64, 1024, 1024))  # 256 MB
y = jnp.zeros((4096, 264))

f_small = jax.jit(lambda x: (x + 1.0).sum())
f_big = jax.jit(lambda x: x + 1.0)
g_small = jax.jit(lambda y: (y * 2.0).sum())
g_big = jax.jit(lambda y: y * 2.0)

timeit("256MB in, scalar out", f_small, x)
timeit("256MB in, 256MB out", f_big, x)
timeit("4MB in, scalar out", g_small, y)
timeit("4MB in, 4MB out", g_big, y)

# chained: output of call i is input of call i+1 (the bench pattern)
def chain(fn, x, iters=5):
    x = fn(x); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    print(f"{'chained 256MB':>28s}: {(time.perf_counter()-t0)/iters*1e3:9.1f} ms")
chain(f_big, x)
