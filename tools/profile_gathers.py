"""Isolate minibatch-gather strategies for the update phase.

profile_update.py measured the per-minibatch row gathers at ~39.5 ms of
the ~156 ms update (5 epochs x 8 minibatches at 4096 envs).  This times
candidate reformulations with the exact shapes/dtypes update_model uses:

  perms_only    just the 5 per-epoch permutations (sort cost)
  base          current: 8 tensors gathered per minibatch
  sorted_mb     same, but indices sorted ascending within each minibatch
                (same sample set; gather rows in monotone HBM order)
  packed        one bf16 [M, 264] + one f32 [M, 148] buffer (2 gathers)
  packed_sorted packed + sorted indices
  iota          contiguous slices, no shuffle (lower bound)
  blockB        permute blocks of B contiguous rows instead of rows (B=8:
                one sublane tile per block; each 16384-sample minibatch
                still mixes 2048 random blocks) — gathers become
                contiguous-chunk DMAs
  blockB_packed block permutation + the 2-buffer packing

Usage: python tools/profile_gathers.py [num_envs]
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>14s}: compile {c:5.1f} s   each {dt * 1e3:7.2f} ms", flush=True)
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T, epochs, nb = 32, 5, 8
    M = T * N
    mb = M // nb
    obs_dim, disc_dim, nd = 264, 114, 29

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    flat = dict(
        norm_obs=jax.random.normal(ks[0], (M, obs_dim), jnp.bfloat16),
        disc_in=jax.random.normal(ks[1], (M, disc_dim), jnp.float32),
        norm_a=jax.random.normal(ks[2], (M, nd), jnp.float32),
        a_logp=jnp.ones((M,), jnp.float32),
        tar_val=jnp.ones((M,), jnp.float32),
        adv=jnp.ones((M,), jnp.float32),
        rand_mask=jnp.ones((M,), jnp.float32),
    )
    packed_f32 = jnp.concatenate(
        [flat["disc_in"], flat["norm_a"]]
        + [flat[k][:, None] for k in ("a_logp", "tar_val", "adv", "rand_mask")],
        axis=1,
    )  # [M, 147]
    key = jax.random.PRNGKey(7)

    def perms_only(k):
        def epoch(c, ke):
            perm = jax.random.permutation(ke, M)
            return c + perm[0], None
        c, _ = jax.lax.scan(epoch, jnp.zeros((), jnp.int32),
                            jax.random.split(k, epochs))
        return c

    def run(k, sort_mb, packed, shuffle=True):
        def epoch(c, ke):
            if shuffle:
                perm = jax.random.permutation(ke, M)
            else:
                perm = jnp.arange(M)
            idx = perm.reshape(nb, mb)
            if sort_mb:
                idx = jnp.sort(idx, axis=1)

            def mb_fn(c, mi):
                if packed:
                    a = flat["norm_obs"][mi]
                    b = packed_f32[mi]
                    s = jnp.sum(a.astype(jnp.float32)) + jnp.sum(b)
                else:
                    s = sum(
                        jnp.sum(v[mi].astype(jnp.float32))
                        for v in flat.values()
                    )
                return c + s, None

            c, _ = jax.lax.scan(mb_fn, c, idx)
            return c, None

        c, _ = jax.lax.scan(epoch, jnp.zeros(()), jax.random.split(k, epochs))
        return c

    def run_block(k, B, packed):
        nblk = M // B
        mb_blk = mb // B
        fb = {
            kk: v.reshape((nblk, B) + v.shape[1:]) for kk, v in flat.items()
        }
        pb = packed_f32.reshape(nblk, B, packed_f32.shape[1])
        ob = flat["norm_obs"].reshape(nblk, B, obs_dim)

        def epoch(c, ke):
            perm = jax.random.permutation(ke, nblk)
            idx = perm.reshape(nb, mb_blk)

            def mb_fn(c, mi):
                if packed:
                    a = ob[mi]
                    b = pb[mi]
                    s = jnp.sum(a.astype(jnp.float32)) + jnp.sum(b)
                else:
                    s = sum(
                        jnp.sum(v[mi].astype(jnp.float32))
                        for v in fb.values()
                    )
                return c + s, None

            c, _ = jax.lax.scan(mb_fn, c, idx)
            return c, None

        c, _ = jax.lax.scan(epoch, jnp.zeros(()), jax.random.split(k, epochs))
        return c

    timeit("perms_only", jax.jit(perms_only), key)
    timeit("base", jax.jit(lambda k: run(k, False, False)), key)
    timeit("sorted_mb", jax.jit(lambda k: run(k, True, False)), key)
    timeit("packed", jax.jit(lambda k: run(k, False, True)), key)
    timeit("packed_sorted", jax.jit(lambda k: run(k, True, True)), key)
    timeit("iota", jax.jit(lambda k: run(k, False, False, shuffle=False)), key)
    for B in (8, 32, 128):
        # a block must be 'B adjacent envs at one timestep' to match the
        # agent's layout (time-major rows t*N+n), and the block count must
        # tile exactly into minibatches — otherwise the measurement is
        # unrepresentative (or the reshape below just fails)
        if mb % B != 0 or N % B != 0:
            print(f"block{B}: skipped (requires mb % B == 0 and N % B == 0; "
                  f"mb={mb}, N={N})")
            continue
        timeit(f"block{B}", jax.jit(lambda k, B=B: run_block(k, B, False)), key)
        timeit(f"block{B}_packed",
               jax.jit(lambda k, B=B: run_block(k, B, True)), key)
    print("done")


if __name__ == "__main__":
    main()
