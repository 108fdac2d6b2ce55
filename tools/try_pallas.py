"""Compile + parity + speed of the Pallas control-step megakernel (TPU)."""
import os, sys, time
from dataclasses import replace
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import numpy as np, jax, jax.numpy as jnp
from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics.engine import EngineParams
from add_gym_tpu.physics import fused_step as fs
from add_gym_tpu.physics.pallas_step import pallas_step
from add_gym_tpu.utils.assets import asset_path
from tests.test_physics import reference_gains, standing_state

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 512
model = build_physics_model(asset_path("g1_description/g1_29.xml"))
fc = fs.FusedModelConstants(model)
kp, kv = reference_gains(model, scale=3.0)
params = EngineParams(kp=kp, kv=kv)
s = standing_state(model, n=N)
key = jax.random.PRNGKey(0)
s = replace(s, dof_vel=0.3*jax.random.normal(key, s.dof_vel.shape))
tgt = s.dof_pos

f_x = jax.jit(lambda s, t: fs.fused_step(fc, params, s, t))
f_p = jax.jit(lambda s, t: pallas_step(fc, params, s, t, block=BLOCK))

t0=time.time(); out_p = f_p(s, tgt); jax.block_until_ready(out_p)
print(f"pallas compile+1st: {time.time()-t0:.1f}s", flush=True)
out_x = f_x(s, tgt); jax.block_until_ready(out_x)

# parity
for name in ("root_pos","root_quat","root_vel","root_ang_vel","dof_pos","dof_vel","pd_target"):
    a = np.asarray(getattr(out_x[0], name)); b = np.asarray(getattr(out_p[0], name))
    err = np.abs(a-b).max()
    print(f"  {name:14s} max|diff| = {err:.2e}")
print(f"  contact max|diff| = {np.abs(np.asarray(out_x[1])-np.asarray(out_p[1])).max():.2e}")

def bench(f, s, tgt, iters=50):
    s2, c = f(s, tgt); jax.block_until_ready(c)
    s2, c = f(s2, tgt); jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        s2, c = f(s2, tgt)
    jax.block_until_ready(c)
    return (time.perf_counter()-t0)/iters

tx = bench(f_x, s, tgt)
tp = bench(f_p, s, tgt)
print(f"XLA fused:  {tx*1e3:.3f} ms/step -> {N/tx/1e6:.2f} M steps/s")
print(f"Pallas:     {tp*1e3:.3f} ms/step -> {N/tp/1e6:.2f} M steps/s  ({tx/tp:.2f}x)")
