"""Count fused kernels in the compiled physics step."""
import os, sys
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax, jax.numpy as jnp
from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics.engine import EngineParams
from add_gym_tpu.physics import fused_step as fs
from add_gym_tpu.utils.assets import asset_path
from tests.test_physics import reference_gains, standing_state

model = build_physics_model(asset_path("g1_description/g1_29.xml"))
fc = fs.FusedModelConstants(model)
kp, kv = reference_gains(model, scale=3.0)
params = EngineParams(kp=kp, kv=kv)
N = 4096
s = standing_state(model, n=N)
tgt = s.dof_pos

f = jax.jit(lambda s, t: fs.fused_step(fc, params, s, t))
compiled = f.lower(s, tgt).compile()
txt = compiled.as_text()
import re
fusions = len(re.findall(r"^\s*%?fusion[.\d]* =", txt, re.M))
allops = len(re.findall(r"^\s+%?\S+ = ", txt, re.M))
print("fusion ops:", fusions, " total HLO insts:", allops)
# count per-opcode top
from collections import Counter
ops = Counter(re.findall(r"= \S*?([a-z-]+)\(", txt))
print(ops.most_common(15))
try:
    print(compiled.cost_analysis())
except Exception as e:
    print("cost_analysis failed:", e)
