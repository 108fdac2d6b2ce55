"""Reduced-topology test fixture for the physics backends.

A 3-body / 2-dof "mini biped" (free pelvis + one hinge leg per side, sphere
collision geoms) that exercises every code path of the engine — free-base
dynamics, hinge ABA, PD control, ground contacts — at a size where the
Pallas *interpreter* runs in seconds instead of tens of minutes, so CI
without a TPU executes the kernel body on every run (the full G1 kernel is
pinned on-device by tests/test_pallas_step.py).

No reference counterpart: the reference has no automated tests
(SURVEY.md §4); this fixture exists to close that gap cheaply.
"""

from __future__ import annotations

import os
import tempfile

from add_gym_tpu.physics.model import PhysicsModel, build_physics_model

MINI_MJCF = """<mujoco model="mini_biped">
  <compiler angle="radian" />
  <default>
    <default class="leg_motor">
      <joint damping="0.05" armature="0.01" frictionloss="0.1"/>
    </default>
  </default>
  <worldbody>
    <body name="pelvis" pos="0 0 0.6">
      <inertial pos="0 0 0" mass="4.0" diaginertia="0.02 0.02 0.01" />
      <joint name="floating_base_joint" type="free" limited="false" />
      <geom type="sphere" size="0.08" pos="0 0 0" />
      <body name="left_leg_link" pos="0 0.1 -0.1">
        <inertial pos="0 0 -0.25" mass="1.5" diaginertia="0.01 0.01 0.002" />
        <joint name="left_leg_joint" type="hinge" range="-1.5 1.5"
               axis="0 1 0" class="leg_motor" />
        <geom type="sphere" size="0.05" pos="0 0 -0.5" />
      </body>
      <body name="right_leg_link" pos="0 -0.1 -0.1">
        <inertial pos="0 0 -0.25" mass="1.5" diaginertia="0.01 0.01 0.002" />
        <joint name="right_leg_joint" type="hinge" range="-1.5 1.5"
               axis="0 1 0" class="leg_motor" />
        <geom type="sphere" size="0.05" pos="0 0 -0.5" />
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def mini_mjcf_path() -> str:
    """Write the mini-biped MJCF to a stable temp path and return it."""
    path = os.path.join(tempfile.gettempdir(), "agt_mini_biped.xml")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(MINI_MJCF)
    return path


def build_mini_model() -> PhysicsModel:
    return build_physics_model(mini_mjcf_path())
