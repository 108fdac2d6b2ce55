"""Mesh renderer: STL load, MJCF visual parse, ghost-overlay frames.

Ref: the reference's camera video + ghost entity (envs/env.py:85-140,
robot.py:48-57, view.py:221-260) — here an offline software rasterizer.
"""

import numpy as np
import pytest

from add_gym_tpu.render.mesh import (
    RobotMeshModel, decimate, load_stl, render_frames,
)


@pytest.fixture(scope="module")
def mesh_model(g1_xml):
    from add_gym_tpu.kinematics.char_model import load_char_model

    char = load_char_model(g1_xml)
    return char, RobotMeshModel(g1_xml, list(char.body_names))


def test_stl_load_and_decimate(g1_xml):
    import os

    meshdir = os.path.join(os.path.dirname(g1_xml), "meshes")
    tris = load_stl(os.path.join(meshdir, "pelvis.STL"))
    assert tris.shape[1:] == (3, 3) and len(tris) > 1000
    small = decimate(tris, 100)
    assert len(small) == 100
    # decimation keeps the largest faces
    def area(t):
        return np.linalg.norm(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1
        )
    assert area(small).min() >= np.median(area(tris))


def test_visual_parse(mesh_model):
    char, mm = mesh_model
    # every major body contributes visual meshes; bounded triangle budget
    bodies = {m.body_index for m in mm.meshes}
    assert len(bodies) >= 25
    assert 1000 < mm.triangle_count() < 50_000


def test_render_with_ghost(mesh_model):
    import jax.numpy as jnp

    char, mm = mesh_model
    nb = len(char.body_names)
    F = 2
    root_pos = jnp.tile(jnp.asarray([0.0, 0.0, 0.793]), (F, 1))
    root_rot = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (F, 1))
    dof = jnp.zeros((F, 29))
    bp, br = char.forward_kinematics(root_pos, root_rot, char.dof_to_rot(dof))
    bp, br = np.asarray(bp), np.asarray(br)
    ghost = bp + np.asarray([0.5, 0, 0])
    frames = render_frames(
        mm, bp, br, ghost, br, size=(160, 120)
    )
    assert len(frames) == F
    img = np.asarray(frames[0])
    assert img.shape == (120, 160, 3)
    # something was drawn (not the bare background)
    assert (img != img[0, 0]).any()
