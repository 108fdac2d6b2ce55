"""Minimal spatial (6D) vector algebra for batched rigid-body dynamics.

Spatial vectors are ``[..., 6]`` with the **angular part first**
(Featherstone convention): motion v = [w; v], force f = [n; f].
Spatial transforms are represented explicitly as (R, p): rotation matrix
``[..., 3, 3]`` mapping *from parent to child* coordinates and the child
frame origin expressed in parent coordinates.  Keeping (R, p) instead of
6x6 Plücker matrices keeps every op a small fused elementwise/3x3 contraction
that XLA vectorizes cleanly over the env batch dimension.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross3(a, b):
    return jnp.cross(a, b)


def ang(v):
    return v[..., 0:3]


def lin(v):
    return v[..., 3:6]


def sv(w, v):
    """Build a spatial vector from angular and linear parts."""
    return jnp.concatenate([w, v], axis=-1)


def crm(v, m):
    """Spatial motion cross product  v x m  (both motion vectors)."""
    w, vl = ang(v), lin(v)
    mw, mv = ang(m), lin(m)
    return sv(cross3(w, mw), cross3(w, mv) + cross3(vl, mw))


def crf(v, f):
    """Spatial force cross product  v x* f  (motion x force)."""
    w, vl = ang(v), lin(v)
    n, fl = ang(f), lin(f)
    return sv(cross3(w, n) + cross3(vl, fl), cross3(w, fl))


def xform_motion(R, p, v):
    """Transform a motion vector from parent coords to child coords.

    X v = [R w; R (v - p x w)]  with R: parent->child, p: child origin in parent.
    """
    w, vl = ang(v), lin(v)
    Rw = jnp.einsum("...ij,...j->...i", R, w)
    Rv = jnp.einsum("...ij,...j->...i", R, vl - cross3(p, w))
    return sv(Rw, Rv)


def inv_xform_force(R, p, f):
    """Transform a force vector from child coords back to parent coords.

    X^T f: n_p = R^T n + p x (R^T f); f_p = R^T f.
    """
    n, fl = ang(f), lin(f)
    Rtn = jnp.einsum("...ji,...j->...i", R, n)
    Rtf = jnp.einsum("...ji,...j->...i", R, fl)
    return sv(Rtn + cross3(p, Rtf), Rtf)


def xform_force(R, p, f):
    """Transform a force vector from parent coords to child coords.

    X^* f: n_c = R (n - p x f); f_c = R f.
    """
    n, fl = ang(f), lin(f)
    return sv(
        jnp.einsum("...ij,...j->...i", R, n - cross3(p, fl)),
        jnp.einsum("...ij,...j->...i", R, fl),
    )


def spatial_inertia(mass, com, inertia_com):
    """Spatial inertia (6x6) about the body frame origin.

    I = [ Ic + m cx cx^T,  m cx ;  m cx^T, m 1 ]
    with cx the skew matrix of the COM offset.  Shapes: mass [...,],
    com [..., 3], inertia_com [..., 3, 3] (about COM, body axes).
    """
    cx = skew(com)
    m = mass[..., None, None]
    top_left = inertia_com + m * cx @ jnp.swapaxes(cx, -1, -2)
    top_right = m * cx
    bottom_left = m * jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=mass.dtype), cx.shape)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def skew(v):
    """Skew-symmetric matrix [..., 3, 3] such that skew(a) @ b = a x b."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def xform_inertia(R, p, I_child):
    """Transform an articulated 6x6 inertia from child coords to parent coords.

    I_p = X^T I_c X, where X = [[R, 0], [-R px, R]] maps parent->child motion
    (px = skew(p)).  Built explicitly as a 6x6 to use one batched matmul.
    """
    px = skew(p)
    Rpx = -R @ px
    zeros = jnp.zeros_like(R)
    X_top = jnp.concatenate([R, zeros], axis=-1)
    X_bot = jnp.concatenate([Rpx, R], axis=-1)
    X = jnp.concatenate([X_top, X_bot], axis=-2)
    return jnp.swapaxes(X, -1, -2) @ I_child @ X
