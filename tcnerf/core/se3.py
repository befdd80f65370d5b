"""SE(3) math as pure JAX functions.

Quaternion convention is (x, y, z, w) throughout — matching scipy's
`Rotation.as_quat` used by the host-side task layer and the reference's
tensorflow-graphics usage (reference: src/lib/delta_ngf/grasp_optimizer.py:22-25,
dependencies/manipulation_tasks/manipulation_tasks/transform.py:108-112).

All functions are shape-polymorphic over leading batch dims and jit/vmap/grad
friendly (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from .prec import heinsum


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (..., 4) in xyzw order to rotation matrices (..., 3, 3).

    The quaternion is normalized internally, so gradient ascent over raw
    quaternion variables remains well-defined (reference behavior of
    tf_graphics.rotation_matrix_3d.from_quaternion on renormalized inputs).
    """
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def sixd_to_matrix(sixd: jnp.ndarray) -> jnp.ndarray:
    """6D rotation (..., 6) -> rotation matrix (..., 3, 3).

    Matches the reference's construction exactly (src/lib/delta_ngf/model.py:176-182):
    r1 = normalize(a), r2 = normalize(b) (NOT re-orthogonalized against r1),
    r3 = r1 x r2, stacked as matrix *columns*.
    """
    r1 = _normalize(sixd[..., :3])
    r2 = _normalize(sixd[..., 3:])
    r3 = jnp.cross(r1, r2)
    return jnp.stack([r1, r2, r3], axis=-1)


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def make_homogeneous(translations: jnp.ndarray, rot_matrices: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) transforms from (..., 3) translations and (..., 3, 3) rotations.

    Reference: t_m_to_h_matrix, src/lib/delta_ngf/model.py:16-25.
    """
    top = jnp.concatenate([rot_matrices, translations[..., :, None]], axis=-1)
    last_row = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, last_row], axis=-2)


def pose_to_matrix(translations: jnp.ndarray, rotations: jnp.ndarray,
                   rotation_representation: str = "quaternion") -> jnp.ndarray:
    """(t, r) -> homogeneous matrices for either rotation representation.

    Reference: compute_matrices, src/lib/delta_ngf/model.py:172-183.
    """
    if rotation_representation == "quaternion":
        rot = quat_to_matrix(rotations)
    elif rotation_representation == "6d":
        rot = sixd_to_matrix(rotations)
    else:
        raise ValueError(f"Unknown rotation representation: {rotation_representation}")
    return make_homogeneous(translations, rot)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4) xyzw, w >= 0.

    Branchless Shepperd-style selection (jit-safe): compute all four candidate
    quaternions and select the numerically best by the largest diagonal pivot.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def _stack(x, y, z, w):
        return jnp.stack([x, y, z, w], axis=-1)

    qw = _stack(m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    qx = _stack(1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    qy = _stack(m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21, m02 - m20)
    qz = _stack(m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11, m10 - m01)

    scores = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    choice = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, choice[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = _normalize(q)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def transform_points(matrices: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) transforms to (..., 3) points."""
    return heinsum("...ij,...j->...i", matrices[..., :3, :3], points) + matrices[..., :3, 3]
