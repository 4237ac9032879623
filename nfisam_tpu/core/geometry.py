"""Array-native SE(2) / SO(2) / R^2 geometry.

TPU-first re-design of the reference's scalar object-oriented geometry
(``/root/reference/src/geometry/TwoDimension.py``): every operation here is a
pure function over ``[..., 3]`` (SE(2)) or ``[..., 2]`` (R^2) arrays, fully
``vmap``-able and ``jit``-able, so clique simulation and factor evaluation run
as a handful of fused vector ops instead of per-sample Python loops
(cf. reference ``Factors.py:1222-1317`` which loops over ``SE2Pose`` objects).

Conventions
-----------
* An SE(2) element is ``[x, y, theta]`` with ``theta`` in radians.
* Tangent (Lie-algebra) vectors are ``[v1, v2, w]``.
* ``theta`` is always wrapped to ``[-pi, pi]`` on output of group ops.

Reference parity: ``SE2Pose.log_map`` (TwoDimension.py:405), ``by_exp_map``
(:337), ``grad_x_logmap`` (:420), ``det_grad_x_logmap`` (:437),
``grad_x_det_grad_x_logmap`` (:443), ``grad_xi_expmap`` (:451).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_W = 1e-7  # small-rotation switch for exp/log closed forms
_TWO_PI = 2.0 * jnp.pi


def wrap_angle(theta: jax.Array) -> jax.Array:
    """Wrap angles to [-pi, pi). Elementwise."""
    return jnp.mod(theta + jnp.pi, _TWO_PI) - jnp.pi


def rot2_matrix(theta: jax.Array) -> jax.Array:
    """[..., ] -> [..., 2, 2] rotation matrices."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rot2_apply(theta: jax.Array, pt: jax.Array) -> jax.Array:
    """Rotate points ``pt`` ([..., 2]) by angles ``theta`` ([...])."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = pt[..., 0], pt[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def se2_identity(batch_shape=()) -> jax.Array:
    return jnp.zeros(batch_shape + (3,))


def se2_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Group composition a * b for [..., 3] SE(2) arrays."""
    t = a[..., :2] + rot2_apply(a[..., 2], b[..., :2])
    th = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.concatenate([t, th[..., None]], axis=-1)


def se2_inverse(a: jax.Array) -> jax.Array:
    """Group inverse for [..., 3] SE(2) arrays."""
    th = a[..., 2]
    t = -rot2_apply(-th, a[..., :2])
    return jnp.concatenate([t, wrap_angle(-th)[..., None]], axis=-1)


def se2_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Relative transform a^{-1} * b."""
    return se2_compose(se2_inverse(a), b)


def _sinc_family(w: jax.Array):
    """Return (sin(w)/w, (1-cos(w))/w) with stable small-angle limits."""
    small = jnp.abs(w) < _EPS_W
    w_safe = jnp.where(small, 1.0, w)
    a = jnp.where(small, 1.0 - w * w / 6.0, jnp.sin(w_safe) / w_safe)
    b = jnp.where(small, w / 2.0, (1.0 - jnp.cos(w_safe)) / w_safe)
    return a, b


def se2_exp(v: jax.Array) -> jax.Array:
    """Exponential map se(2) -> SE(2) for [..., 3] tangent vectors.

    ``t = V(w) @ v_xy`` with ``V = [[sin w / w, -(1-cos w)/w],
    [(1-cos w)/w, sin w / w]]`` (reference ``by_exp_map`` TwoDimension.py:337).
    """
    vx, vy, w = v[..., 0], v[..., 1], v[..., 2]
    a, b = _sinc_family(w)
    tx = a * vx - b * vy
    ty = b * vx + a * vy
    return jnp.stack([tx, ty, wrap_angle(w)], axis=-1)


def se2_log(T: jax.Array) -> jax.Array:
    """Logarithmic map SE(2) -> se(2) for [..., 3] poses.

    ``v_xy = V(w)^{-1} t`` where ``V^{-1} = [[A, h], [-h, A]]`` with
    ``h = w/2`` and ``A = h * cot(h)`` (limit 1 at w=0).
    Matches reference ``SE2Pose.log_map`` (TwoDimension.py:405).
    """
    x, y, w = T[..., 0], T[..., 1], T[..., 2]
    h = w / 2.0
    small = jnp.abs(w) < _EPS_W
    h_safe = jnp.where(small, 1.0, h)
    A = jnp.where(small, 1.0 - h * h / 3.0, h_safe / jnp.tan(h_safe))
    vx = A * x + h * y
    vy = -h * x + A * y
    return jnp.stack([vx, vy, w], axis=-1)


def se2_det_grad_logmap(T: jax.Array) -> jax.Array:
    """det(d logmap / d (x,y,theta)) evaluated at T; [...,3] -> [...].

    Equals ``(theta/2)^2 / sin^2(theta/2)`` (reference
    ``det_grad_x_logmap`` TwoDimension.py:437). Signed determinant (here
    always >= 1 for |theta| < 2 pi, so abs is a no-op in practice).
    """
    w = T[..., 2]
    h = w / 2.0
    small = jnp.abs(w) < 1e-5
    h_safe = jnp.where(small, 1.0, h)
    val = jnp.where(small, 1.0 + h * h / 3.0, (h_safe / jnp.sin(h_safe)) ** 2)
    return val


def se2_grad_det_grad_logmap(T: jax.Array) -> jax.Array:
    """Gradient of :func:`se2_det_grad_logmap` w.r.t. (x, y, theta).

    Only the theta component is non-zero (reference
    ``grad_x_det_grad_x_logmap`` TwoDimension.py:443).
    """
    w = T[..., 2]
    h = w / 2.0
    small = jnp.abs(w) < 1e-5
    h_safe = jnp.where(small, 1.0, h)
    s = jnp.sin(h_safe)
    dfdth = jnp.where(small, w / 6.0, h_safe / s**2 - jnp.cos(h_safe) * h_safe**2 / s**3)
    zeros = jnp.zeros_like(w)
    return jnp.stack([zeros, zeros, dfdth], axis=-1)


def se2_grad_x_logmap(T: jax.Array) -> jax.Array:
    """Jacobian d(logmap)/d(x, y, theta) at T; [..., 3] -> [..., 3, 3].

    Matches reference ``grad_x_logmap`` (TwoDimension.py:420).
    """
    v = se2_log(T)
    lx, ly, w = v[..., 0], v[..., 1], v[..., 2]
    x, y = T[..., 0], T[..., 1]
    h = w / 2.0
    small = jnp.abs(w) < 1e-5
    w_safe = jnp.where(small, 1.0, w)
    cw = jnp.cos(w_safe)
    # diag = (w/2) sin w / (1 - cos w); -> 1 as w -> 0
    diag = jnp.where(small, 1.0 - w * w / 12.0, h * jnp.sin(w_safe) / (1.0 - cw))
    # d v_x / d theta and d v_y / d theta
    inv_c1 = jnp.where(small, 1.0, 1.0 / (cw - 1.0))
    dvx_dth = jnp.where(small, 0.5 * ly, lx / w_safe + h * (x * inv_c1))
    dvy_dth = jnp.where(small, -0.5 * lx, ly / w_safe + h * (y * inv_c1))
    zeros = jnp.zeros_like(w)
    ones = jnp.ones_like(w)
    row0 = jnp.stack([diag, h, dvx_dth], axis=-1)
    row1 = jnp.stack([-h, diag, dvy_dth], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def se2_grad_xi_expmap(T: jax.Array) -> jax.Array:
    """Jacobian d(x, y, theta)/d(v1, v2, w) at v = log(T); [..., 3, 3].

    Matches reference ``grad_xi_expmap`` (TwoDimension.py:451).
    """
    v = se2_log(T)
    lx, ly, w = v[..., 0], v[..., 1], v[..., 2]
    small = jnp.abs(w) < 1e-5
    w_safe = jnp.where(small, 1.0, w)
    s, c = jnp.sin(w_safe), jnp.cos(w_safe)
    a = jnp.where(small, 1.0 - w * w / 6.0, s / w_safe)        # sin w / w
    b = jnp.where(small, w / 2.0, (1.0 - c) / w_safe)          # (1 - cos w)/w
    # d a / d w and d b / d w (used for the theta column)
    da = jnp.where(small, -w / 3.0, (c * w_safe - s) / w_safe**2)
    db = jnp.where(small, 0.5, (s * w_safe - (1.0 - c)) / w_safe**2)
    dx_dth = da * lx - db * ly
    dy_dth = db * lx + da * ly
    zeros = jnp.zeros_like(w)
    ones = jnp.ones_like(w)
    row0 = jnp.stack([a, -b, dx_dth], axis=-1)
    row1 = jnp.stack([b, a, dy_dth], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def se2_range_and_bearing(pose: jax.Array, pt: jax.Array):
    """Range and bearing from SE(2) poses [..., 3] to points [..., 2]."""
    d = pt - pose[..., :2]
    rng = jnp.linalg.norm(d, axis=-1)
    local = rot2_apply(-pose[..., 2], d)
    bearing = jnp.arctan2(local[..., 1], local[..., 0])
    return rng, bearing


def se2_chordal_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """|| log(a^{-1} b) || (reference ``SE2Pose.dist`` TwoDimension.py:361)."""
    return jnp.linalg.norm(se2_log(se2_between(a, b)), axis=-1)


def product_manifold_dist(a: jax.Array, b: jax.Array, circular_mask) -> jax.Array:
    """Distance on a product of Euclidean and circular dims.

    ``circular_mask`` is a [...dim] boolean; angular residuals are wrapped.
    (reference ``geometry/utils.py:6-11``)
    """
    diff = a - b
    diff = jnp.where(circular_mask, wrap_angle(diff), diff)
    return jnp.linalg.norm(diff, axis=-1)
