"""SE(2) pose-graph optimization with Gauss-Newton, fully vectorized in JAX.

No reference counterpart (SURVEY.md §2: the reference stops at detection).
Design: poses are (N, 3) [x, y, theta]; edges are relative-pose measurements
with 3x3 information matrices. Every Gauss-Newton step is one jitted program:
residuals/Jacobians for *all* edges at once (vmap), normal equations
assembled by segment-sum scatter-adds into the (N, 3, 3)-block structure, and
the linear system solved with preconditioned conjugate gradient
(jax.scipy.sparse.linalg.cg) through a matrix-free Hv product — no dense
(3N)^2 matrix, O(edges) memory, and every stage maps onto TPU
vector/matrix units. Gauge freedom is fixed by anchoring pose 0.

Loop edges come from the LCD engine: OverlapNet yields a relative yaw but no
translation, so closure edges constrain heading strongly and translation
weakly (information matrix reflects that), which is enough to pull drifted
trajectories back onto the loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def wrap_angle(theta):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def relative_pose(xi: jax.Array, xj: jax.Array) -> jax.Array:
    """t2v(inv(T_i) @ T_j) for SE(2) poses [x, y, theta]."""
    ci, si = jnp.cos(xi[2]), jnp.sin(xi[2])
    dx, dy = xj[0] - xi[0], xj[1] - xi[1]
    return jnp.stack(
        [ci * dx + si * dy, -si * dx + ci * dy, wrap_angle(xj[2] - xi[2])]
    )


@dataclass
class PoseGraph:
    """Edges (i, j) with measurements z_ij = t2v(inv(T_i) T_j) and 3x3
    information matrices."""

    n_poses: int
    edges_i: np.ndarray  # (E,)
    edges_j: np.ndarray  # (E,)
    measurements: np.ndarray  # (E, 3)
    informations: np.ndarray  # (E, 3, 3)

    def __post_init__(self):
        self.edges_i = np.asarray(self.edges_i, np.int32)
        self.edges_j = np.asarray(self.edges_j, np.int32)
        self.measurements = np.asarray(self.measurements, np.float64)
        self.informations = np.asarray(self.informations, np.float64)

    @property
    def n_edges(self) -> int:
        return len(self.edges_i)

    def merged(self, other: "PoseGraph") -> "PoseGraph":
        assert self.n_poses == other.n_poses
        return PoseGraph(
            self.n_poses,
            np.concatenate([self.edges_i, other.edges_i]),
            np.concatenate([self.edges_j, other.edges_j]),
            np.concatenate([self.measurements, other.measurements]),
            np.concatenate([self.informations, other.informations]),
        )


def poses_se3_to_se2(poses: np.ndarray) -> np.ndarray:
    """(N, 4, 4) SE(3) -> (N, 3) [x, y, yaw] (planar projection)."""
    yaw = np.arctan2(poses[:, 1, 0], poses[:, 0, 0])
    return np.column_stack([poses[:, 0, 3], poses[:, 1, 3], yaw])


def odometry_edges(
    poses_se2: np.ndarray, information: np.ndarray | None = None
) -> PoseGraph:
    """Consecutive-frame edges from an (odometry) trajectory."""
    n = len(poses_se2)
    i = np.arange(n - 1)
    j = i + 1
    z = np.stack(
        [
            np.asarray(relative_pose(poses_se2[a], poses_se2[b]))
            for a, b in zip(i, j)
        ]
    )
    if information is None:
        information = np.diag([100.0, 100.0, 1000.0])
    infos = np.tile(information, (n - 1, 1, 1))
    return PoseGraph(n, i, j, z, infos)


def closures_to_edges(
    closures: Sequence,
    n_poses: int,
    yaw_information: float = 500.0,
    xy_information: float = 1e-2,
    yaw_overlap_ramp: tuple[float, float] = (0.3, 0.7),
) -> PoseGraph:
    """Loop-closure edges from LCD results (lcd.online.LoopClosure).

    OverlapNet gives relative yaw only (no translation), so measurements are
    [0, 0, yaw] with high heading / near-zero translation information — a
    'same place, known heading change' constraint.

    Yaw information per edge = yaw_information x confidence x overlap ramp:
    the confidence is the detector's antipodal-aware yaw confidence (softmax
    peak mass x flip margin, ops.correlation.yaw_confidence), so sharp but
    180-degree-ambiguous peaks carry almost no heading weight; the overlap
    ramp rises linearly over ``yaw_overlap_ramp`` (floor 0.2 at the low end)
    because yaw accuracy degrades with overlap even when supervised there
    (VERDICT r4 weak #2).
    """
    i = np.array([c.match for c in closures], np.int32)
    j = np.array([c.frame for c in closures], np.int32)
    z = np.zeros((len(i), 3))
    z[:, 2] = [np.radians(c.yaw_deg) for c in closures]
    confs = np.array([getattr(c, "confidence", 1.0) for c in closures])
    lo, hi = yaw_overlap_ramp
    ovs = np.array([getattr(c, "overlap", hi) for c in closures])
    ramp = np.clip((ovs - lo) / max(hi - lo, 1e-9), 0.2, 1.0)
    infos = np.tile(
        np.diag([xy_information, xy_information, 0.0]), (len(i), 1, 1)
    )
    infos[:, 2, 2] = yaw_information * confs * ramp
    return PoseGraph(n_poses, i, j, z, infos)


def relative_pose_edges(
    pairs: np.ndarray,
    measurements: np.ndarray,
    n_poses: int,
    information: np.ndarray | None = None,
) -> PoseGraph:
    """Closure edges with full relative-pose measurements (E, 3) — the
    refined-registration case (e.g. detector closure + ICP alignment, the
    SuMa++ pipeline the reference feeds, README.md:99)."""
    pairs = np.asarray(pairs, np.int32)
    if information is None:
        information = np.diag([50.0, 50.0, 500.0])
    infos = np.tile(information, (len(pairs), 1, 1))
    return PoseGraph(n_poses, pairs[:, 0], pairs[:, 1], measurements, infos)


def _edge_residual_jac(xi, xj, z):
    """Residual r = t2v(inv(T_ij_meas) * (inv(T_i) T_j)) ~ rel - z (angle
    wrapped), with analytic Jacobians wrt xi and xj. Returns (r, Ji, Jj)."""
    ci, si = jnp.cos(xi[2]), jnp.sin(xi[2])
    dx, dy = xj[0] - xi[0], xj[1] - xi[1]
    rel = jnp.stack(
        [ci * dx + si * dy, -si * dx + ci * dy, xj[2] - xi[2]]
    )
    r = rel - z
    r = r.at[2].set(wrap_angle(r[2]))
    # d(rel)/d(xi), d(rel)/d(xj)
    ji = jnp.array(
        [
            [-ci, -si, -si * dx + ci * dy],
            [si, -ci, -ci * dx - si * dy],
            [0.0, 0.0, -1.0],
        ]
    )
    jj = jnp.array(
        [[ci, si, 0.0], [-si, ci, 0.0], [0.0, 0.0, 1.0]]
    )
    return r, ji, jj


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_poses", "iterations", "cg_iters", "robust_delta", "robust_kernel",
        "robust_anneal_start",
    ),
)
def _gauss_newton(
    poses0: jax.Array,  # (N, 3)
    ei: jax.Array,
    ej: jax.Array,
    z: jax.Array,
    omega: jax.Array,
    *,
    n_poses: int,
    iterations: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    robust_delta: float = 0.0,
    robust_kernel: str = "huber",
    robust_anneal_start: float = 0.0,
):
    """All-edges Gauss-Newton with matrix-free CG on the normal equations.

    ``robust_delta`` > 0 enables a robust kernel via IRLS on the Mahalanobis
    residual ||r||_Omega: 'huber' scales each edge's information by
    min(1, delta/||r||) (bounded influence), 'tukey' by (1 - (||r||/delta)^2)^2
    inside the band and 0 outside (full outlier rejection) — so wrong
    loop-closure edges are down-weighted instead of dragging the trajectory.
    ``robust_anneal_start`` > delta anneals the band linearly from that start
    value down to delta over the iterations (graduated non-convexity): early
    iterations tolerate the large residuals honest edges have under drift,
    late iterations reject true outliers."""

    def linearize(poses, delta):
        xi = poses[ei]
        xj = poses[ej]
        r, ji, jj = jax.vmap(_edge_residual_jac)(xi, xj, z)
        s = jnp.einsum("ea,eab,eb->e", r, omega, r)
        if robust_delta > 0.0:
            rho = jnp.sqrt(s + 1e-12)
            if robust_kernel == "tukey":
                u = rho / delta
                w = jnp.where(u < 1.0, jnp.square(1.0 - jnp.square(u)), 0.0)
            else:  # huber
                w = jnp.minimum(1.0, delta / rho)
            omega_w = omega * w[:, None, None]
        else:
            omega_w = omega
        chi2 = jnp.sum(s)
        # b blocks: Ji^T O r and Jj^T O r, scattered to poses
        omr = jnp.einsum("eab,eb->ea", omega_w, r)
        b = (
            jnp.zeros((n_poses, 3))
            .at[ei]
            .add(jnp.einsum("eba,eb->ea", ji, omr))
            .at[ej]
            .add(jnp.einsum("eba,eb->ea", jj, omr))
        )
        return r, ji, jj, b, chi2, omega_w

    def hv(ji, jj, omega_w, v):
        """Matrix-free H @ v with H = sum_e J_e^T O J_e (+ damping), with
        pose 0 projected out (gauge fix): rows/cols 0 replaced by identity."""
        v = v.at[0].set(0.0)
        vi = v[ei]
        vj = v[ej]
        jv = jnp.einsum("eab,eb->ea", ji, vi) + jnp.einsum(
            "eab,eb->ea", jj, vj
        )
        ojv = jnp.einsum("eab,eb->ea", omega_w, jv)
        out = (
            jnp.zeros((n_poses, 3))
            .at[ei]
            .add(jnp.einsum("eba,eb->ea", ji, ojv))
            .at[ej]
            .add(jnp.einsum("eba,eb->ea", jj, ojv))
        )
        out = out + damping * v
        return out.at[0].set(0.0)

    start = max(robust_anneal_start, robust_delta)
    span = max(iterations - 1, 1)

    def step(poses, k):
        frac = k.astype(poses0.dtype) / span
        delta = start + (robust_delta - start) * frac
        r, ji, jj, b, chi2, omega_w = linearize(poses, delta)
        matvec = lambda v: hv(ji, jj, omega_w, v)
        rhs = (-b).at[0].set(0.0)
        dx, _ = jax.scipy.sparse.linalg.cg(
            matvec, rhs, maxiter=cg_iters, tol=1e-10
        )
        new = poses + dx
        new = new.at[:, 2].set(wrap_angle(new[:, 2]))
        return new, chi2

    poses, chi2s = jax.lax.scan(step, poses0, jnp.arange(iterations))
    return poses, chi2s


def optimize_pose_graph(
    graph: PoseGraph,
    initial_poses: np.ndarray,
    iterations: int = 10,
    cg_iters: int = 50,
    robust_delta: float = 0.0,
    robust_kernel: str = "huber",
    robust_anneal_start: float = 0.0,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Optimize; returns (poses (N, 3), chi2 history (iterations,)).

    ``robust_delta`` > 0 turns on a robust kernel (IRLS): 'huber' (bounded
    influence) or 'tukey' (rejects outliers outside the delta band). A good
    delta for loop-closure graphs is ~1-3 (units of Mahalanobis residual);
    pair tukey with ``robust_anneal_start`` (e.g. 100x delta) so honest
    closures survive the early high-drift iterations.

    ``mesh``: optional jax.sharding.Mesh — shards the edge set over the
    mesh's 'data' axis (poses replicated). The per-edge residual/Jacobian and
    Hv products then run SPMD across devices, with the scatter-adds onto the
    (N, 3) pose blocks reduced by XLA-inserted psums; results are identical
    to the single-device path (edge padding carries zero information).
    """
    ei, ej = graph.edges_i, graph.edges_j
    z, omega = graph.measurements, graph.informations
    if mesh is not None:
        from overlapnet_tpu.parallel.mesh import put_replicated, put_sharded

        n_dev = mesh.shape["data"]
        pad = (-len(ei)) % n_dev
        if pad:
            # zero-information self-edges at pose 0 contribute nothing
            ei = np.concatenate([ei, np.zeros(pad, np.int32)])
            ej = np.concatenate([ej, np.zeros(pad, np.int32)])
            z = np.concatenate([z, np.zeros((pad, 3))])
            omega = np.concatenate([omega, np.zeros((pad, 3, 3))])
        put_e = lambda x, dt: put_sharded(mesh, np.asarray(x, dt))
        args = (
            put_replicated(mesh, np.asarray(
                initial_poses,
                np.float64 if jax.config.jax_enable_x64 else np.float32)),
            put_e(ei, np.int32), put_e(ej, np.int32),
            put_e(z, np.float32), put_e(omega, np.float32),
        )
    else:
        args = (
            jnp.asarray(initial_poses,
                        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
            jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(z, jnp.float32), jnp.asarray(omega, jnp.float32),
        )
    poses, chi2s = _gauss_newton(
        *args,
        n_poses=graph.n_poses,
        iterations=iterations,
        cg_iters=cg_iters,
        robust_delta=robust_delta,
        robust_kernel=robust_kernel,
        robust_anneal_start=robust_anneal_start,
    )
    return np.asarray(poses), np.asarray(chi2s)
