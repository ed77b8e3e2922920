import jax.numpy as jnp
import numpy as np
import pytest

from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.slam import pose_graph as pg


def T_of(twist):
    return np.asarray(se3.exp_se3(jnp.asarray(twist, jnp.float32)))


def relative(Ta, Tb):
    return np.linalg.inv(Ta) @ Tb


@pytest.mark.slow
def test_chain_with_drift_and_loop_closure(rng):
    """Classic square loop: odometry drifts, loop closure snaps it shut."""
    n = 9
    # Ground truth: walk a square (8 steps of 1m, turning 90deg every 2).
    gt = [np.eye(4, dtype=np.float32)]
    step = T_of([0, 0, 0, 1, 0, 0])
    turn = T_of([0, 0, np.pi / 2, 1, 0, 0])
    for i in range(1, n):
        inc = turn if i % 2 == 0 else step
        gt.append((gt[-1] @ inc).astype(np.float32))

    # Odometry measurements with bias drift.
    drift = T_of([0, 0, 0.02, 0.02, 0.0, 0.0])
    builder = pg.PoseGraphBuilder(node_capacity=16, edge_capacity=32)
    est = [np.eye(4, dtype=np.float32)]
    meas = []
    for i in range(1, n):
        m = (relative(gt[i - 1], gt[i]) @ drift).astype(np.float32)
        meas.append(m)
        est.append((est[-1] @ m).astype(np.float32))
    for i, p in enumerate(est):
        builder.add_node(p)
    for i, m in enumerate(meas):
        builder.add_edge(i, i + 1, m)
    # Loop closure: node n-1 observes node 0 at the true relative pose.
    builder.add_edge(n - 1, 0, relative(gt[n - 1], gt[0]), is_loop=True)

    graph = builder.build()
    before = float(pg.chi2(graph))
    out = pg.optimize(graph, pg.PoseGraphConfig(iterations=20))
    after = float(pg.chi2(out))
    assert after < before * 0.5

    # Drifted endpoint error shrinks substantially after optimization.
    drift_before = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
    poses = np.asarray(out.poses)
    drift_after = np.linalg.norm(poses[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert drift_after < drift_before * 0.6, (drift_before, drift_after)
    # Gauge: node 0 pinned at identity.
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-3)


def test_perfect_measurements_stay_put(rng):
    builder = pg.PoseGraphBuilder(node_capacity=8, edge_capacity=16)
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, 5):
        gt.append((gt[-1] @ T_of([0.01 * i, 0, 0.05, 1, 0.1, 0])).astype(np.float32))
    for p in gt:
        builder.add_node(p)
    for i in range(4):
        builder.add_edge(i, i + 1, relative(gt[i], gt[i + 1]))
    out = pg.optimize(builder.build(), pg.PoseGraphConfig(iterations=10))
    np.testing.assert_allclose(np.asarray(out.poses)[:5], np.stack(gt), atol=1e-3)


def test_huber_downweights_bad_loop(rng):
    """A grossly wrong loop closure must not destroy a consistent chain."""
    builder = pg.PoseGraphBuilder(node_capacity=8, edge_capacity=16)
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, 6):
        gt.append((gt[-1] @ T_of([0, 0, 0, 1, 0, 0])).astype(np.float32))
    for p in gt:
        builder.add_node(p)
    for i in range(5):
        builder.add_edge(i, i + 1, relative(gt[i], gt[i + 1]))
    # Bogus loop closure claiming node 5 is at node 0.
    builder.add_edge(5, 0, np.eye(4, dtype=np.float32), is_loop=True)
    out = pg.optimize(builder.build(), pg.PoseGraphConfig(iterations=15, huber_delta=0.5))
    poses = np.asarray(out.poses)
    # Without robustness the chain would compress towards 0; Huber keeps the
    # endpoint near its odometric position (5, 0, 0).
    assert poses[5][0, 3] > 3.5, poses[5][:3, 3]


def test_inactive_nodes_pinned(rng):
    builder = pg.PoseGraphBuilder(node_capacity=8, edge_capacity=8)
    builder.add_node(np.eye(4))
    builder.add_node(T_of([0, 0, 0, 1, 0, 0]))
    builder.add_edge(0, 1, T_of([0, 0, 0, 1.1, 0, 0]))
    out = pg.optimize(builder.build(), pg.PoseGraphConfig(iterations=5))
    poses = np.asarray(out.poses)
    # Unused capacity slots stay identity.
    np.testing.assert_allclose(poses[5], np.eye(4), atol=1e-4)
    assert np.all(np.isfinite(poses))
