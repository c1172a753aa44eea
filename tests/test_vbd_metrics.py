"""VBD guidance-metric suite: signed-distance geometry, reference
semantics, steering effects, and the iLQ linearization
(mirrors /root/reference .../guidance_metrics/: overlap_metric.py,
onroad_metric.py, tracking_metric.py, control_metric.py, ilqgame.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.vbd import ilq
from gpudrive_lab_tpu.vbd.guidance_metrics import (
    control_reward,
    goal_reward,
    obb_corners,
    onroad_reward,
    overlap_reward,
    overlap_reward_simple,
    signed_distance_obb,
    smooth_l1,
    tracking_reward,
)


def _box(x, y, le, wd, yaw):
    return jnp.asarray([x, y, le, wd, yaw], jnp.float32)


class TestSignedDistance:
    def test_separated_axis_aligned(self):
        # gap between facing edges = 10 - 2 - 1 = 7
        sd = signed_distance_obb(_box(0, 0, 4, 2, 0), _box(10, 0, 2, 2, 0))
        assert np.isclose(float(sd), 7.0, atol=1e-5)

    def test_overlapping_penetration_depth(self):
        # centers 3 apart along x, half-lengths 2+2 -> 1 deep
        sd = signed_distance_obb(_box(0, 0, 4, 2, 0), _box(3, 0, 4, 2, 0))
        assert np.isclose(float(sd), -1.0, atol=1e-5)

    def test_rotated_pair_matches_sat(self):
        from gpudrive_lab_tpu.core.obb import obb_overlap_sat

        rng = np.random.default_rng(0)
        a = np.stack(
            [rng.uniform(-5, 5, 256), rng.uniform(-5, 5, 256),
             rng.uniform(1, 6, 256), rng.uniform(1, 3, 256),
             rng.uniform(-3, 3, 256)], -1,
        ).astype(np.float32)
        b = np.stack(
            [rng.uniform(-5, 5, 256), rng.uniform(-5, 5, 256),
             rng.uniform(1, 6, 256), rng.uniform(1, 3, 256),
             rng.uniform(-3, 3, 256)], -1,
        ).astype(np.float32)
        sd = np.asarray(signed_distance_obb(jnp.asarray(a), jnp.asarray(b)))
        hit = np.asarray(
            obb_overlap_sat(
                jnp.asarray(a[:, 0:2]), jnp.asarray(a[:, 4]),
                jnp.asarray(a[:, 2:4]) / 2,
                jnp.asarray(b[:, 0:2]), jnp.asarray(b[:, 4]),
                jnp.asarray(b[:, 2:4]) / 2,
            )
        )
        # sign agrees with the production SAT everywhere (tolerance at 0)
        assert np.all((sd < 1e-4) == hit)

    def test_gradient_pushes_apart(self):
        f = lambda x: signed_distance_obb(
            _box(x[0], 0, 4, 2, 0.3), _box(3, 0.5, 4, 2, -0.2)
        )
        g = jax.grad(lambda x: f(x).sum())(jnp.asarray([0.5]))
        # moving A left (decreasing x) increases separation -> d(sd)/dx < 0
        assert float(g[0]) < 0

    def test_corners_form_box_boundary(self):
        c = np.asarray(obb_corners(_box(1, 2, 4, 2, 0.0)))
        assert sorted(map(tuple, np.round(c, 5).tolist())) == sorted(
            [(3, 1), (3, 3), (-1, 1), (-1, 3)]
        )


def _batch(A=4, B=1, P=4, K=8):
    hist = np.zeros((B, A, 11, 8), np.float32)
    hist[..., -1, 5] = 4.0  # length
    hist[..., -1, 6] = 2.0  # width
    poly = np.zeros((B, P, K, 5), np.float32)
    return {
        "agents_history": jnp.asarray(hist),
        "agents_interested": jnp.ones((B, A), jnp.int32),
        "polylines": jnp.asarray(poly),
    }


def _trajs(pos_list, T=6):
    """[1, A, T, 5] straight trajectories from (x, y, yaw, speed)."""
    A = len(pos_list)
    out = np.zeros((1, A, T, 5), np.float32)
    for a, (x, y, yaw, v) in enumerate(pos_list):
        ts = np.arange(T) * 0.1
        out[a and 0 or 0, a, :, 0] = x + v * ts * np.cos(yaw)
        out[0, a, :, 1] = y + v * ts * np.sin(yaw)
        out[0, a, :, 2] = yaw
        out[0, a, :, 3] = v * np.cos(yaw)
        out[0, a, :, 4] = v * np.sin(yaw)
    return jnp.asarray(out)


class TestOverlap:
    def test_close_pair_penalized_far_pair_clipped(self):
        batch = _batch(A=3)
        trajs = _trajs([(0, 0, 0, 0), (3, 0, 0, 0), (100, 0, 0, 0)])
        r = np.asarray(overlap_reward(clip=5.0)(trajs, None, batch))
        assert r.shape == (1, 3, 6, 3)
        assert r[0, 0, 0, 1] < 0  # overlapping pair: negative signed dist
        assert r[0, 0, 0, 2] == 0  # far pair clipped out
        assert r[0, 0, 0, 0] == 0  # self
        # reward is symmetric for the overlapping pair
        assert np.isclose(r[0, 0, 0, 1], r[0, 1, 0, 0], atol=1e-5)

    def test_gradient_separates_overlapping_agents(self):
        batch = _batch(A=2)
        trajs = _trajs([(0, 0, 0, 0), (3, 0, 0, 0)])

        def total(tr):
            return overlap_reward()(tr, None, batch).sum()

        g = jax.grad(total)(trajs)
        # ascending the reward moves agent 0 left, agent 1 right
        assert float(g[0, 0, 0, 0]) < 0
        assert float(g[0, 1, 0, 0]) > 0

    def test_simple_variant_uses_center_distance(self):
        batch = _batch(A=2)
        trajs = _trajs([(0, 0, 0, 0), (3, 0, 0, 0)])
        r = np.asarray(overlap_reward_simple(clip=5.0)(trajs, None, batch))
        assert np.isclose(r[0, 0, 0, 1], 3.0, atol=1e-5)


class TestOnroad:
    def _edge_batch(self):
        """One road-edge polyline along y=2 heading +x.  The onroad side is
        the LEFT of the edge direction (cross(point-edge, dir) < 0), i.e.
        y > 2 here — matching the reference's sign convention
        (onroad_metric.py:197-215)."""
        batch = _batch(A=2, P=2, K=8)
        poly = np.zeros((1, 2, 8, 5), np.float32)
        poly[0, 0, :, 0] = np.linspace(-20, 20, 8)
        poly[0, 0, :, 1] = 2.0
        poly[0, 0, :, 2] = 0.0  # heading +x
        poly[0, 0, :, 4] = 1.0  # ET_ROAD_EDGE
        batch["polylines"] = jnp.asarray(poly)
        return batch

    # agent 0: starts onroad at y=8, drives down across the edge
    # (yaw=-pi/2, 15 m/s -> y: 8 .. 0.5); agent 1 parked onroad
    _AGENTS = [(0.0, 8.0, -np.pi / 2, 15.0), (5.0, 8.0, 0.0, 0.0)]

    def test_crossing_agent_costed_inside_agent_free(self):
        batch = self._edge_batch()
        trajs = _trajs(self._AGENTS)
        r = np.asarray(onroad_reward(weight=1.0)(trajs, None, batch))
        assert r.shape == (1, 2, 6)
        assert r[0, 0, 0] == 0  # onroad at spawn
        assert r[0, 0, -1] < 0  # crossed the edge -> costed
        assert np.all(r[0, 1] == 0)  # parked onroad agent free

    def test_initially_offroad_agent_not_penalized(self):
        batch = self._edge_batch()
        trajs = _trajs([(0, -5, 0, 0)])  # offroad (right of edge) from t=0
        batch["agents_interested"] = jnp.ones((1, 1), jnp.int32)
        batch["agents_history"] = batch["agents_history"][:, :1]
        r = np.asarray(onroad_reward()(trajs, None, batch))
        assert np.all(r == 0)

    def test_gradient_pulls_crosser_back(self):
        batch = self._edge_batch()

        def total(tr):
            return onroad_reward(weight=1.0)(tr, None, batch).sum()

        g = jax.grad(total)(jnp.asarray(_trajs(self._AGENTS)))
        # ascending the reward pushes the crossed agent back up (onroad)
        assert float(g[0, 0, -1, 1]) > 0


def test_tracking_goal_control_rewards():
    batch = _batch(A=2)
    trajs = _trajs([(0, 0, 0, 2), (5, 5, 0, 1)])
    ref = trajs + 1.0
    tr = np.asarray(tracking_reward(ref[..., :2])(trajs, None, batch))
    assert tr.shape == (1, 2, 6, 2)
    assert np.allclose(tr, -0.5)  # smooth-l1 of unit error
    goal = trajs[:, :, -1, 0:2] + jnp.asarray([0.0, 2.0])
    gr = np.asarray(goal_reward(goal)(trajs, None, batch))
    assert np.allclose(gr[..., 0], 0.0) and np.all(gr[..., 1] < 0)
    acts = jnp.ones((1, 2, 6, 2)) * 0.5
    cr = np.asarray(control_reward(1.0, 2.0)(trajs, acts, batch))
    assert np.allclose(cr, -(0.25 + 0.5))


def test_smooth_l1_matches_torch_semantics():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    got = np.asarray(smooth_l1(x))
    want = np.asarray([1.5, 0.125, 0.0, 0.125, 1.5])
    np.testing.assert_allclose(got, want, atol=1e-6)


class TestILQ:
    def test_dynamics_straight_line(self):
        s = jnp.asarray([0.0, 0.0, 0.0, 2.0, 0.0])
        a = jnp.asarray([0.0, 0.0])
        nxt = np.asarray(ilq.dynamics(s, a, dt=0.1, action_len=2))
        np.testing.assert_allclose(nxt, [0.4, 0.0, 0.0, 2.0, 0.0], atol=1e-5)

    def test_linearize_matches_finite_differences(self):
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32)) + jnp.asarray(
            [0.0, 0.0, 0.0, 3.0, 0.0]
        )
        a = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32) * 0.1)
        A, B = ilq.linearize(s, a)
        assert A.shape == (3, 5, 5) and B.shape == (3, 5, 2)
        eps = 1e-3
        for k in range(2):
            da = np.zeros(2, np.float32)
            da[k] = eps
            fd = (
                np.asarray(ilq.dynamics(s, a + da))
                - np.asarray(ilq.dynamics(s, a - da))
            ) / (2 * eps)
            np.testing.assert_allclose(np.asarray(B[..., k]), fd, atol=5e-2)
