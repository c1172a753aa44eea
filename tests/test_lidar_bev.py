"""Lidar and BEV collector tests on a controlled synthetic scene where the
geometry (straight road edges at y=+-10, vehicles on known lanes) makes hit
distances analytically checkable."""

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.bev import bev_observation
from gpudrive_lab_tpu.core.lidar import lidar_observation
from gpudrive_lab_tpu.core.types import Params
from gpudrive_lab_tpu.scene.synthetic import synthetic_scene

PARAMS = Params(observation_radius=50.0)


def _setup():
    scene = synthetic_scene(num_worlds=1, num_agents=4, num_roads=16)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, PARAMS
    )
    return scene, state


def test_lidar_shapes_and_planes():
    scene, state = _setup()
    acts = jnp.zeros((1, C.MAX_AGENTS, C.ACTION_DIM))
    lid = np.asarray(
        jax.jit(lidar_observation, static_argnames="params")(
            scene, state, PARAMS, acts
        )
    )
    assert lid.shape == (1, C.MAX_AGENTS, 3, C.NUM_LIDAR_SAMPLES, 4)
    n = 4
    # padding rows zero
    assert (lid[0, n:] == 0).all()
    # depth nonnegative, bounded by range
    assert (lid[0, :n, :, :, 0] >= 0).all()
    assert (lid[0, :n, :, :, 0] <= C.LIDAR_DISTANCE + 1e-3).all()


def test_lidar_hits_vehicle_ahead():
    """Agent 1 sits 4m left (y) of agent 0... actually agents are on lanes
    spaced 4m in y; agent on the same row 15m ahead in x should be hit by the
    near-axis rays of the cars plane."""
    scene, state = _setup()
    pos = np.asarray(state.pos)[0]
    # find a pair roughly aligned in y, separated in x
    yaw0 = float(np.asarray(state.yaw)[0, 0])
    assert abs(yaw0) < 1e-5
    acts = jnp.zeros((1, C.MAX_AGENTS, C.ACTION_DIM))
    lid = np.asarray(
        jax.jit(lidar_observation, static_argnames="params")(
            scene, state, PARAMS, acts
        )
    )
    # agent 0 at (-30, -6); agent 4 rows exist? num_agents=4 -> lanes
    # (-30,-6),(-30,-2),(-30,2),(-30,6): no one directly ahead in x.
    # Rays to the side: road-edge plane should see the y=+-10 edges for the
    # most extreme cone angles only if the edge is within the 120-degree
    # cone; heading +x, edge parallel -> rays at +-60 degrees hit it at
    # dist = (10 - y0)/sin(60).
    y0 = pos[0, 1]
    # nearest possible edge hit: steepest ray (+-60 deg) against the nearer
    # edge's inner face (|y| = 10 - 0.1)
    near_edge = min(9.9 - y0, 9.9 + y0)
    expected = near_edge / np.sin(C.LIDAR_ANGLE)
    edge_plane = lid[0, 0, 1]  # road-edge plane samples
    hit_types = edge_plane[:, 1]
    hit_depths = edge_plane[:, 0]
    edge_hits = hit_depths[hit_types == C.ET_ROAD_EDGE]
    assert len(edge_hits) > 0
    assert abs(edge_hits.min() - expected) < 0.5


def test_lidar_plane_type_separation():
    scene, state = _setup()
    acts = jnp.zeros((1, C.MAX_AGENTS, C.ACTION_DIM))
    lid = np.asarray(
        jax.jit(lidar_observation, static_argnames="params")(
            scene, state, PARAMS, acts
        )
    )
    # cars plane (z=1.5) must never report road edges (z extent 1.0-1.2)
    cars_types = set(np.unique(lid[0, :4, 0, :, 1]))
    assert C.ET_ROAD_EDGE not in cars_types
    # road-line plane (z=0.9) must never report road edges either
    line_types = set(np.unique(lid[0, :4, 2, :, 1]))
    assert C.ET_ROAD_EDGE not in line_types


def test_bev_shapes_and_contents():
    scene, state = _setup()
    bev = np.asarray(
        jax.jit(bev_observation, static_argnames="params")(
            scene, state, PARAMS
        )
    )
    assert bev.shape == (1, C.MAX_AGENTS, C.BEV_RESOLUTION, C.BEV_RESOLUTION, 1)
    vals = set(np.unique(bev[0, :4]))
    # Scene has road edges and vehicles only
    assert vals.issubset({0.0, float(C.ET_ROAD_EDGE), float(C.ET_VEHICLE)})
    assert float(C.ET_ROAD_EDGE) in vals
    assert float(C.ET_VEHICLE) in vals
    # padding agents: empty grids
    assert (bev[0, 4:] == 0).all()


def test_bev_vehicle_cell_positions():
    """A partner 4m above (ego frame +y) must paint cells near py=+4."""
    scene, state = _setup()
    bev = np.asarray(
        jax.jit(bev_observation, static_argnames="params")(
            scene, state, PARAMS
        )
    )[0, 0, :, :, 0]
    res = C.BEV_RESOLUTION
    radius = PARAMS.observation_radius
    scale_px = 2 * radius / res
    veh_cells = np.argwhere(bev == C.ET_VEHICLE)
    assert len(veh_cells) > 0
    ys = veh_cells[:, 0] * scale_px - radius
    xs = veh_cells[:, 1] * scale_px - radius
    pos = np.asarray(state.pos)[0]
    rel = pos[1:4] - pos[0]
    # every painted vehicle cell lies near one of the partner positions
    d = np.min(
        np.hypot(xs[:, None] - rel[:, 0][None], ys[:, None] - rel[:, 1][None]),
        axis=1,
    )
    assert d.max() < 4.0


def test_render_3d_mode(example_scene_paths):
    """render_3d vis config produces 3-D perspective frames
    (reference: visualize/core.py 3-D branch)."""
    import jax
    import numpy as np

    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.env.config import EnvConfig, RenderConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.visualize.core import MatplotlibVisualizer

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, collision_behavior="ignore"),
        scene_paths=example_scene_paths[:1],
        render_config=RenderConfig(render_3d=True),
    )
    env.reset()
    imgs = env.vis.plot_simulator_state(env.state, env_indices=[0],
                                        zoom_radius=80.0)
    assert len(imgs) == 1 and imgs[0].ndim == 3
    # 2D still works on the same scene via an explicit visualizer
    vis2d = MatplotlibVisualizer(env.scene)
    img2d = vis2d.plot_simulator_state(env.state, env_indices=[0])[0]
    assert img2d.ndim == 3


def test_lidar_chunked_road_scan_matches_dense():
    """The memory-bounded chunked road reduction matches the dense
    [W, A, 3, S, R] path on a real scene: hit TYPES exactly (same winner,
    same tie-breaks), float fields to 1e-4 (the two program structures fuse
    the slab test differently, giving last-ulp depth differences).  Chunk
    96 does not divide R, exercising the padded tail."""
    from gpudrive_lab_tpu.scene.compiler import build_scene

    scene = build_scene(
        ["/root/reference/tests/pytest_data/test.json"], PARAMS
    )
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, PARAMS
    )
    A = scene.agents.valid.shape[1]
    rng = np.random.default_rng(0)
    acts = jnp.asarray(
        rng.normal(size=(1, A, C.ACTION_DIM)).astype(np.float32)
    )
    dense = np.asarray(
        lidar_observation(scene, state, PARAMS, acts, road_chunk=0)
    )
    for chunk in (64, 96):
        part = np.asarray(
            lidar_observation(scene, state, PARAMS, acts, road_chunk=chunk)
        )
        np.testing.assert_array_equal(part[..., 1], dense[..., 1])
        np.testing.assert_allclose(part, dense, rtol=1e-4, atol=1e-4)


def test_lidar_world_grouped_matches_dense():
    """World-group mapping (the large-R memory strategy) matches the single
    dense program: hit types exactly, float fields to 1e-4 (the lax.map
    body fuses slightly differently -> last-ulp depth noise).  Group 3
    does not divide W=4, exercising the padded group."""
    scene = synthetic_scene(num_worlds=4, num_agents=4, num_roads=16)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, PARAMS
    )
    A = scene.agents.valid.shape[1]
    rng = np.random.default_rng(1)
    acts = jnp.asarray(
        rng.normal(size=(4, A, C.ACTION_DIM)).astype(np.float32)
    )
    dense = np.asarray(
        lidar_observation(scene, state, PARAMS, acts, world_group=4)
    )
    for wg in (1, 2, 3):
        part = np.asarray(
            lidar_observation(scene, state, PARAMS, acts, world_group=wg)
        )
        np.testing.assert_array_equal(part[..., 1], dense[..., 1])
        np.testing.assert_allclose(part, dense, rtol=1e-4, atol=1e-4)


def test_bev_gather_chunked_matches_dense():
    """The gather-then-compute chunked BEV (first-K road selection +
    per-world/agent-chunk lax.map) is bitwise-identical to the dense
    [W, A, cells, R] reference path on a real scene — coverage tests and
    paint-order composition are pure comparisons, so no float slop.
    Pool scenes (R bucket 256) keep the dense oracle's [A, cells, R, 2]
    lattice inside host memory — it OOMs at test.json's R=9984, which is
    exactly why the chunked path exists."""
    import glob

    from gpudrive_lab_tpu.scene.compiler import build_scene

    paths = sorted(glob.glob("data/pool_v3/*.json"))[:2]
    scene = build_scene(paths, PARAMS, max_agents="auto")
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, PARAMS
    )
    dense = np.asarray(bev_observation(scene, state, PARAMS, agent_chunk=0))
    for chunk in (8, 5):  # 5 does not divide A: exercises wrapped padding
        part = np.asarray(
            bev_observation(scene, state, PARAMS, agent_chunk=chunk)
        )
        np.testing.assert_array_equal(part, dense)
