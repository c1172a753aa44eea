"""Batch camera renderer: export shapes, hit geometry, and shading
(core/render.py; reference: src/mgr.cpp:922-948 rgb/depth tensor exports)."""

import jax
import numpy as np
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.render import (
    EYE_HEIGHT,
    CameraConfig,
    _pixel_dirs,
    batch_render,
    free_camera_render,
)
from gpudrive_lab_tpu.core.types import Params
from gpudrive_lab_tpu.scene.synthetic import synthetic_scene


@pytest.fixture(scope="module")
def rendered():
    scene = synthetic_scene(num_worlds=1, num_agents=4, num_roads=32)
    params = Params()
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    cfg = CameraConfig(height=24, width=32, agent_chunk=2)
    rgb, depth = batch_render(scene, state, cfg)
    return scene, state, cfg, np.asarray(rgb), np.asarray(depth)


def test_export_shapes_match_reference(rendered):
    scene, state, cfg, rgb, depth = rendered
    W, A = np.asarray(state.pos).shape[:2]
    assert rgb.shape == (W, A, cfg.height, cfg.width, 4)
    assert rgb.dtype == np.uint8
    assert depth.shape == (W, A, cfg.height, cfg.width, 1)
    assert depth.dtype == np.float32


def test_invalid_agents_render_empty(rendered):
    scene, state, cfg, rgb, depth = rendered
    invalid = ~np.asarray(scene.agents.valid)
    if invalid.any():
        w, a = np.argwhere(invalid)[0]
        assert (rgb[w, a] == 0).all()
        assert (depth[w, a] == 0).all()


def test_depth_hits_are_positive_and_bounded(rendered):
    scene, state, cfg, rgb, depth = rendered
    valid = np.asarray(scene.agents.valid)
    d = depth[valid]
    hits = d[d > 0]
    assert hits.size > 0, "no geometry hit by any camera ray"
    assert (hits <= cfg.max_depth + 1e-3).all()


def test_agent_ahead_is_seen():
    """A second agent placed straight ahead of the camera agent must appear
    in the image-center pixels at roughly the right depth."""
    scene = synthetic_scene(num_worlds=1, num_agents=4, num_roads=32)
    params = Params()
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    pos = np.array(np.asarray(state.pos))
    yaw = np.array(np.asarray(state.yaw))
    pos[0, 0] = (0.0, 0.0)
    yaw[0, 0] = 0.0
    pos[0, 1] = (20.0, 0.0)  # dead ahead
    yaw[0, 1] = 0.0
    state = state.replace(
        pos=jax.numpy.asarray(pos), yaw=jax.numpy.asarray(yaw)
    )
    cfg = CameraConfig(height=32, width=32, agent_chunk=4)
    rgb, depth = batch_render(scene, state, cfg)
    center = np.asarray(depth)[0, 0, 14:18, 14:18, 0]
    hit = center[center > 0]
    assert hit.size > 0
    # box front face is ~20m minus half the vehicle length
    assert (np.abs(hit - 20.0) < 5.0).all()


def test_free_camera_matches_batch_view_at_agent_pose(rendered):
    """The fly camera placed exactly at an agent's eye pose (pitch 0, self
    box excluded) must reproduce that agent's batch_render view bitwise —
    both paths share the ray lattice and _shade_hits."""
    scene, state, cfg, rgb, depth = rendered
    import jax.numpy as jnp

    a = int(np.nonzero(np.asarray(scene.agents.valid)[0])[0][0])
    eye = np.append(
        np.asarray(state.pos)[0, a],
        np.asarray(state.z)[0, a] + EYE_HEIGHT,
    ).astype(np.float32)
    frgb, fdepth = free_camera_render(
        scene, state, jnp.asarray(eye),
        jnp.float32(np.asarray(state.yaw)[0, a]), jnp.float32(0.0),
        cfg, world=0, exclude_agent=a,
    )
    np.testing.assert_array_equal(np.asarray(frgb), rgb[0, a])
    np.testing.assert_allclose(
        np.asarray(fdepth), depth[0, a, :, :, 0], rtol=1e-6
    )


def test_free_camera_pitch_down_sees_geometry_below():
    """Looking straight down from above an agent, the center pixel must hit
    that agent's box roof at the camera height minus the box top."""
    import jax.numpy as jnp

    scene = synthetic_scene(num_worlds=1, num_agents=4, num_roads=32)
    params = Params()
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    a = int(np.nonzero(np.asarray(scene.agents.valid)[0])[0][0])
    over = np.append(np.asarray(state.pos)[0, a], 30.0).astype(np.float32)
    cfg = CameraConfig(height=17, width=17)
    rgb, depth = free_camera_render(
        scene, state, jnp.asarray(over), jnp.float32(0.0),
        jnp.float32(-np.pi / 2), cfg, world=0,
    )
    center = float(np.asarray(depth)[8, 8])
    box_top = float(np.asarray(state.z)[0, a]) + 0.7  # AGENT_HALF_HEIGHT
    assert abs(center - (30.0 - box_top)) < 0.5


def test_fly_camera_controller_keys():
    """FlyCamera key handling: translation follows the yaw heading, look
    keys change yaw/pitch, unknown keys are ignored (headless proxy for the
    --fly viewer mode)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "viewer_example",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "05_interactive_viewer.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, collision_behavior="ignore"),
        scene_paths=["/root/reference/tests/pytest_data/test.json"],
    )
    env.reset()
    fly = mod.FlyCamera(env, height=16, width=16)
    p0 = fly.pos.copy()
    assert fly.handle_key("w")
    moved = fly.pos - p0
    np.testing.assert_allclose(
        moved[:2],
        fly.MOVE * np.array([np.cos(fly.yaw), np.sin(fly.yaw)]),
        atol=1e-5,
    )
    assert moved[2] == 0.0
    y0 = fly.yaw
    assert fly.handle_key("j") and fly.yaw == pytest.approx(y0 + fly.TURN)
    assert fly.handle_key("r") and fly.pos[2] == p0[2] + fly.MOVE
    assert not fly.handle_key("x")
    frame = fly.view()
    assert frame.shape == (16, 16, 4) and frame.dtype == np.uint8


def test_pixel_dirs_unit_and_fov():
    cfg = CameraConfig(height=16, width=16, hfov_deg=90.0)
    d = _pixel_dirs(cfg)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # leftmost column points left (positive y in camera frame), rightmost right
    assert d[:, 0, 1].mean() > 0 and d[:, -1, 1].mean() < 0
    # top rows point up
    assert d[0, :, 2].mean() > 0 and d[-1, :, 2].mean() < 0


def test_sky_ground_split():
    """With no geometry hit, pixels above the horizon are sky-colored and
    below are ground-colored."""
    scene = synthetic_scene(num_worlds=1, num_agents=2, num_roads=8)
    params = Params()
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    # move the camera agent far away from all geometry
    pos = np.array(np.asarray(state.pos))
    pos[0, 0] = (10000.0, 10000.0)
    state = state.replace(pos=jax.numpy.asarray(pos))
    cfg = CameraConfig(height=16, width=16, agent_chunk=2)
    rgb, depth = batch_render(scene, state, cfg)
    top = np.asarray(rgb)[0, 0, 0, 8, :3]
    bottom = np.asarray(rgb)[0, 0, -1, 8, :3]
    assert (np.asarray(depth)[0, 0] == 0).all()
    np.testing.assert_array_equal(top, (153, 204, 255))
    np.testing.assert_array_equal(bottom, (70, 80, 70))
