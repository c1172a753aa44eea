"""Pallas agent-road kernel parity vs the XLA SAT (interpret mode on CPU;
compiled on TPU — validated exact on hardware during bring-up)."""

import numpy as np
import jax
import jax.numpy as jnp

from gpudrive_lab_tpu.core import obb
from gpudrive_lab_tpu.core.pallas_kernels import agent_road_hits_pallas


def test_pallas_matches_xla_sat():
    rng = np.random.default_rng(0)
    W, A, R = 2, 128, 512
    a_pos = rng.uniform(-100, 100, (W, A, 2)).astype(np.float32)
    a_yaw = rng.uniform(-3, 3, (W, A)).astype(np.float32)
    a_half = rng.uniform(0.5, 3, (W, A, 2)).astype(np.float32)
    active = rng.random((W, A)) < 0.8
    is_veh = rng.random((W, A)) < 0.7
    r_pos = rng.uniform(-100, 100, (W, R, 2)).astype(np.float32)
    r_yaw = rng.uniform(-3, 3, (W, R)).astype(np.float32)
    r_half = np.stack(
        [rng.uniform(1, 30, (W, R)), np.full((W, R), 0.1)], -1
    ).astype(np.float32)
    allow_veh = rng.random((W, R)) < 0.5
    allow_other = rng.random((W, R)) < 0.2

    agents_feat = np.concatenate(
        [a_pos, np.cos(a_yaw)[..., None], np.sin(a_yaw)[..., None], a_half,
         active[..., None].astype(np.float32),
         is_veh[..., None].astype(np.float32)], -1,
    )
    roads_feat = np.concatenate(
        [r_pos, np.cos(r_yaw)[..., None], np.sin(r_yaw)[..., None], r_half,
         allow_veh[..., None].astype(np.float32),
         allow_other[..., None].astype(np.float32)], -1,
    )
    roads_t = np.swapaxes(roads_feat, 1, 2).copy()

    got = np.asarray(
        agent_road_hits_pallas(jnp.asarray(agents_feat), jnp.asarray(roads_t))
    )
    hit = np.asarray(
        jax.jit(obb.obb_overlap_sat)(
            jnp.asarray(a_pos[:, :, None]), jnp.asarray(a_yaw[:, :, None]),
            jnp.asarray(a_half[:, :, None]), jnp.asarray(r_pos[:, None]),
            jnp.asarray(r_yaw[:, None]), jnp.asarray(r_half[:, None]),
        )
    )
    allowed = np.where(
        is_veh[:, :, None], allow_veh[:, None], allow_other[:, None]
    )
    want = ((hit & allowed) & active[:, :, None]).any(-1).astype(np.float32)
    np.testing.assert_array_equal(got, want)
