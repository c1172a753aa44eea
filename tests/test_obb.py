"""OBB narrow-phase unit tests.

Same scenario coverage as the reference's C++ gtest suite
(reference: tests/CollisionDetectionTests.cpp:11-85): axis-aligned overlap,
separation, degenerate point boxes, containment, and exhaustive rotation
sweeps — plus vectorized-lattice consistency checks the reference can't
express.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.core import obb


def overlap(ca, ya, ha, cb, yb, hb):
    f = jax.jit(obb.obb_overlap_from_params)
    return bool(
        np.asarray(
            f(
                jnp.array(ca, jnp.float32), jnp.float32(ya), jnp.array(ha, jnp.float32),
                jnp.array(cb, jnp.float32), jnp.float32(yb), jnp.array(hb, jnp.float32),
            )
        )
    )


def test_axis_aligned_overlapping():
    assert overlap([0, 0], 0.0, [1, 1], [1, 1], 0.0, [1, 1])


def test_axis_aligned_separated():
    assert not overlap([0, 0], 0.0, [1, 1], [3.1, 0], 0.0, [1, 1])


def test_touching_edges_counts_as_overlap():
    # Interval test is inclusive at the boundary, as in the reference.
    assert overlap([0, 0], 0.0, [1, 1], [2, 0], 0.0, [1, 1])


def test_containment():
    assert overlap([0, 0], 0.0, [5, 5], [0.5, 0.5], 0.7, [0.5, 0.5])


def test_point_box_inside_outside():
    assert overlap([0, 0], 0.0, [2, 2], [1, 1], 0.0, [1e-4, 1e-4])
    assert not overlap([0, 0], 0.0, [2, 2], [3, 3], 0.0, [1e-4, 1e-4])


@pytest.mark.parametrize("deg", range(0, 360, 15))
def test_rotation_sweep_overlapping(deg):
    """A long thin box rotated about a nearby box keeps intersecting
    (the reference sweeps 15-degree steps, CollisionDetectionTests.cpp)."""
    yaw = np.deg2rad(deg)
    assert overlap([0, 0], yaw, [4, 0.2], [0, 0], 0.0, [1, 1])


@pytest.mark.parametrize("deg", range(0, 360, 15))
def test_rotation_sweep_separated(deg):
    yaw = np.deg2rad(deg)
    assert not overlap([0, 0], yaw, [1, 0.2], [5, 5], 0.0, [1, 1])


def test_diagonal_gap_needs_sat():
    """Boxes whose AABBs overlap but are separated on a rotated axis —
    catches any fallback to axis-aligned testing."""
    assert not overlap([0, 0], np.pi / 4, [1, 1], [2.3, 2.3], np.pi / 4, [1, 1])


def test_lattice_matches_scalar():
    """The [N, N] broadcasted lattice must agree with per-pair evaluation."""
    rng = np.random.default_rng(0)
    n = 16
    centers = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    yaws = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    halves = rng.uniform(0.2, 2.0, (n, 2)).astype(np.float32)

    cs = obb.corners(jnp.array(centers), jnp.array(yaws), jnp.array(halves))
    lattice = np.asarray(
        jax.jit(obb.obb_overlap)(cs[:, None], cs[None, :])
    )
    for i in range(n):
        for j in range(n):
            got = overlap(
                centers[i], yaws[i], halves[i], centers[j], yaws[j], halves[j]
            )
            assert lattice[i, j] == got, (i, j)
