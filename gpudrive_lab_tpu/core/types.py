"""State pytrees and simulation parameters.

The reference stores per-world state in Madrona ECS archetype tables
(reference: src/types.hpp:443-543) exported as flat tensors
(src/mgr.cpp:718-902).  Here the *entire* simulator state is two pytrees of
padded struct-of-arrays device tensors:

  * ``Scene``     — everything static within an episode (map geometry, expert
                    trajectories, per-agent flags).  Produced on host by the
                    scene compiler (gpudrive_lab_tpu.scene), swapped wholesale
                    by ``set_maps`` without recompilation (shapes are padded).
  * ``SimState``  — everything the step function mutates.

Leading dims: W = num worlds, A = 128 agents, R = road entities (bucketed,
<= 10000), T = 91 trajectory steps.  Worlds are the data-parallel axis: the
arrays shard over a device mesh along dim 0 (see gpudrive_lab_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
from flax import struct

from gpudrive_lab_tpu import constants as C


class DynamicsModel(enum.IntEnum):
    """reference: src/init.hpp:97-103."""

    CLASSIC = 0
    INVERTIBLE_BICYCLE = 1
    DELTA_LOCAL = 2
    STATE = 3


class CollisionBehaviour(enum.IntEnum):
    """reference: src/init.hpp:90-95."""

    AGENT_STOP = 0
    AGENT_REMOVED = 1
    IGNORE = 2


class RewardType(enum.IntEnum):
    """reference: src/init.hpp:76-81."""

    DISTANCE_BASED = 0
    ON_GOAL_ACHIEVED = 1


class RoadObsAlgorithm(enum.IntEnum):
    """reference: src/init.hpp:105-109."""

    KNEAREST = 0
    LINEAR = 1  # AllEntitiesWithRadiusFiltering: first-K within radius


@dataclasses.dataclass(frozen=True)
class Params:
    """Static, hashable step-function configuration.

    Mirror of the runtime ``Parameters`` struct (reference:
    src/init.hpp:111-127).  Passed to jit as a static argument: changing any
    field recompiles, which matches the reference where these are fixed per
    ``Manager``.
    """

    dynamics_model: DynamicsModel = DynamicsModel.CLASSIC
    collision_behaviour: CollisionBehaviour = CollisionBehaviour.AGENT_STOP
    reward_type: RewardType = RewardType.ON_GOAL_ACHIEVED
    dist_to_goal_threshold: float = 2.0
    observation_radius: float = 50.0
    road_obs_algorithm: RoadObsAlgorithm = RoadObsAlgorithm.KNEAREST
    enable_lidar: bool = False
    disable_classic_obs: bool = False
    max_num_controlled_agents: int = 10_000
    ignore_non_vehicles: bool = False
    init_only_valid_agents: bool = True
    is_static_agent_controlled: bool = False
    read_from_tracks_to_predict: bool = False
    polyline_reduction_threshold: float = 0.0
    # TPU-specific: use jax.lax.approx_max_k for the road-graph top-K.  The
    # observation is a *set* (the policy max-pools over entities), so a
    # high-recall approximate top-K is semantically equivalent; exact top_k is
    # kept for parity tests.
    approx_top_k: bool = False
    # TPU-specific: how to fetch the K winning road rows after selection.
    # "take" = flat row gather; "dot" = one-hot MXU matmul (exact in
    # f32/HIGHEST — each output is 1.0*value; TPU element gathers retire
    # ~2 elem/cycle while the matmul rides the systolic array).
    road_gather: str = "take"
    # TPU-specific: prune agent-road narrow phase to this many candidate
    # segments per agent (ranked conservatively; see core/collision.py).
    # None = exact all-pairs, matching the reference broadphase semantics.
    collision_top_k: int | None = None
    # TPU-specific: use the scene-static spatial hash (Scene.grid) for the
    # agent-road narrow phase — exact, and O(cell density) per agent instead
    # of O(R).  Wins on large road buckets; requires the scene compiler to
    # have built the grid.
    use_collision_grid: bool = False
    # TPU-specific: tile-skip agent-road narrow phase (Pallas kernel over
    # Morton-sorted road tiles, core/pallas_kernels.py).  Exact.  None =
    # auto: used whenever the scene compiler built Scene.rtiles (it does for
    # road buckets >= scene/rtiles.py TILE_COLLISION_MIN_R); True forces the
    # compiler to build tiles regardless of bucket size; False disables.
    use_tile_collision: bool | None = None


@struct.dataclass
class RoadGraph:
    """Road entities as oriented boxes, one row per *segment* (polyline edges
    become individual thin boxes, reference: src/level_gen.cpp:166-185)."""

    pos: jnp.ndarray  # [W, R, 3] box center (z encodes lidar plane offsets)
    yaw: jnp.ndarray  # [W, R]
    scale: jnp.ndarray  # [W, R, 3] half-extents (d0=half-len, d1, d2)
    etype: jnp.ndarray  # [W, R] int32 EntityType
    rid: jnp.ndarray  # [W, R] int32 source road id
    map_type: jnp.ndarray  # [W, R] int32 waymax MapElementId
    valid: jnp.ndarray  # [W, R] bool — entity exists


@struct.dataclass
class AgentsStatic:
    """Per-agent quantities fixed for the scene (reference:
    src/level_gen.cpp:131-164)."""

    valid: jnp.ndarray  # [W, A] bool — agent was created
    etype: jnp.ndarray  # [W, A] int32 EntityType
    size: jnp.ndarray  # [W, A, 3] raw length/width/height (unscaled)
    goal: jnp.ndarray  # [W, A, 2] demeaned goal position
    aid: jnp.ndarray  # [W, A] int32 source object id (-1 padding)
    controlled: jnp.ndarray  # [W, A] bool — policy-controlled
    static: jnp.ndarray  # [W, A] bool — ResponseType::Static
    mark_as_expert: jnp.ndarray  # [W, A] bool
    metadata: jnp.ndarray  # [W, A, 4] int32 (isSdc, isOOI, isTTP, difficulty)
    traj_pos: jnp.ndarray  # [W, A, T, 2] demeaned logged positions
    traj_vel: jnp.ndarray  # [W, A, T, 2]
    traj_yaw: jnp.ndarray  # [W, A, T]
    traj_valid: jnp.ndarray  # [W, A, T] float (0/1)
    traj_inv_actions: jnp.ndarray  # [W, A, T, 10] precomputed inverse actions


@struct.dataclass
class CollisionGrid:
    """Scene-static spatial hash over road entities: per world, each coarse
    cell lists the road indices whose boxes (expanded by the max agent
    radius) touch it.  Replaces the reference's broadphase BVH for the
    agent-road narrow phase on large road buckets — the candidate count per
    agent becomes O(cell density) instead of O(R)."""

    origin: jnp.ndarray  # [W, 2] grid lower corner
    cell_size: jnp.ndarray  # [W] float32
    dims: jnp.ndarray  # [W, 2] int32 (gx, gy) actually used per world
    table: jnp.ndarray  # [W, GY, GX, K] int32 road indices, -1 padding


@struct.dataclass
class RoadTiles:
    """Scene-static spatially-sorted road tiles for the tile-skip agent-road
    narrow phase (core/pallas_kernels.agent_road_hits_tiled).

    Segments are Morton-ordered within each world at scene-compile time so a
    tile of RT consecutive segments covers a compact spatial patch; the
    kernel then skips whole [agent-block, tile] blocks whose AABB distance
    bound proves no overlap is possible.  Replaces the role of the
    reference's broadphase BVH (madrona) for large road buckets — but as
    dense tile-granular work-skipping instead of per-entity candidate lists,
    which measured faster on TPU (docs/PERFORMANCE.md)."""

    feat: jnp.ndarray  # [W, T, 8, RT] f32 rows: px, py, cos, sin, h0, h1,
    #                     allow_vehicle, allow_other (0 for invalid segments)
    bounds: jnp.ndarray  # [W, T, 6] f32: xmin, ymin, xmax, ymax (over valid
    #                       segment centers), reach (max segment half-diag),
    #                       valid (tile has any valid segment)
    world_min: jnp.ndarray  # [W, 2] road AABB lower corner (agent Morton)
    world_inv_ext: jnp.ndarray  # [W, 2] 1 / road AABB extent

    @property
    def tile_size(self) -> int:
        return self.feat.shape[3]


@struct.dataclass
class Scene:
    """One batch of compiled worlds; the analogue of the reference's per-world
    ``Map`` singleton + the entities created from it (src/level_gen.cpp)."""

    agents: AgentsStatic
    roads: RoadGraph
    num_agents: jnp.ndarray  # [W] int32 — Shape.agentEntityCount
    num_roads: jnp.ndarray  # [W] int32 — Shape.roadEntityCount
    means: jnp.ndarray  # [W, 3] per-world mean subtracted from coords
    map_name: jnp.ndarray  # [W, 32] int32 char codes
    scenario_id: jnp.ndarray  # [W, 32] int32 char codes
    grid: CollisionGrid | None = None
    rtiles: RoadTiles | None = None

    @property
    def num_worlds(self) -> int:
        return self.num_agents.shape[0]

    @property
    def max_agents(self) -> int:
        return self.agents.valid.shape[1]

    @property
    def max_roads(self) -> int:
        return self.roads.valid.shape[1]


@struct.dataclass
class SimState:
    """Mutable per-step state (the union of the reference's dynamic ECS
    components: Position/Rotation/Velocity/Done/Info/StepsRemaining/...)."""

    pos: jnp.ndarray  # [W, A, 2]
    z: jnp.ndarray  # [W, A] (1 for live agents, FLT_MAX when teleported away)
    yaw: jnp.ndarray  # [W, A]
    vel: jnp.ndarray  # [W, A, 2] linear velocity
    ang_vel: jnp.ndarray  # [W, A] angular velocity about z
    collided: jnp.ndarray  # [W, A] int32 CollisionDetectionEvent.hasCollided
    done: jnp.ndarray  # [W, A] int32
    # Info (reference: src/types.hpp:163-184) minus the static `type` column.
    collided_road: jnp.ndarray  # [W, A] int32
    collided_vehicle: jnp.ndarray  # [W, A] int32
    collided_non_vehicle: jnp.ndarray  # [W, A] int32
    reached_goal: jnp.ndarray  # [W, A] int32
    steps_remaining: jnp.ndarray  # [W, A] int32
    reward: jnp.ndarray  # [W, A] float32

    @property
    def speed(self) -> jnp.ndarray:
        return jnp.linalg.norm(self.vel, axis=-1)


def zero_state(num_worlds: int, max_agents: int = C.MAX_AGENTS) -> SimState:
    wa = (num_worlds, max_agents)
    f = lambda *shape: jnp.zeros(wa + shape, jnp.float32)
    i = lambda: jnp.zeros(wa, jnp.int32)
    return SimState(
        pos=f(2), z=f(), yaw=f(), vel=f(2), ang_vel=f(),
        collided=i(), done=i(), collided_road=i(), collided_vehicle=i(),
        collided_non_vehicle=i(), reached_goal=i(), steps_remaining=i(),
        reward=f(),
    )
