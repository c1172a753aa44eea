"""Generate the scenario-level collision fixtures
(tests/data/agent_agent_collision.json, agent_road_edge_collision.json).

TPU-native translations of the reference's orphaned scenario fixtures
(reference: tests/agent-agent-collision.json, tests/agent-road-edge-collision.json
— single-timestep sketches no reference test consumes), extended to full
91-step expert trajectories so the cases exercise the simulator end-to-end:

  * agent-agent: a 1x1 vehicle at the origin drives +y at 1 m/s into a
    static 1x1 vehicle 5 m ahead.  With the 0.7 size scale
    (src/level_gen.cpp:131-164) the boxes first touch at dy = 0.7, i.e.
    step 43; no contact before that.
  * agent-road-edge: a stationary 1x1 vehicle sits on a road edge running
    through the origin -> collidedWithRoad from the first step.

Run: python tests/data/make_collision_fixtures.py
"""

import json
import math
from pathlib import Path

T = 91
DT = 0.1


def _obj(oid, xs, ys, heading, vx, vy, goal):
    return {
        "position": [{"x": x, "y": y, "z": 0.0} for x, y in zip(xs, ys)],
        "width": 1.0,
        "length": 1.0,
        "height": 1.0,
        "heading": [heading] * T,
        "velocity": [{"x": vx, "y": vy} for _ in range(T)],
        "valid": [True] * T,
        "goalPosition": {"x": goal[0], "y": goal[1], "z": 0.0},
        "type": "vehicle",
        "id": oid,
        "mark_as_expert": False,
    }


def agent_agent_scene():
    ys = [DT * t for t in range(T)]  # 1 m/s toward the parked car
    mover = _obj(1, [0.0] * T, ys, math.pi / 2, 0.0, 1.0, (500.0, 500.0))
    parked = _obj(2, [0.0] * T, [5.0] * T, 0.0, 0.0, 0.0, (-500.0, 500.0))
    return {
        "name": "agent_agent_collision.json",
        "scenario_id": "agent_agent_collision",
        "objects": [mover, parked],
        "roads": [
            {
                "geometry": [
                    {"x": -50.0, "y": -20.0, "z": 0.0},
                    {"x": 50.0, "y": -20.0, "z": 0.0},
                ],
                "type": "road_edge",
                "id": 10,
            }
        ],
        "tl_states": {},
        "metadata": {},
    }


def agent_road_edge_scene():
    still = _obj(1, [0.0] * T, [0.0] * T, 0.0, 0.0, 0.0, (500.0, 500.0))
    return {
        "name": "agent_road_edge_collision.json",
        "scenario_id": "agent_road_edge_collision",
        "objects": [still],
        "roads": [
            {
                "geometry": [
                    {"x": 10.0, "y": 10.0, "z": 0.0},
                    {"x": -10.0, "y": -10.0, "z": 0.0},
                ],
                "type": "road_edge",
                "id": 10,
            }
        ],
        "tl_states": {},
        "metadata": {},
    }


if __name__ == "__main__":
    here = Path(__file__).parent
    for name, scene in [
        ("agent_agent_collision.json", agent_agent_scene()),
        ("agent_road_edge_collision.json", agent_road_edge_scene()),
    ]:
        (here / name).write_text(json.dumps(scene))
        print("wrote", here / name)
