"""Generate the self-contained synthetic scenario fixture
(tests/data/tfrecord_synthetic_0.json): four vehicles driving straight
between two road edges with constant velocity for 91 steps — enough for the
contract tests when the WOMD reference data is unavailable (CI checkouts).

Run: python tests/data/make_fixture.py
"""

import json
import math
from pathlib import Path

T = 91
DT = 0.1
SPEED = 5.0


def make_scene():
    objects = []
    lanes_y = [-6.0, -2.0, 2.0, 6.0]
    for i, y in enumerate(lanes_y):
        x0 = -30.0 + 5.0 * i
        xs = [x0 + SPEED * DT * t for t in range(T)]
        objects.append(
            {
                "position": [{"x": x, "y": y, "z": 0.0} for x in xs],
                "width": 2.0,
                "length": 4.5,
                "height": 1.5,
                "heading": [0.0] * T,
                "velocity": [{"x": SPEED, "y": 0.0} for _ in range(T)],
                "valid": [True] * T,
                # Goal 0.7m BEYOND the final logged position: with 0.5m/step
                # motion the goal radius (1m in the contract tests) is first
                # entered at the final step, so all-expert replay reaches
                # every goal exactly at the 91-step horizon.
                "goalPosition": {"x": xs[-1] + 0.7, "y": y, "z": 0.0},
                "type": "vehicle",
                "id": 100 + i,
                "mark_as_expert": False,
            }
        )

    def edge(y, rid):
        return {
            "geometry": [
                {"x": -60.0 + 4.0 * k, "y": y, "z": 0.0} for k in range(40)
            ],
            "type": "road_edge",
            "map_element_id": 15,
            "id": rid,
        }

    def lane(y, rid):
        return {
            "geometry": [
                {"x": -60.0 + 8.0 * k, "y": y, "z": 0.0} for k in range(20)
            ],
            "type": "lane",
            "map_element_id": 2,
            "id": rid,
        }

    roads = [edge(10.0, 1), edge(-10.0, 2)] + [
        lane(y, 10 + i) for i, y in enumerate(lanes_y)
    ]
    roads.append(
        {
            "geometry": [{"x": 62.0, "y": 8.0, "z": 0.0}],
            "type": "stop_sign",
            "map_element_id": 17,
            "id": 50,
        }
    )

    return {
        "name": "tfrecord_synthetic_0.json",
        "scenario_id": "synthetic0",
        "objects": objects,
        "roads": roads,
        "tl_states": {},
        "metadata": {
            "sdc_track_index": 0,
            "objects_of_interest": [101],
            "tracks_to_predict": [{"track_index": 1, "difficulty": 1}],
        },
    }


if __name__ == "__main__":
    out = Path(__file__).parent / "tfrecord_synthetic_0.json"
    out.write_text(json.dumps(make_scene()))
    print(f"wrote {out}")
