"""Generate a randomized synthetic scene pool (JSON files in the simulator
schema, SURVEY.md Appendix A) for resampling campaigns and IL scaling runs.

Each scene is a rotated/translated multi-lane road with randomized lane
count, spacing, speeds, curvature, agent counts and start offsets; expert
trajectories are exact constant-speed lane-following (collision-free by
construction) with goals placed reachable at the 91-step horizon, so
all-expert replay reaches every goal and RL/IL targets are well-posed.

Scene sizes stay inside one compile bucket (<= 250 road segments,
<= 32 agents) so swap_data_batch never recompiles the train program.

Usage: python scripts/make_scene_pool.py --out data/pool --num 512
"""

import argparse
import json
import math
import os

import numpy as np

T = 91
DT = 0.1


def curved_polyline(rng, x0, y0, heading, length, n_pts, curvature):
    """Points along a constant-curvature arc starting at (x0, y0)."""
    s = np.linspace(0.0, length, n_pts)
    if abs(curvature) < 1e-6:
        xs = x0 + s * math.cos(heading)
        ys = y0 + s * math.sin(heading)
    else:
        r = 1.0 / curvature
        ang = heading + s * curvature
        xs = x0 + r * (np.sin(ang) - math.sin(heading))
        ys = y0 - r * (np.cos(ang) - math.cos(heading))
    return xs, ys, heading + s * curvature


def make_scene(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    heading = rng.uniform(-math.pi, math.pi)
    cx, cy = rng.uniform(-2000, 2000, 2)
    n_lanes = int(rng.integers(2, 7))
    lane_w = rng.uniform(3.5, 4.5)
    curvature = rng.uniform(-1, 1) * 0.004
    length = rng.uniform(120, 240)
    speed_base = rng.uniform(3.0, 10.0)

    objects = []
    oid = 100
    total_agents = 0
    max_agents = int(rng.integers(4, 33))
    for lane_i in range(n_lanes):
        # lane center offset (perpendicular to heading)
        off = (lane_i - (n_lanes - 1) / 2.0) * lane_w
        n_cars = int(rng.integers(1, 7))
        dirsign = 1 if lane_i % 2 == 0 or rng.random() < 0.3 else 1
        speed = speed_base * rng.uniform(0.7, 1.3)
        # same-lane cars share the speed, so enforcing a >= 12 m start gap
        # keeps the whole lane collision-free for the full horizon
        gaps = rng.uniform(12.0, 28.0, n_cars)
        starts = 0.05 * length + np.cumsum(gaps) - gaps[0]
        starts = starts[starts < 0.5 * length]
        # Goal offset calibrated to the trainer's dist_to_goal_threshold
        # (2.0, EnvConfig default): distance at the cutoff step is
        # goal_off <= 2.0 (reached) and one step earlier goal_off +
        # speed*dt > 2.0 (not yet) — the expert goes done EXACTLY at its
        # cutoff, and the padding teleport happens on the first INVALID
        # log step, which collision detection ignores for uncontrolled
        # agents (src/sim.cpp:632-646).  An early-reaching expert would
        # spend valid steps at the shared padding position and
        # phantom-collide there (parity behavior, measured).
        # 0.3 margin over the threshold: the one-step-early distance is
        # goal_off + speed*dt minus small chord/heading/f32 effects
        # (measured up to ~0.03) — a 0.02 margin produced done one step
        # before the cutoff and phantom padding collisions
        goal_off = float(np.clip(2.3 - speed * DT, 0.3, 1.9))
        # Per-agent track cutoffs (the log ends partway through the episode,
        # like real WOMD tracks that leave the scene or stop being observed):
        # goal distances then span ~5-130 m instead of always a full
        # constant-speed episode away — without nearby goals the sparse
        # goal reward gives a fresh policy no gradient and training
        # collapses to "drive safe, reach nothing" (measured round 4:
        # 38M steps on the all-far-goal pool v1 peaked at 0.8% goal).
        # Invalid log steps after the cutoff keep expert replay collision-
        # free BY PARITY: the reference ignores uncontrolled agents at
        # invalid steps in collision detection (src/sim.cpp:632-646), so a
        # goal-done expert teleported to the shared padding position stops
        # colliding there (validated: goal-done VALID experts at padding DO
        # phantom-collide, in our sim and the reference alike).  Cutoffs
        # sort ASCENDING rear-to-front within a lane so in-lane gaps never
        # shrink below the initial >= 12 m while tracks are live; ~30% of
        # agents keep the full horizon.
        # cap at T-2: an agent done at its cutoff is teleported to padding
        # on the NEXT step, which must be an invalid log step even for the
        # "full-horizon" group (done at T-1 would teleport on the final
        # step with a still-valid log and phantom-collide — measured: 6/64
        # scenes with ts=T-1)
        ts_all = np.where(
            rng.random(len(starts)) < 0.3,
            T - 2,
            rng.integers(20, 86, len(starts)),
        )
        ts_all = np.sort(ts_all)  # rear (small s0) ends first
        for j in range(len(starts)):
            if total_agents >= max_agents:
                break
            s0 = starts[j]
            t_stop = int(ts_all[j])
            steps = np.minimum(np.arange(T), t_stop)
            s = s0 + dirsign * speed * DT * steps
            xs, ys, hs = arc_at(cx, cy, heading, curvature, s, off)
            live = np.arange(T) <= t_stop
            # WOMD convention: ERR_VAL positions where the track is invalid
            # (SURVEY.md Appendix A; process_waymo_files.py:39)
            xs = np.where(live, xs, -1e4)
            ys = np.where(live, ys, -1e4)
            moving = np.arange(T) < t_stop
            vxs = np.where(moving, speed * np.cos(hs), 0.0)
            vys = np.where(moving, speed * np.sin(hs), 0.0)
            objects.append(
                {
                    "position": [
                        {"x": float(x), "y": float(y), "z": 0.0}
                        for x, y in zip(xs, ys)
                    ],
                    "width": float(rng.uniform(1.8, 2.3)),
                    "length": float(rng.uniform(4.0, 5.2)),
                    "height": 1.5,
                    "heading": [float(h) for h in hs],
                    "velocity": [
                        {"x": float(vx), "y": float(vy)}
                        for vx, vy in zip(vxs, vys)
                    ],
                    "valid": [bool(v) for v in live],
                    # goal just beyond the final logged position, offset
                    # tuned per speed so the 1 m goal radius is FIRST
                    # entered at the final step (offset + speed*dt > 1 and
                    # offset < 1): an early goal would mark the expert done
                    # and teleport it to the shared padding position, where
                    # simultaneous finishers phantom-collide (parity
                    # behavior, src/sim.cpp:333-343 + 631-666)
                    "goalPosition": {
                        "x": float(xs[t_stop] + goal_off * math.cos(hs[t_stop])),
                        "y": float(ys[t_stop] + goal_off * math.sin(hs[t_stop])),
                        "z": 0.0,
                    },
                    "type": "vehicle",
                    "id": oid,
                    "mark_as_expert": False,
                }
            )
            oid += 1
            total_agents += 1

    roads = []
    rid = 1
    half = (n_lanes / 2.0) * lane_w + rng.uniform(1.0, 2.0)
    n_pts = int(rng.integers(12, 40))
    for off, rtype, meid in [
        (half, "road_edge", 15),
        (-half, "road_edge", 15),
    ]:
        s = np.linspace(-0.1 * length, 1.1 * length, n_pts)
        xs, ys, _ = arc_at(cx, cy, heading, curvature, s, off)
        roads.append(
            {
                "geometry": [
                    {"x": float(x), "y": float(y), "z": 0.0}
                    for x, y in zip(xs, ys)
                ],
                "type": rtype,
                "map_element_id": meid,
                "id": rid,
            }
        )
        rid += 1
    for lane_i in range(n_lanes):
        off = (lane_i - (n_lanes - 1) / 2.0) * lane_w
        s = np.linspace(0, length, max(8, n_pts // 2))
        xs, ys, _ = arc_at(cx, cy, heading, curvature, s, off)
        roads.append(
            {
                "geometry": [
                    {"x": float(x), "y": float(y), "z": 0.0}
                    for x, y in zip(xs, ys)
                ],
                "type": "lane",
                "map_element_id": 2,
                "id": rid,
            }
        )
        rid += 1
    if rng.random() < 0.5:
        xs, ys, _ = arc_at(cx, cy, heading, curvature,
                           np.array([length * 1.05]), half + 2.0)
        roads.append(
            {
                "geometry": [{"x": float(xs[0]), "y": float(ys[0]), "z": 0.0}],
                "type": "stop_sign",
                "map_element_id": 17,
                "id": rid,
            }
        )

    return {
        # SceneDataLoader discovers scenes by the reference's "tfrecord"
        # filename prefix (reference: gpudrive/env/dataset.py:13) — the
        # pool must follow the same convention to be loadable.
        "name": f"tfrecord-synth_{seed}.json",
        "scenario_id": f"synthpool{seed:05d}",
        "objects": objects,
        "roads": roads,
        "tl_states": {},
        "metadata": {
            "sdc_track_index": 0,
            "objects_of_interest": [],
            "tracks_to_predict": [
                {"track_index": 0, "difficulty": 1}
            ],
        },
    }


def arc_at(cx, cy, heading, curvature, s, off):
    """Point at arc-length s with lateral offset off from the center arc."""
    s = np.asarray(s, np.float64)
    if abs(curvature) < 1e-6:
        hs = np.full(s.shape, heading)
        xs = cx + s * math.cos(heading) - off * np.sin(hs)
        ys = cy + s * math.sin(heading) + off * np.cos(hs)
    else:
        r = 1.0 / curvature
        hs = heading + s * curvature
        xs = cx + r * (np.sin(hs) - math.sin(heading)) - off * np.sin(hs)
        ys = cy - r * (np.cos(hs) - math.cos(heading)) + off * np.cos(hs)
    return xs, ys, hs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/pool")
    ap.add_argument("--num", type=int, default=512)
    ap.add_argument("--seed0", type=int, default=1000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    max_roads = 0
    max_agents = 0
    for i in range(args.num):
        scene = make_scene(args.seed0 + i)
        segs = sum(len(r["geometry"]) - 1 or 1 for r in scene["roads"])
        max_roads = max(max_roads, segs)
        max_agents = max(max_agents, len(scene["objects"]))
        with open(
            os.path.join(args.out, f"tfrecord-synth_{args.seed0 + i}.json"),
            "w",
        ) as f:
            json.dump(scene, f)
    print(f"wrote {args.num} scenes to {args.out} "
          f"(max segments {max_roads}, max agents {max_agents})")


if __name__ == "__main__":
    main()
