"""Summarize a PPO campaign's metrics JSONL into the convergence table.

Reads <run_dir>/ppo.metrics.jsonl (written by gpudrive_lab_tpu.ppo.train),
bins the goal-rate / entropy / SPS curves at ~N evenly spaced checkpoints,
and prints both a markdown table (for docs/PERFORMANCE.md) and a one-line
JSON summary.  Windowed means smooth the per-iteration noise (episode-end
metrics only move when worlds finish).

Usage: python scripts/campaign_report.py runs/campaign [--points 12]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load_rows(run_dir: str) -> list[dict]:
    rows = []
    for line in (Path(run_dir) / "ppo.metrics.jsonl").read_text().splitlines():
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "global_step" in r:
            rows.append(r)
    rows.sort(key=lambda r: r["global_step"])
    return rows


def window_mean(rows: list[dict], key: str) -> float | None:
    vals = [r[key] for r in rows if key in r]
    return sum(vals) / len(vals) if vals else None


def episode_weighted_mean(rows: list[dict], key: str) -> float | None:
    """Weight each logged rate by its window's completed-episode count
    (train.py logs episode-windowed rates; rows with episodes=0 carry no
    information and would otherwise drag the mean toward zero).  Legacy
    rows without an episodes field (pre-windowed-logging) are excluded
    rather than guessed at weight 1."""
    num = den = 0.0
    for r in rows:
        if key in r:
            w = float(r.get("episodes", 0.0))
            num += r[key] * w
            den += w
    if den == 0.0:
        return window_mean(rows, key)
    return num / den


def summarize(rows: list[dict], points: int) -> list[dict]:
    """Split the run into `points` contiguous step windows; report each
    window's end step and windowed means."""
    if not rows:
        return []
    total = rows[-1]["global_step"]
    out = []
    for i in range(points):
        lo = total * i // points
        hi = total * (i + 1) // points
        win = [r for r in rows if lo < r["global_step"] <= hi]
        if not win:
            continue
        out.append(
            {
                "step": win[-1]["global_step"],
                "goal_rate": episode_weighted_mean(win, "perc_goal_achieved"),
                "collision_rate": episode_weighted_mean(win, "perc_collisions"),
                "off_road": episode_weighted_mean(win, "perc_off_road"),
                "entropy": window_mean(win, "entropy"),
                "sps": window_mean(win, "controlled_agent_sps"),
            }
        )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--points", type=int, default=12)
    args = p.parse_args()

    rows = load_rows(args.run_dir)
    table = summarize(rows, args.points)
    print("| agent-steps | goal rate | collision | off-road | entropy |")
    print("|---|---|---|---|---|")
    for t in table:
        print(
            f"| {t['step']:,} | {t['goal_rate']:.3f} | "
            f"{t['collision_rate']:.3f} | {t['off_road']:.3f} | "
            f"{t['entropy']:.2f} |"
        )
    last = table[-1] if table else {}
    peak = max((t["goal_rate"] for t in table), default=None)
    print(
        json.dumps(
            {
                "final_step": rows[-1]["global_step"] if rows else 0,
                "final_goal_rate": last.get("goal_rate"),
                "peak_goal_rate": peak,
                "final_entropy": last.get("entropy"),
                "mean_sps": window_mean(rows, "controlled_agent_sps"),
            }
        )
    )


if __name__ == "__main__":
    main()
