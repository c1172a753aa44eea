"""Tutorial 7: tag scenes by logged agent behavior (u-turns, reversing).

Mirror of the reference's behavior-diversity tutorial
(reference: examples/tutorials/07_agent_behavior_diversity.md +
data_utils/detect_behavior.py): scan a processed-scene directory, count
vehicles whose logged trajectories contain u-turns or sustained reversing,
and print which files to pick for a behavior-diverse training set.
"""

import argparse

from gpudrive_lab_tpu.data_utils.detect_behavior import process_directory


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--scenes-dir", default="/root/reference/data/processed/examples"
    )
    p.add_argument("--min-reverse-timesteps", type=int, default=10)
    args = p.parse_args()

    stats = process_directory(
        args.scenes_dir, min_reverse_timesteps=args.min_reverse_timesteps
    )
    print(f"vehicles:  {stats['total_agents']}")
    print(f"u-turns:   {stats['total_uturns']} ({stats['uturn_percentage']:.1f}%)")
    print(f"reversing: {stats['total_reversing']} ({stats['reverse_percentage']:.1f}%)")
    print("flagged scenes (use these to diversify a curriculum):")
    for f in stats["flagged_scenes"]:
        print("  ", f)


if __name__ == "__main__":
    main()
