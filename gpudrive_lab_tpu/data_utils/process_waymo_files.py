"""TFRecord -> simulator JSON pipeline.

Mirror of the reference's CLI (reference:
data_utils/process_waymo_files.py:538-701): iterates WOMD TFRecord shards,
parses Scenario protos, converts via
gpudrive_lab_tpu.data_utils.waymo_converter, writes JSONs with
multiprocessing.  Requires ``tensorflow`` and ``waymo-open-dataset`` (for
scenario_pb2); raises a clear error otherwise — the converter core itself is
dependency-free and tested against proto stubs.

Run: python -m gpudrive_lab_tpu.data_utils.process_waymo_files \
       --input-dir <tfrecords> --output-dir <jsons>
"""

from __future__ import annotations

import argparse
import json
import os
from multiprocessing import cpu_count, get_context

# fork() after JAX initializes its thread pools can deadlock; spawn is safe
Pool = get_context("spawn").Pool

from gpudrive_lab_tpu.data_utils.waymo_converter import scenario_to_dict


def _require_deps():
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("tensorflow is required to read TFRecords") from e
    try:
        from waymo_open_dataset.protos import scenario_pb2  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "waymo-open-dataset is required for Scenario proto parsing "
            "(pip install waymo-open-dataset-tf-2-12-0). The converter core "
            "(waymo_converter.scenario_to_dict) has no such dependency."
        ) from e
    return scenario_pb2


def as_proto_iterator(tf_dataset, scenario_pb2):
    """reference: process_waymo_files.py:538-546."""
    for record in tf_dataset:
        proto = scenario_pb2.Scenario()
        proto.ParseFromString(bytes(record.numpy()))
        yield proto


def process_tfrecord(args_tuple):
    tfrecord_path, output_dir = args_tuple
    import tensorflow as tf

    scenario_pb2 = _require_deps()
    dataset = tf.data.TFRecordDataset(tfrecord_path, compression_type="")
    # Output basenames must start with 'tfrecord' (the dataloader filter,
    # as in the reference) AND stay unique per input shard.  Standard WOMD
    # shards ('training.tfrecord-00000-of-01000') keep their shard suffix;
    # anything else gets a sanitized unique name with the prefix prepended.
    raw = os.path.basename(tfrecord_path)
    suffix = raw.split(".")[-1]
    if suffix.startswith("tfrecord") and suffix != "tfrecord":
        base = suffix
    else:
        base = "tfrecord-" + raw.replace(".tfrecord", "").replace(".", "_")
    n_written = n_filtered = 0
    for i, proto in enumerate(as_proto_iterator(dataset, scenario_pb2)):
        name = f"{base}_{i}.json"
        out = scenario_to_dict(proto, name)
        if out is None:
            n_filtered += 1
            continue
        with open(os.path.join(output_dir, name), "w") as f:
            json.dump(out, f)
        n_written += 1
    return tfrecord_path, n_written, n_filtered


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--num-workers", type=int, default=None)
    args = p.parse_args()
    _require_deps()

    os.makedirs(args.output_dir, exist_ok=True)
    shards = sorted(
        os.path.join(args.input_dir, f)
        for f in os.listdir(args.input_dir)
        if "tfrecord" in f
    )
    tasks = [(s, args.output_dir) for s in shards]
    with Pool(args.num_workers or cpu_count()) as pool:
        for path, written, filtered in pool.imap_unordered(
            process_tfrecord, tasks
        ):
            print(f"{path}: wrote {written}, filtered {filtered}", flush=True)


if __name__ == "__main__":
    main()
