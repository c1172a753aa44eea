"""Vendored wire-compatible subset of the WOMD Scenario proto schema.

``scenario_lite_pb2`` is generated from ``scenario_lite.proto`` (checked in;
regenerate with ``protoc --python_out=. scenario_lite.proto``).  Field
numbers match the public waymo-open-dataset schema, so these messages parse
real WOMD TFRecord payloads without the tensorflow / waymo-open-dataset
dependencies the reference pipeline requires
(reference: data_utils/process_waymo_files.py imports scenario_pb2).
"""
