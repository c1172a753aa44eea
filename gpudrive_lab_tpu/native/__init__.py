"""Native (C++) scene-compiler bindings.

Builds csrc/scene_compiler.cpp into a shared library on first use (cached by
source hash under ~/.cache/gpudrive_lab_tpu) and exposes it through ctypes.
The Python implementation in gpudrive_lab_tpu.scene stays as the reference
path; parity is enforced by tests/test_native_compiler.py.  Disable with
GPUDRIVE_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "scene_compiler.cpp"
_LIB = None
_TRIED = False


class _Options(ctypes.Structure):
    _fields_ = [
        ("polyline_threshold", ctypes.c_float),
        ("ignore_non_vehicles", ctypes.c_int32),
        ("init_only_valid", ctypes.c_int32),
        ("read_tracks", ctypes.c_int32),
        ("is_static_controlled", ctypes.c_int32),
        ("max_controlled", ctypes.c_int32),
        ("r_cap", ctypes.c_int32),
    ]


_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)


class _SceneOut(ctypes.Structure):
    _fields_ = [
        ("valid", _U8P), ("etype", _I32P), ("size", _F32P), ("goal", _F32P),
        ("aid", _I32P), ("controlled", _U8P), ("is_static", _U8P),
        ("mark_expert", _U8P), ("metadata", _I32P),
        ("traj_pos", _F32P), ("traj_vel", _F32P), ("traj_yaw", _F32P),
        ("traj_valid", _F32P),
        ("road_pos", _F32P), ("road_yaw", _F32P), ("road_scale", _F32P),
        ("road_type", _I32P), ("road_id", _I32P), ("road_map_type", _I32P),
        ("num_agents", _I32P), ("num_roads", _I32P), ("mean", _F32P),
        ("name_codes", _I32P), ("scenario_codes", _I32P),
    ]


def _build() -> Optional[Path]:
    if not _SRC.exists():
        return None
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = Path(
        os.environ.get(
            "GPUDRIVE_TPU_NATIVE_CACHE",
            os.path.expanduser("~/.cache/gpudrive_lab_tpu"),
        )
    )
    cache.mkdir(parents=True, exist_ok=True)
    out = cache / f"libscene_compiler_{tag}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, OSError, subprocess.TimeoutExpired):
        return None
    return out


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GPUDRIVE_TPU_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.compile_scene_json.restype = ctypes.c_int
        lib.compile_scene_json.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_Options),
            _I32P, ctypes.c_int32, ctypes.POINTER(_SceneOut),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def compile_scene_native(
    json_bytes: bytes,
    polyline_threshold: float,
    ignore_non_vehicles: bool,
    init_only_valid: bool,
    read_tracks: bool,
    is_static_controlled: bool,
    max_controlled: int,
    r_cap: int,
    deleted: tuple = (),
) -> Optional[dict]:
    """Run the C++ compiler; returns the agent/road arrays dict or None when
    the native path is unavailable or fails."""
    lib = _load()
    if lib is None:
        return None
    A, T = 128, 91

    def f32(*shape):
        return np.zeros(shape, np.float32)

    def i32(*shape):
        return np.zeros(shape, np.int32)

    def u8(*shape):
        return np.zeros(shape, np.uint8)

    arrays = dict(
        valid=u8(A), etype=i32(A), size=f32(A, 3), goal=f32(A, 2),
        aid=i32(A), controlled=u8(A), is_static=u8(A), mark_expert=u8(A),
        metadata=np.full((A, 4), -1, np.int32),
        traj_pos=f32(A, T, 2), traj_vel=f32(A, T, 2), traj_yaw=f32(A, T),
        traj_valid=f32(A, T),
        road_pos=f32(r_cap, 3), road_yaw=f32(r_cap),
        road_scale=f32(r_cap, 3), road_type=i32(r_cap), road_id=i32(r_cap),
        road_map_type=i32(r_cap),
        num_agents=i32(1), num_roads=i32(1), mean=f32(2),
        name_codes=i32(32), scenario_codes=i32(32),
    )
    arrays["aid"][:] = -1
    arrays["road_id"][:] = -1
    arrays["road_map_type"][:] = -1

    def ptr(a, ctype):
        return a.ctypes.data_as(ctype)

    out = _SceneOut(
        valid=ptr(arrays["valid"], _U8P),
        etype=ptr(arrays["etype"], _I32P),
        size=ptr(arrays["size"], _F32P),
        goal=ptr(arrays["goal"], _F32P),
        aid=ptr(arrays["aid"], _I32P),
        controlled=ptr(arrays["controlled"], _U8P),
        is_static=ptr(arrays["is_static"], _U8P),
        mark_expert=ptr(arrays["mark_expert"], _U8P),
        metadata=ptr(arrays["metadata"], _I32P),
        traj_pos=ptr(arrays["traj_pos"], _F32P),
        traj_vel=ptr(arrays["traj_vel"], _F32P),
        traj_yaw=ptr(arrays["traj_yaw"], _F32P),
        traj_valid=ptr(arrays["traj_valid"], _F32P),
        road_pos=ptr(arrays["road_pos"], _F32P),
        road_yaw=ptr(arrays["road_yaw"], _F32P),
        road_scale=ptr(arrays["road_scale"], _F32P),
        road_type=ptr(arrays["road_type"], _I32P),
        road_id=ptr(arrays["road_id"], _I32P),
        road_map_type=ptr(arrays["road_map_type"], _I32P),
        num_agents=ptr(arrays["num_agents"], _I32P),
        num_roads=ptr(arrays["num_roads"], _I32P),
        mean=ptr(arrays["mean"], _F32P),
        name_codes=ptr(arrays["name_codes"], _I32P),
        scenario_codes=ptr(arrays["scenario_codes"], _I32P),
    )
    opt = _Options(
        polyline_threshold=polyline_threshold,
        ignore_non_vehicles=int(ignore_non_vehicles),
        init_only_valid=int(init_only_valid),
        read_tracks=int(read_tracks),
        is_static_controlled=int(is_static_controlled),
        max_controlled=int(min(max_controlled, 2**31 - 1)),
        r_cap=int(r_cap),
    )
    deleted_arr = np.asarray(sorted(deleted), np.int32)
    rc = lib.compile_scene_json(
        json_bytes, len(json_bytes), ctypes.byref(opt),
        ptr(deleted_arr, _I32P) if len(deleted_arr) else None,
        len(deleted_arr), ctypes.byref(out),
    )
    if rc != 0:
        return None
    return arrays
