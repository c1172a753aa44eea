"""Dtype-grouped pytree packing: collapse a pytree into one flat buffer per
dtype so a remote dispatch moves a handful of handles instead of hundreds.

Motivation (measured, docs/PERFORMANCE.md): on the axon remote TPU runtime a
jit call costs ~0.5-1 s per ~100 pytree argument/result handles regardless
of compute; one PPO train iteration moves ~227 handles.  Packing the
(variables, opt_state, carry) state and the (scene, fresh) constants into
per-dtype vectors cuts that to ~12 handles per dispatch.

Grouping BY DTYPE (rather than one buffer) is load-bearing: a single buffer
would need a common dtype, and casting uint32 PRNG keys or int32 ids through
float32 silently corrupts values above 2^24.  Inside the jitted program the
concat/slice/reshape ops fuse away; outside it each group is one contiguous
device buffer, which also makes donation (in-place reuse) trivial.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def make_packer(example):
    """Returns (pack, unpack) for pytrees shaped like ``example``.

    ``pack(tree) -> {dtype_name: 1-D array}``;
    ``unpack(packed) -> tree`` restores the original structure, shapes, and
    dtypes exactly.  Both are jit-traceable; the layout metadata (treedef,
    shapes, dtypes, offsets) is captured statically from ``example``.
    """
    leaves, treedef = jax.tree.flatten(example)
    shapes = [np.shape(l) for l in leaves]
    dtypes = [np.dtype(jnp.asarray(l).dtype) for l in leaves]
    sizes = [int(math.prod(s)) for s in shapes]

    groups: dict[str, list[int]] = {}
    for i, dt in enumerate(dtypes):
        groups.setdefault(dt.name, []).append(i)
    group_keys = sorted(groups)

    def pack(tree):
        ls = jax.tree.leaves(tree)
        assert len(ls) == len(leaves), (
            f"pytree has {len(ls)} leaves, packer built for {len(leaves)}"
        )
        return {
            k: jnp.concatenate([jnp.ravel(ls[i]) for i in groups[k]])
            for k in group_keys
        }

    def unpack(packed):
        ls = [None] * len(leaves)
        for k in group_keys:
            vec = packed[k]
            off = 0
            for i in groups[k]:
                ls[i] = vec[off:off + sizes[i]].reshape(shapes[i])
                off += sizes[i]
        return jax.tree.unflatten(treedef, ls)

    return pack, unpack
