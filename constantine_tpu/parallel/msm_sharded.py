"""Input-split MSM over a device mesh.

TPU-native re-expression of the reference's parallel MSM strategies
(SURVEY.md §2.2 P3-P5; ec_multi_scalar_mul_parallel.nim:236-386
msmAffine_vartime_parallel_split): points and scalars are sharded over the
mesh's data axis, each shard runs the dense single-chip Pippenger
(ops/msm.py), and the per-shard partial sums are combined with an
all_gather + log-depth EC reduction (EC addition is not linear, so psum
cannot combine points — the gather moves only W·3 field elements per shard,
which is negligible next to the bucket work and rides ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.msm import msm
from .mesh import DATA_AXIS


def msm_sharded(group, mesh, points_aff, scalars, c: int = None,
                scalar_bits: int = 255):
    """MSM with points sharded over mesh's data axis.

    points_aff: (x, y) arrays (N, ...) — N divisible by mesh size;
    scalars: (N, Ls) canonical limbs. Returns a replicated Jacobian point.
    """
    ndev = mesh.shape[DATA_AXIS]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
        check_rep=False)
    def run(px, py, s):
        part = msm(group, (px, py), s, c=c, scalar_bits=scalar_bits)
        # gather the single partial point from every shard, reduce locally
        gx = jax.lax.all_gather(part[0], DATA_AXIS)   # (ndev, ..., L)
        gy = jax.lax.all_gather(part[1], DATA_AXIS)
        gz = jax.lax.all_gather(part[2], DATA_AXIS)
        pts = (gx, gy, gz)
        n = ndev
        while n > 1:
            h = n // 2
            a = tuple(t[:h] for t in pts)
            b = tuple(t[h:2 * h] for t in pts)
            red = group.add(a, b)
            if n % 2:
                red = tuple(jnp.concatenate([r, t[2 * h:n]], axis=0)
                            for r, t in zip(red, pts))
            pts = red
            n = h + (n % 2)
        return tuple(t[0] for t in pts)

    return run(points_aff[0], points_aff[1], scalars)
