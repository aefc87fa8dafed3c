"""Banderwagon point/scalar codecs — batched.

Re-design of the reference's codecs_banderwagon.nim:40-200:
* serialize(P) = bigEndian(sign(y) * x): if y is not lexicographically
  largest (y >= (p-1)/2), flip x; neutral (0,1) encodes as 32 zero bytes.
* deserialize: x -> y via the curve equation y^2 = (1-a*x^2)/(1-d*x^2),
  pick the lexicographically largest y, then Banderwagon subgroup check:
  1 - a*x^2 must be a square (banderwagon_subgroups.nim:22-41).
* scalars: 32-byte big/little-endian, canonical < r.

The heavy math (batched sqrt via constant-time Tonelli-Shanks — the base
field is the BLS12-381 scalar field with 2-adicity 32) runs on device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..named.precompute import get_edwards
from ..ops import limbs as lb
from ..ops.sqrt import SqrtCtx


class BanderwagonCodec:
    def __init__(self):
        self.ctx = get_edwards("Banderwagon")
        self.fp = self.ctx.fp
        self.fr = self.ctx.fr
        self.p = self.ctx.p
        self.sqrt = SqrtCtx(self.fp, self.p)
        _ = self.ctx.group  # materialize device constants pre-trace
        # lexicographic threshold: y >= (p-1)/2 is "largest"
        # (getPrimeMinus1div2, codecs_banderwagon.nim:116)
        self.half_p = lb.int_to_limbs((self.p - 1) // 2, self.fp.L)
        self._from_x = jax.jit(self._from_x)

    # -- scalars --------------------------------------------------------------

    def scalars_from_bytes(self, data: bytes, order: str = "big"):
        """(N*32,) bytes -> ((N, L) canonical limbs, valid < r mask)."""
        n = len(data) // 32
        if order == "little":
            b = np.frombuffer(data, np.uint8).reshape(n, 32)[:, ::-1]
            data = b.tobytes()
        limbs = lb.bytes_be_to_limbs(data, 32, self.fr.L)
        vals = np.frombuffer(data, np.uint8).reshape(n, 32)
        r_be = np.frombuffer(self.ctx.r.to_bytes(32, "big"), np.uint8)
        lt = np.zeros(n, np.bool_)
        decided = np.zeros(n, np.bool_)
        for i in range(32):
            lt |= (~decided) & (vals[:, i] < r_be[i])
            decided |= vals[:, i] != r_be[i]
        return limbs, lt

    def scalars_to_bytes(self, limbs, order: str = "big") -> bytes:
        data = lb.limbs_to_bytes_be(np.asarray(limbs), 32)
        if order == "little":
            n = len(data) // 32
            data = np.frombuffer(data, np.uint8).reshape(n, 32)[:, ::-1].tobytes()
        return data

    # -- points ---------------------------------------------------------------

    def _y_is_big(self, y_canon):
        return lb.geq(y_canon, jnp.asarray(self.half_p))

    def _from_x(self, x_canon):
        """(N, L) canonical x -> (Montgomery affine (x, y) with y largest,
        on_curve mask, in_subgroup mask). Device, batched."""
        fp = self.fp
        G = self.ctx.group
        xm = fp.to_mont(x_canon)
        xx = fp.square(xm)
        one = fp.broadcast_one(xm.shape[:-1])
        # num = 1 - a x^2 (a = -5), den = 1 - d x^2
        num = fp.add(one, fp.mul_small(xx, 5))
        den = fp.sub(one, G._mul_d(xx))
        y2 = fp.mul(num, fp.batch_inv(den))
        y, on_curve = self.sqrt.sqrt(y2)
        y_canon = fp.from_mont(y)
        flip = ~self._y_is_big(y_canon)
        y = fp.cselect(flip, fp.neg(y), y)
        # subgroup: 1 - a x^2 = num must be a square
        _, in_sub = self.sqrt.sqrt(num)
        return xm, y, on_curve, in_sub

    def deserialize(self, data, subgroup_check: bool = True):
        """data: bytes (N*32) or (N,32) uint8. Returns (Montgomery affine
        (x, y), neutral_mask, valid_mask). All-zero input -> neutral."""
        if isinstance(data, (bytes, bytearray)):
            data = np.frombuffer(bytes(data), np.uint8).reshape(-1, 32)
        n = data.shape[0]
        is_zero = (data == 0).all(axis=1)
        limbs = lb.bytes_be_to_limbs(data.tobytes(), 32, self.fp.L)
        p_be = np.frombuffer(self.p.to_bytes(32, "big"), np.uint8)
        lt = np.zeros(n, np.bool_)
        decided = np.zeros(n, np.bool_)
        for i in range(32):
            lt |= (~decided) & (data[:, i] < p_be[i])
            decided |= data[:, i] != p_be[i]
        xm, y, on_curve, in_sub = self._from_x(jnp.asarray(limbs))
        valid = lt & np.asarray(on_curve)
        if subgroup_check:
            valid = valid & np.asarray(in_sub)
        valid = np.where(is_zero, True, valid)
        # neutral lanes: (0, 1)
        fp = self.fp
        neu = jnp.asarray(is_zero)
        xm = fp.cselect(neu, fp.broadcast_zero((n,)), xm)
        y = fp.cselect(neu, fp.broadcast_one((n,)), y)
        return (xm, y), is_zero, valid

    def serialize(self, xy, neutral_mask=None) -> bytes:
        """Montgomery affine (x, y) (+ neutral mask) -> (N*32) bytes."""
        fp = self.fp
        x, y = xy
        xc = fp.from_mont(x)
        yc = fp.from_mont(y)
        big = self._y_is_big(yc)
        x_out = fp.cselect(big, xc, fp.from_mont(fp.neg(x)))
        x_host = np.asarray(jax.device_get(x_out))
        n = x_host.shape[0]
        out = np.frombuffer(lb.limbs_to_bytes_be(x_host, 32),
                            np.uint8).reshape(n, 32).copy()
        neu = (np.asarray(neutral_mask) if neutral_mask is not None
               else np.zeros(n, bool))
        out[neu] = 0
        return out.tobytes()

    def map_to_scalar_field(self, xy):
        """Banderwagon mapToScalarField (ethereum_verkle_ipa.nim:232-257):
        x/y in Fp -> big-endian bytes -> reduce into Fr. Batched, one
        inversion."""
        fp = self.fp
        x, y = xy
        t = fp.mul(x, fp.batch_inv(y))
        t_canon = np.asarray(jax.device_get(fp.from_mont(t)))
        vals = [lb.limbs_to_int(v) % self.ctx.r for v in t_canon]
        return lb.ints_to_limbs(vals, self.fr.L)


@functools.lru_cache(maxsize=None)
def get_banderwagon_codec() -> BanderwagonCodec:
    return BanderwagonCodec()
