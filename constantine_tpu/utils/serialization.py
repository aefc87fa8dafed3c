"""Point/scalar codecs: ZCash-style BLS12-381 compressed serialization.

Re-design of the reference's codecs
(constantine/serialization/codecs_bls12_381.nim:59-276 — G1/G2 compressed
(de)serialization with flag bits, canonicality, on-curve and subgroup
checks) with the heavy math (sqrt, subgroup scalar-mul) batched on device.

Byte layout (48 bytes G1 / 96 bytes G2, big-endian):
  bit7 of byte0: compression flag (always 1 here)
  bit6: infinity flag
  bit5: sign (y lexicographically largest)
Status is reported as per-element boolean masks (the SPMD analogue of the
reference's CttCodecEccStatus enum).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import limbs as lb
from ..named.precompute import get_curve
from ..ops.sqrt import get_sqrt_fp, get_sqrt_fp2
from ..ops.towers import build_tower


from .audit import vartime as _vartime


class BLS12381Codec:
    def __init__(self):
        self.ctx = get_curve("BLS12_381")
        self.fp = self.ctx.fp
        self.fr = self.ctx.fr
        self.fp2, _, _ = build_tower("BLS12_381")
        p = self.ctx.p
        self.half_p = lb.int_to_limbs((p + 1) // 2, self.fp.L)  # y >= this => "big"
        self._sq = get_sqrt_fp("BLS12_381")
        self._sq2 = get_sqrt_fp2("BLS12_381")
        self.b_mont = self.fp.encode([4])[0]          # curve b
        self.b2_mont = self.fp2.encode([4, 4])        # twist b'
        self._g1_from_x = jax.jit(self._g1_from_x)
        self._g2_from_x = jax.jit(self._g2_from_x)

    # ---- scalars (32-byte big-endian, canonical < r) -----------------------

    def scalars_from_bytes(self, data: bytes):
        """(N*32,) bytes -> ((N, L) canonical limbs, valid_mask np.bool_)."""
        n = len(data) // 32
        limbs = lb.bytes_be_to_limbs(data, 32, self.fr.L)
        r_limbs = lb.int_to_limbs(self.ctx.r, self.fr.L)
        # canonical check on host (numpy, vectorized compare big-endian)
        be = np.frombuffer(data, dtype=np.uint8).reshape(n, 32)
        r_be = np.frombuffer(self.ctx.r.to_bytes(32, "big"), dtype=np.uint8)
        lt = np.zeros(n, dtype=np.bool_)
        decided = np.zeros(n, dtype=np.bool_)
        for i in range(32):
            lt |= (~decided) & (be[:, i] < r_be[i])
            decided |= be[:, i] != r_be[i]
        valid = lt  # strictly less than r
        return limbs, valid

    def scalars_to_bytes(self, limbs) -> bytes:
        return lb.limbs_to_bytes_be(np.asarray(limbs), 32)

    # ---- field elements <-> 48B ---------------------------------------------

    def _fp_from_be48(self, data: np.ndarray):
        """(N, 48) uint8 (flags already cleared) -> ((N, L) limbs, lt_p)."""
        n = data.shape[0]
        limbs = lb.bytes_be_to_limbs(data.tobytes(), 48, self.fp.L)
        p_be = np.frombuffer(self.ctx.p.to_bytes(48, "big"), dtype=np.uint8)
        lt = np.zeros(n, dtype=np.bool_)
        decided = np.zeros(n, dtype=np.bool_)
        for i in range(48):
            lt |= (~decided) & (data[:, i] < p_be[i])
            decided |= data[:, i] != p_be[i]
        return limbs, lt

    # ---- G1 -------------------------------------------------------------------

    def _y_is_big(self, y):
        """Lexicographic sign of a canonical-domain y (device)."""
        return lb.geq(y, jnp.asarray(self.half_p))

    def _g1_from_x(self, x_canon, sign_big):
        """x (canonical domain limbs) -> jacobian-affine y choice + is_square.
        Runs on device, batched."""
        fp = self.fp
        xm = fp.to_mont(x_canon)
        rhs = fp.add(fp.mul(fp.square(xm), xm), jnp.broadcast_to(
            jnp.asarray(self.b_mont), xm.shape))
        y, ok = self._sq.sqrt(rhs)
        y_canon = fp.from_mont(y)
        is_big = self._y_is_big(y_canon)
        flip = is_big != sign_big
        y = fp.cselect(flip, fp.neg(y), y)
        return xm, y, ok

    @_vartime(reason="validates PUBLIC point encodings; branches on encoding flags/lengths only")
    def g1_decompress(self, data, subgroup_check: bool = True):
        """data: bytes (N*48) or (N,48) uint8 array.
        Returns ((x, y) Montgomery affine, inf_mask, valid_mask).
        Raises ValueError on a wrong byte length — protocol callers check
        lengths first and map them to a False/status result (the codec
        analogue of cttCodecEcc_InvalidEncoding)."""
        if isinstance(data, (bytes, bytearray)):
            if len(data) == 0 or len(data) % 48:
                raise ValueError(f"G1 compressed encoding length {len(data)} "
                                 "is not a multiple of 48")
            data = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, 48)
        data = np.array(data, copy=True)
        flags = data[:, 0]
        comp = (flags & 0x80) != 0
        is_inf = (flags & 0x40) != 0
        sign = (flags & 0x20) != 0
        data[:, 0] &= 0x1F
        x_canon, lt_p = self._fp_from_be48(data)
        x_is_zero = (x_canon == 0).all(axis=1)

        xm, y, is_sq = self._g1_from_x(jnp.asarray(x_canon),
                                       jnp.asarray(sign))
        valid = comp & lt_p
        inf_ok = is_inf & x_is_zero & ~sign
        valid = np.where(is_inf, comp & inf_ok,
                         valid & np.asarray(is_sq))
        if subgroup_check:
            in_sub = np.asarray(self._g1_subgroup_check(xm, y))
            valid = np.where(is_inf, valid, valid & in_sub)
        return (xm, y), is_inf, valid

    def _g1_subgroup_check(self, x, y):
        """Endomorphism-accelerated membership test (Scott 2021):
        phi(P) == [-u^2]P — two 64-bit ladders instead of a 255-bit [r]P
        (named/zoo_subgroups.nim + bls12_381_subgroups.nim:170 analogue),
        batched over all decoded points. Generic-curve fallback inside."""
        from ..ops.subgroups import is_in_subgroup_g1
        ctx = self.ctx
        return is_in_subgroup_g1(ctx, ctx.g1.from_affine((x, y)))

    def g1_compress_canonical(self, x_canon, y_big, inf_mask=None) -> bytes:
        """Host-side byte assembly from precomputed canonical x limbs and
        the y-sign mask — lets protocol entry points export everything from
        the device in ONE fused jit dispatch (the remote-TPU tunnel charges
        ~25 ms per dispatch, so per-call op count dominates small-point
        serialization)."""
        xc = np.asarray(x_canon)
        big = np.asarray(y_big)
        n = xc.shape[0]
        out = np.frombuffer(lb.limbs_to_bytes_be(xc, 48), dtype=np.uint8)
        out = np.array(out.reshape(n, 48), copy=True)
        inf = (np.asarray(inf_mask) if inf_mask is not None
               else np.zeros(n, dtype=bool))
        out[inf] = 0
        out[:, 0] |= 0x80
        out[inf, 0] |= 0x40
        out[~inf & big, 0] |= 0x20
        return out.tobytes()

    def g1_compress(self, xy, inf_mask=None) -> bytes:
        """Montgomery affine (x, y) (+ inf mask) -> (N*48) bytes."""
        fp = self.fp
        x, y = xy
        xc = np.asarray(jax.device_get(fp.from_mont(x)))
        big = np.asarray(jax.device_get(self._y_is_big(fp.from_mont(y))))
        n = xc.shape[0]
        out = np.frombuffer(lb.limbs_to_bytes_be(xc, 48), dtype=np.uint8)
        out = np.array(out.reshape(n, 48), copy=True)
        inf = (np.asarray(inf_mask) if inf_mask is not None
               else np.zeros(n, dtype=bool))
        out[inf] = 0
        out[:, 0] |= 0x80
        out[inf, 0] |= 0x40
        out[~inf & big, 0] |= 0x20
        return out.tobytes()

    # ---- G2 -------------------------------------------------------------------

    def _g2_from_x(self, x_canon, sign_big):
        """x: (N, 2, L) canonical Fp2 coords. Returns Montgomery (x, y, ok)."""
        fp2, fp = self.fp2, self.fp
        xm = fp.to_mont(x_canon)  # componentwise Montgomery encode
        b2 = jnp.broadcast_to(jnp.asarray(self.b2_mont), xm.shape)
        rhs = fp2.add(fp2.mul(fp2.square(xm), xm), b2)
        y, ok = self._sq2.sqrt(rhs)
        yc = fp.from_mont(y)  # (N, 2, L) canonical
        c0_big = self._y_is_big(yc[..., 0, :])
        c1_big = self._y_is_big(yc[..., 1, :])
        c1_zero = lb.is_zero(yc[..., 1, :])
        is_big = jnp.where(c1_zero, c0_big, c1_big)
        flip = is_big != sign_big
        y = fp2.cselect(flip, fp2.neg(y), y)
        return xm, y, ok

    @_vartime(reason="validates PUBLIC point encodings; branches on encoding flags/lengths only")
    def g2_decompress(self, data, subgroup_check: bool = True):
        """data: bytes (N*96) or (N,96) uint8. x encoded as c1 || c0.
        Returns ((x, y) Fp2 Montgomery affine (N,2,L), inf_mask, valid).
        Raises ValueError on a wrong byte length (see g1_decompress)."""
        if isinstance(data, (bytes, bytearray)):
            if len(data) == 0 or len(data) % 96:
                raise ValueError(f"G2 compressed encoding length {len(data)} "
                                 "is not a multiple of 96")
            data = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, 96)
        data = np.array(data, copy=True)
        flags = data[:, 0]
        comp = (flags & 0x80) != 0
        is_inf = (flags & 0x40) != 0
        sign = (flags & 0x20) != 0
        data[:, 0] &= 0x1F
        c1, lt1 = self._fp_from_be48(data[:, :48])
        c0, lt0 = self._fp_from_be48(data[:, 48:])
        x_canon = np.stack([c0, c1], axis=1)  # (N, 2, L)
        x_is_zero = (x_canon == 0).all(axis=(1, 2))

        xm, y, is_sq = self._g2_from_x(jnp.asarray(x_canon), jnp.asarray(sign))
        valid = comp & lt0 & lt1
        inf_ok = is_inf & x_is_zero & ~sign
        valid = np.where(is_inf, comp & inf_ok, valid & np.asarray(is_sq))
        if subgroup_check:
            in_sub = np.asarray(self._g2_subgroup_check(xm, y))
            valid = np.where(is_inf, valid, valid & in_sub)
        return (xm, y), is_inf, valid

    def _g2_subgroup_check(self, x, y):
        """psi(Q) == [u]Q (Scott 2021) — one 64-bit ladder + the
        untwist-Frobenius-twist map, vs a 255-bit [r]Q ladder."""
        from ..ops.subgroups import is_in_subgroup_g2
        ctx = self.ctx
        return is_in_subgroup_g2(ctx, ctx.g2.from_affine((x, y)))

    def g2_compress(self, xy, inf_mask=None) -> bytes:
        fp2, fp = self.fp2, self.fp
        x, y = xy
        xc = np.asarray(jax.device_get(fp.from_mont(x)))   # (N,2,L) canonical
        yc = np.asarray(jax.device_get(fp.from_mont(y)))
        n = xc.shape[0]
        c0_big = np.asarray(self._y_is_big(jnp.asarray(yc[:, 0])))
        c1_big = np.asarray(self._y_is_big(jnp.asarray(yc[:, 1])))
        c1_zero = (yc[:, 1] == 0).all(axis=1)
        big = np.where(c1_zero, c0_big, c1_big)
        b1 = np.frombuffer(lb.limbs_to_bytes_be(xc[:, 1], 48), np.uint8).reshape(n, 48)
        b0 = np.frombuffer(lb.limbs_to_bytes_be(xc[:, 0], 48), np.uint8).reshape(n, 48)
        out = np.concatenate([np.array(b1, copy=True), b0], axis=1)
        inf = (np.asarray(inf_mask) if inf_mask is not None
               else np.zeros(n, dtype=bool))
        out[inf] = 0
        out[:, 0] |= 0x80
        out[inf, 0] |= 0x40
        out[~inf & big, 0] |= 0x20
        return out.tobytes()


@functools.lru_cache(maxsize=None)
def get_codec() -> BLS12381Codec:
    return BLS12381Codec()
