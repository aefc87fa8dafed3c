"""Ethereum Verkle IPA: Pedersen commitments, inner-product arguments,
multiproofs and transcripts over Banderwagon.

Re-design of the reference's Verkle stack:
* transcripts: commitments/eth_verkle_transcripts.nim (SHA-256 duplex
  sponge; scalars absorbed little-endian, points via Banderwagon codec;
  squeeze = label || digest -> LE reduce mod r -> reset + reabsorb);
* Pedersen commit: commitments/pedersen_commitments.nim (MSM over the CRS);
* IPA prove/verify: commitments/eth_verkle_ipa.nim:124-438 (log2(N)-round
  recursive halving; verification as one flat MSM);
* multiproof: eth_verkle_ipa.nim:565-967 (group queries by distinct
  opening challenge weighted by r^z, combine in-domain quotient polys,
  commit, evaluate at random t, reduce to a single IPA);
* linear-domain barycentric math: math/polynomials/polynomials.nim:551-660
  and protocol_quotient_check.nim:167-224;
* CRS: ethereum_verkle_ipa.nim:23-66 (generate_random_points, seed
  "eth_verkle_oct_2021").

TPU split: every EC operation (Pedersen MSMs, CRS folding G' = G_L +
[x^-1]G_R, the verifier's flat MSM) runs batched on device; the 256-element
scalar vector bookkeeping runs host-side with exact python ints (it is
sub-microsecond work, far below dispatch latency).
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..named.precompute import get_edwards
from ..ops import limbs as lb
from ..ops.msm import msm
from ..utils.codecs_banderwagon import get_banderwagon_codec

DOMAIN = 256          # EthVerkleDomain (ethereum_verkle_ipa.nim:77)
LOG_DOMAIN = 8
SEED = b"eth_verkle_oct_2021"


class Transcript:
    """SHA-256 duplex sponge (eth_verkle_transcripts.nim:57-109)."""

    def __init__(self, label: bytes, r_mod: int):
        self.h = hashlib.sha256()
        self.h.update(label)
        self.r = r_mod

    def domain_separator(self, label: bytes):
        self.h.update(label)

    def absorb(self, label: bytes, msg: bytes):
        self.h.update(label)
        self.h.update(msg)

    def absorb_scalar(self, label: bytes, v: int):
        self.absorb(label, (v % self.r).to_bytes(32, "little"))

    def absorb_point(self, label: bytes, point_bytes: bytes):
        self.absorb(label, point_bytes)

    def squeeze(self, label: bytes) -> int:
        self.h.update(label)
        digest = self.h.digest()
        c = int.from_bytes(digest, "little") % self.r
        self.h = hashlib.sha256()
        self.absorb_scalar(label, c)
        return c


class VerkleIPA:
    def __init__(self, n: int = DOMAIN):
        assert n & (n - 1) == 0
        self.n = n
        self.log_n = n.bit_length() - 1
        self.ctx = get_edwards("Banderwagon")
        self.G = self.ctx.group
        self.fp = self.ctx.fp
        self.fr = self.ctx.fr
        self.r = self.ctx.r
        self.codec = get_banderwagon_codec()
        # one jitted Pippenger per input shape (far fewer XLA compilations
        # than dispatching the un-jitted msm's primitives one by one)
        import functools as _ft
        self._msm_jit = jax.jit(_ft.partial(msm, self.G),
                                static_argnames=("c", "scalar_bits"))
        self.crs = self._generate_crs(n)        # device affine (x, y)
        # linear-domain precomputes (setupLinearEvaluationDomain,
        # polynomials.nim:630-648): A'(i) = prod_{j!=i}(i - j) and inverses
        r = self.r
        self.aprime = [1] * n
        for i in range(n):
            v = 1
            for j in range(n):
                if j != i:
                    v = v * (i - j) % r
            self.aprime[i] = v
        self.aprime_inv = [pow(v, -1, r) for v in self.aprime]
        self.dom_inv = [0] + [pow(i, -1, r) for i in range(1, n)]

    # ------------------------------------------------------------------
    # CRS
    # ------------------------------------------------------------------

    def _generate_crs(self, n: int):
        """generate_random_points (ethereum_verkle_ipa.nim:25-66): hash a
        counter with the fixed seed, try-and-increment decode as Banderwagon
        points (with subgroup check)."""
        path = f"/tmp/ctt_verkle_crs_{n}.npz"
        if os.path.exists(path):
            z = np.load(path)
            return (jnp.asarray(z["x"]), jnp.asarray(z["y"]))
        xs_bytes = []
        inc = 0
        p = self.ctx.p
        # batch candidate decoding on device, 64 at a time. NB: the hash is
        # REDUCED mod p (the reference's x.fromBig), not range-rejected.
        while len(xs_bytes) < n:
            cands = b"".join(
                (int.from_bytes(
                    hashlib.sha256(SEED + (inc + k).to_bytes(8, "big"))
                    .digest(), "big") % p).to_bytes(32, "big")
                for k in range(64))
            inc += 64
            (x, y), neu, ok = self.codec.deserialize(cands)
            okh = np.asarray(ok) & ~np.asarray(neu)
            data = np.frombuffer(cands, np.uint8).reshape(-1, 32)
            for k in np.nonzero(okh)[0]:
                if len(xs_bytes) < n:
                    xs_bytes.append(data[k].tobytes())
        (x, y), neu, ok = self.codec.deserialize(b"".join(xs_bytes))
        assert np.asarray(ok).all()
        np.savez(path, x=np.asarray(x), y=np.asarray(y))
        return (jnp.asarray(np.asarray(x)), jnp.asarray(np.asarray(y)))

    # ------------------------------------------------------------------
    # scalar helpers (host ints)
    # ------------------------------------------------------------------

    def _limbs(self, ints):
        return jnp.asarray(lb.ints_to_limbs([v % self.r for v in ints],
                                            self.fr.L))

    def _msm(self, points_aff, scalars_ints, c: int = 8):
        """Device MSM -> projective point tuple."""
        return self._msm_jit(points_aff, self._limbs(scalars_ints), c=c,
                             scalar_bits=253)

    def _point_bytes(self, P) -> bytes:
        """Projective point (batch ()) -> 32-byte Banderwagon serialization."""
        (x, y), neu = self.G.to_affine(tuple(t[None] for t in P))
        return self.codec.serialize((x, y), np.asarray(neu))

    def lagrange_basis_at(self, z: int):
        """b_i(z) over the linear domain (computeLagrangeBasisPolysAt,
        polynomials.nim:551-614). z may be in or out of the domain."""
        r, n = self.r, self.n
        if 0 <= z < n:
            return [1 if i == z else 0 for i in range(n)]
        az = 1
        for i in range(n):
            az = az * (z - i) % r
        return [az * self.aprime_inv[i] % r * pow(z - i, -1, r) % r
                for i in range(n)]

    def eval_poly_at(self, evals, z: int) -> int:
        """Barycentric evaluation (evalPolyAt, polynomials.nim:618-622)."""
        b = self.lagrange_basis_at(z)
        return sum(e * bi for e, bi in zip(evals, b)) % self.r

    def quotient_poly_in_domain(self, evals, z_idx: int):
        """q(x) = (p(x) - p(z))/(x - z) for z = x_{z_idx} in the linear
        domain (protocol_quotient_check.nim:167-224)."""
        r, n = self.r, self.n
        q = [0] * n
        pz = evals[z_idx]
        acc = 0
        for i in range(n):
            if i == z_idx:
                continue
            inv = (self.dom_inv[i - z_idx] if i > z_idx
                   else r - self.dom_inv[z_idx - i])
            q[i] = (evals[i] - pz) * inv % r
            # qz -= A'(z)/A'(x_i) * q_i
            acc = (acc + self.aprime[z_idx] * self.aprime_inv[i]
                   % r * q[i]) % r
        q[z_idx] = (-acc) % r
        return q

    # ------------------------------------------------------------------
    # Pedersen commitment (pedersen_commitments.nim; ipa_commit)
    # ------------------------------------------------------------------

    def commit(self, evals):
        """C = <evals, CRS> -> projective device point."""
        return self._msm(self.crs, evals)

    def commit_bytes(self, evals) -> bytes:
        return self._point_bytes(self.commit(evals))

    # ------------------------------------------------------------------
    # IPA prove / verify (eth_verkle_ipa.nim:143-438)
    # ------------------------------------------------------------------

    def prove(self, transcript: Transcript, evals, commitment_bytes: bytes,
              z: int):
        """-> (proof dict {L: [bytes]*logN, R: [bytes]*logN, a0: int},
        eval_at_z). evals: N python ints."""
        r, n = self.r, self.n
        a = [v % r for v in evals]
        b = self.lagrange_basis_at(z)
        y = sum(ai * bi for ai, bi in zip(a, b)) % r

        transcript.domain_separator(b"ipa")
        transcript.absorb_point(b"C", commitment_bytes)
        transcript.absorb_scalar(b"input point", z)
        transcript.absorb_scalar(b"output point", y)
        w = transcript.squeeze(b"w")

        # NB the a/b scalar folds below stay on HOST ints deliberately:
        # each round is serialized by the Fiat-Shamir transcript (host
        # hash), and the fold is ~3*h <= 384 bigint mulmods (~0.5 ms
        # total) while one extra device round trip costs ~25 ms on the
        # tunnel. The heavy work per round (the two MSMs and the CRS
        # fold) already runs on device. Batching across OPENINGS (the
        # real parallel axis) is the multiproof below.
        # G as mutable device affine arrays
        gx, gy = self.crs
        Ls, Rs = [], []
        gen = self.ctx.gen
        for _ in range(self.log_n):
            h = len(a) // 2
            aL, aR = a[:h], a[h:]
            bL, bR = b[:h], b[h:]
            aRbL = sum(x * yv for x, yv in zip(aR, bL)) % r
            aLbR = sum(x * yv for x, yv in zip(aL, bR)) % r
            # L = <aR, G_L> + [aRbL*w]gen ; R = <aL, G_R> + [aLbR*w]gen
            # (Q = [w]gen folded into the MSM scalar)
            Lx = jnp.concatenate([gx[:h], gen[0]])
            Ly = jnp.concatenate([gy[:h], gen[1]])
            Rx = jnp.concatenate([gx[h:2 * h], gen[0]])
            Ry = jnp.concatenate([gy[h:2 * h], gen[1]])
            Lpt = self._msm((Lx, Ly), aR + [aRbL * w % r])
            Rpt = self._msm((Rx, Ry), aL + [aLbR * w % r])
            Lb = self._point_bytes(Lpt)
            Rb = self._point_bytes(Rpt)
            Ls.append(Lb)
            Rs.append(Rb)
            transcript.absorb_point(b"L", Lb)
            transcript.absorb_point(b"R", Rb)
            x = transcript.squeeze(b"x")
            xinv = pow(x, -1, r)
            a = [(al + x * ar) % r for al, ar in zip(aL, aR)]
            if h == 1:
                break
            b = [(bl + xinv * br) % r for bl, br in zip(bL, bR)]
            # G' = G_L + [xinv] G_R  (batched scalar-mul + add, one
            # batch-inverted affine conversion)
            GR = self.G.from_affine((gx[h:2 * h], gy[h:2 * h]))
            xinv_l = jnp.broadcast_to(self._limbs([xinv])[0],
                                      (h, self.fr.L))
            S = self.G.scalar_mul(xinv_l, GR, scalar_bits=253)
            S = self.G.madd(S, (gx[:h], gy[:h]))
            (gx, gy), _ = self.G.to_affine(S)
        return {"L": Ls, "R": Rs, "a0": a[0]}, y

    def verify(self, transcript: Transcript, commitment_bytes: bytes,
               z: int, y: int, proof) -> bool:
        """Flat-MSM verification (ipa_verify, eth_verkle_ipa.nim:330-438):
        sum([x_i]L_i) + sum([x_i^-1]R_i) + [y*w]gen - [a0]<s,G> - [a0*b0*w]gen
        == -C."""
        r, n = self.r, self.n
        if len(proof["L"]) != self.log_n or len(proof["R"]) != self.log_n:
            return False
        (cx, cy), c_neu, c_ok = self.codec.deserialize(commitment_bytes)
        lr_pts = b"".join(proof["L"]) + b"".join(proof["R"])
        (px, py), p_neu, p_ok = self.codec.deserialize(lr_pts)
        if not (np.asarray(c_ok).all() and np.asarray(p_ok).all()):
            return False

        transcript.domain_separator(b"ipa")
        transcript.absorb_point(b"C", commitment_bytes)
        transcript.absorb_scalar(b"input point", z)
        transcript.absorb_scalar(b"output point", y)
        w = transcript.squeeze(b"w")
        xs = []
        for i in range(self.log_n):
            transcript.absorb_point(b"L", proof["L"][i])
            transcript.absorb_point(b"R", proof["R"][i])
            xs.append(transcript.squeeze(b"x"))
        xinvs = [pow(x, -1, r) for x in xs]

        # s-vector: s = prod over rounds (1 + xinv_j X^(2^j)) expansion
        # (computeChangeOfBasisFactors, eth_verkle_ipa.nim:276-327)
        a0 = proof["a0"] % r
        s = [0] * n
        s[0] = (-a0) % r              # multiplier = -a0
        for j in range(self.log_n - 1, -1, -1):
            Lw = 1 << (self.log_n - 1 - j)
            for i in range(Lw):
                s[Lw + i] = s[i] * xinvs[j] % r
        b = self.lagrange_basis_at(z)
        # -a0*b0*w = w * <s, b>  (s already carries -a0)
        a0b0w = w * sum(si * bi for si, bi in zip(s, b)) % r

        scalars = xs + xinvs + [y * w % r] + s + [a0b0w]
        gen = self.ctx.gen
        allx = jnp.concatenate([px, gen[0], self.crs[0], gen[0]])
        ally = jnp.concatenate([py, gen[1], self.crs[1], gen[1]])
        t = self._msm((allx, ally), scalars)
        # t must equal -C
        C = self.G.from_affine((cx, cy), inf_mask=jnp.asarray(c_neu))
        negC = self.G.neg(tuple(v[0] for v in C))
        return bool(np.asarray(self.G.eq_torsion(t, negC)))

    # ------------------------------------------------------------------
    # Multiproof (eth_verkle_ipa.nim:565-967)
    # ------------------------------------------------------------------

    def _multiproof_transcript_head(self, transcript, commitments_bytes,
                                    zs, ys):
        transcript.domain_separator(b"multiproof")
        for cb, z, y in zip(commitments_bytes, zs, ys):
            transcript.absorb_point(b"C", cb)
            transcript.absorb_scalar(b"z", z)
            transcript.absorb_scalar(b"y", y)

    def multi_prove(self, transcript: Transcript, polys, commitments_bytes,
                    zs):
        """polys: list of N-int lists; zs: in-domain challenges (ints in
        [0, N)). -> proof dict {D: bytes, ipa: ipa-proof dict}."""
        r = self.r
        ys = [poly[z] for poly, z in zip(polys, zs)]
        self._multiproof_transcript_head(transcript, commitments_bytes,
                                         zs, ys)
        rr = transcript.squeeze(b"r")

        # weight query k by r^k, then group by distinct challenge (verkle
        # multiproof spec / go-ipa semantics — gated by the cross-
        # implementation state vector in tests/test_verkle.py):
        #   f_z(X) = sum_{k: z_k = z} r^k f_k(X)
        #   g(X)   = sum_z quotient(f_z, z)
        groups = {}
        rk = 1
        for poly, z in zip(polys, zs):
            groups.setdefault(z, [0] * self.n)
            g = groups[z]
            for i in range(self.n):
                g[i] = (g[i] + rk * poly[i]) % r
            rk = rk * rr % r
        g_comb = [0] * self.n
        for z in sorted(groups):
            q = self.quotient_poly_in_domain(groups[z], z)
            for i in range(self.n):
                g_comb[i] = (g_comb[i] + q[i]) % r

        D = self.commit_bytes(g_comb)
        transcript.absorb_point(b"D", D)
        t = transcript.squeeze(b"t")

        # g1 = sum_z f_z / (t - z)   (f_z already carries the r^k weights)
        g1 = [0] * self.n
        for z in sorted(groups):
            wz = pow(t - z, -1, r)
            fz = groups[z]
            for i in range(self.n):
                g1[i] = (g1[i] + wz * fz[i]) % r
        E = self.commit(g1)
        Eb = self._point_bytes(E)
        transcript.absorb_point(b"E", Eb)

        # g2 = g1 - g ; commitment: E - D
        g2 = [(a - b) % r for a, b in zip(g1, g_comb)]
        (dx, dy), d_neu, _ = self.codec.deserialize(D)
        Dp = self.G.from_affine((dx, dy), inf_mask=jnp.asarray(d_neu))
        comm_g2 = self.G.add(E, self.G.neg(tuple(v[0] for v in Dp)))
        comm_g2_bytes = self._point_bytes(comm_g2)
        ipa_proof, _eval = self.prove(transcript, g2, comm_g2_bytes, t)
        return {"D": D, "ipa": ipa_proof}

    def multi_verify(self, transcript: Transcript, commitments_bytes, zs,
                     ys, proof) -> bool:
        r = self.r
        self._multiproof_transcript_head(transcript, commitments_bytes,
                                         zs, ys)
        rr = transcript.squeeze(b"r")
        transcript.absorb_point(b"D", proof["D"])
        t = transcript.squeeze(b"t")

        # group commitments/evals by distinct challenge
        (cx, cy), c_neu, c_ok = self.codec.deserialize(
            b"".join(commitments_bytes))
        if not np.asarray(c_ok).all():
            return False
        # per-query weight r^k / (t - z_k); E = sum_k [w_k] C_k and
        # g2(t) = sum_k w_k y_k (the split g = g1 - g2, verifier side)
        g2t = 0
        weights, comm_idx = [], []
        rk = 1
        for k, z in enumerate(zs):
            wk = rk * pow(t - z, -1, r) % r
            g2t = (g2t + wk * ys[k]) % r
            weights.append(wk)
            comm_idx.append(k)
            rk = rk * rr % r
        idx = jnp.asarray(np.asarray(comm_idx, np.int32))
        E = self._msm_jit(
            (jnp.take(cx, idx, axis=0), jnp.take(cy, idx, axis=0)),
            self._limbs(weights), c=8, scalar_bits=253)
        Eb = self._point_bytes(E)
        transcript.absorb_point(b"E", Eb)

        (dx, dy), d_neu, d_ok = self.codec.deserialize(proof["D"])
        if not np.asarray(d_ok).all():
            return False
        Dp = self.G.from_affine((dx, dy), inf_mask=jnp.asarray(d_neu))
        comm_g2 = self.G.add(E, self.G.neg(tuple(v[0] for v in Dp)))
        comm_g2_bytes = self._point_bytes(comm_g2)
        return self.verify(transcript, comm_g2_bytes, t, g2t, proof["ipa"])

    # ------------------------------------------------------------------
    # proof serialization (ethereum_verkle_ipa.nim:141-216)
    # ------------------------------------------------------------------

    def serialize_proof(self, proof) -> bytes:
        """IpaProof -> 544 bytes: 8 L points || 8 R points || a0 LE."""
        return (b"".join(proof["L"]) + b"".join(proof["R"])
                + (proof["a0"] % self.r).to_bytes(32, "little"))

    def deserialize_proof(self, data: bytes):
        if len(data) != 544:
            return None
        Ls = [data[i * 32:(i + 1) * 32] for i in range(8)]
        Rs = [data[256 + i * 32:256 + (i + 1) * 32] for i in range(8)]
        a0 = int.from_bytes(data[512:], "little")
        if a0 >= self.r:
            return None
        return {"L": Ls, "R": Rs, "a0": a0}

    def serialize_multiproof(self, proof) -> bytes:
        """IpaMultiProof -> 576 bytes: D || ipa proof."""
        return proof["D"] + self.serialize_proof(proof["ipa"])

    def deserialize_multiproof(self, data: bytes):
        if len(data) != 576:
            return None
        ipa = self.deserialize_proof(data[32:])
        if ipa is None:
            return None
        return {"D": data[:32], "ipa": ipa}


@functools.lru_cache(maxsize=None)
def get_verkle_ipa(n: int = DOMAIN) -> VerkleIPA:
    return VerkleIPA(n)
