"""Polynomial-forms tests (ops/poly.py) vs host big-int reference.

Mirrors the reference's polynomial semantics
(math/polynomials/polynomials.nim): barycentric eval in/off domain,
synthetic division, vanishing polys, Lagrange basis, inverseDifferenceArray.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.ntt import get_domain
from constantine_tpu.ops.poly import PolyOps

LOG_N = 4


@pytest.fixture(scope="module")
def po():
    return PolyOps(get_domain("BLS12_381", LOG_N))


def host_eval(coefs, z, r):
    acc = 0
    for c in reversed(coefs):
        acc = (acc * z + c) % r
    return acc


def enc(F, xs):
    return jnp.asarray(F.encode(xs))


def test_coef_eval_roundtrip(po):
    F = po.F
    r = F.p_int
    rng = random.Random(5)
    coefs = [rng.randrange(r) for _ in range(po.n)]
    cm = enc(F, coefs)
    ev = po.coef_to_eval(cm)
    # eval form values match host Horner on the domain
    got = F.decode(np.asarray(ev))
    want = [host_eval(coefs, w, r) for w in po.dom.domain_int]
    assert got == want
    back = po.eval_to_coef(ev)
    assert F.decode(np.asarray(back)) == coefs
    # brp ordering roundtrip
    ev_b = po.coef_to_eval(cm, brp=True)
    assert F.decode(np.asarray(po.eval_to_coef(ev_b, brp=True))) == coefs


def test_eval_coef_at_and_barycentric(po):
    F = po.F
    r = F.p_int
    rng = random.Random(7)
    coefs = [rng.randrange(r) for _ in range(po.n)]
    cm = enc(F, coefs)
    zs = [rng.randrange(2, r), po.dom.domain_int[3]]  # off- and in-domain
    zm = enc(F, zs)
    got = F.decode(np.asarray(po.eval_coef_at(cm, zm)))
    want = [host_eval(coefs, z, r) for z in zs]
    assert got == want
    # barycentric over the evaluation form, natural and brp order
    ev = po.coef_to_eval(cm)
    for brp in (False, True):
        evx = po.dom.brp_permute(ev) if brp else ev
        for z, w in zip(zs, want):
            g = po.eval_lagrange_at(evx, enc(F, [z])[0], brp=brp)
            assert F.decode(np.asarray(g)[None])[0] == w


def test_inverse_difference_array(po):
    F = po.F
    r = F.p_int
    z = 0xDEADBEEF
    invd, in_dom = po.inverse_difference_array(enc(F, [z])[0])
    assert not np.asarray(in_dom).any()
    got = F.decode(np.asarray(invd))
    want = [pow((z - w) % r, -1, r) for w in po.dom.domain_int]
    assert got == want
    # in-domain: pole masked to zero
    invd, in_dom = po.inverse_difference_array(
        enc(F, [po.dom.domain_int[5]])[0])
    assert np.asarray(in_dom)[5] and np.asarray(in_dom).sum() == 1
    assert F.decode(np.asarray(invd))[5] == 0


def test_div_by_linear(po):
    F = po.F
    r = F.p_int
    rng = random.Random(11)
    coefs = [rng.randrange(r) for _ in range(po.n)]
    z = rng.randrange(2, r)
    q, rem = po.div_by_linear(enc(F, coefs), enc(F, [z])[0])
    qh = F.decode(np.asarray(q))
    assert F.decode(np.asarray(rem)[None])[0] == host_eval(coefs, z, r)
    # reconstruct: q(X)*(X - z) + p(z) == p(X)
    recon = [0] * po.n
    for i, qc in enumerate(qh[:-1]):
        recon[i + 1] = (recon[i + 1] + qc) % r
        recon[i] = (recon[i] - qc * z) % r
    recon[0] = (recon[0] + host_eval(coefs, z, r)) % r
    assert qh[-1] == 0
    assert recon == [c % r for c in coefs]


def test_vanishing_poly(po):
    F = po.F
    r = F.p_int
    rng = random.Random(13)
    roots = [rng.randrange(r) for _ in range(5)]
    vp = po.vanishing_poly_from_roots(enc(F, roots))
    vph = F.decode(np.asarray(vp))
    for root in roots:
        assert host_eval(vph, root, r) == 0
    z = rng.randrange(r)
    want = 1
    for root in roots:
        want = want * (z - root) % r
    assert host_eval(vph, z, r) == want


def test_lagrange_basis(po):
    F = po.F
    r = F.p_int
    rng = random.Random(17)
    z = rng.randrange(2, r)
    L = po.lagrange_basis_at(enc(F, [z])[0])
    coefs = [rng.randrange(r) for _ in range(po.n)]
    ev = po.coef_to_eval(enc(F, coefs))
    # sum_i L_i(z) * p(w_i) == p(z)
    terms = F.mul(L, ev)
    acc = 0
    for t in F.decode(np.asarray(terms)):
        acc = (acc + t) % r
    assert acc == host_eval(coefs, z, r)
    # in-domain: L_i(w_j) = delta_ij
    Ld = po.lagrange_basis_at(enc(F, [po.dom.domain_int[2]])[0])
    vals = F.decode(np.asarray(Ld))
    assert vals[2] == 1 and sum(vals) == 1


def test_mul_coef(po):
    F = po.F
    r = F.p_int
    rng = random.Random(19)
    big = PolyOps(get_domain("BLS12_381", LOG_N + 1))
    a = [rng.randrange(r) for _ in range(po.n)]
    b = [rng.randrange(r) for _ in range(po.n)]
    got = F.decode(np.asarray(po.mul_coef(enc(F, a), enc(F, b),
                                          out_domain=big)))
    want = [0] * (2 * po.n)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            want[i + j] = (want[i + j] + ai * bj) % r
    assert got == want
