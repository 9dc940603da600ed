"""Randomized differential testing against the mounted reference implementation.

Runs random operation sequences through both this framework's compat objects
and the reference's classes, comparing every repr byte-for-byte, plus full
random lifecycles (random seeds/messages/sizes) compared end-to-end.  Skipped
when /root/reference is not mounted.
"""
import random
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

if REF.exists() and str(REF) not in sys.path:
    sys.path.insert(0, str(REF))


@pytest.fixture(scope="module")
def ref_modules():
    from algebra import polynomials as ref_poly  # type: ignore
    from fusion import fusion as ref_fusion  # type: ignore

    return ref_poly, ref_fusion


RING = dict(modulus=2147465729, degree=64, root=23584283,
            inv_root=pow(23584283, 2147465729 - 2, 2147465729), root_order=128)


def test_random_polynomial_algebra(ref_modules):
    ref_poly, _ = ref_modules
    from fusion_cryptography_tpu.interop import objects as ours

    rng = random.Random(1234)
    q, d = RING["modulus"], RING["degree"]

    def make_pair(kind):
        vals = [rng.randrange(-(q // 2), q // 2 + 1) for _ in range(d)]
        if kind == "coef":
            return (
                ours.PolynomialCoefficientRepresentation(**RING, coefficients=list(vals)),
                ref_poly.PolynomialCoefficientRepresentation(**RING, coefficients=list(vals)),
            )
        return (
            ours.PolynomialNTTRepresentation(**RING, values=list(vals)),
            ref_poly.PolynomialNTTRepresentation(**RING, values=list(vals)),
        )

    for trial in range(12):
        kind = rng.choice(["coef", "ntt"])
        a_o, a_r = make_pair(kind)
        b_o, b_r = make_pair(kind)
        op = rng.choice(["add", "sub", "mul", "neg", "transform"])
        if op == "add":
            got, want = a_o + b_o, a_r + b_r
        elif op == "sub":
            got, want = a_o - b_o, a_r - b_r
        elif op == "mul":
            got, want = a_o * b_o, a_r * b_r
        elif op == "neg":
            got, want = -a_o, -a_r
        else:
            got, want = ours.transform(a_o), ref_poly.transform(a_r)
        assert str(got) == str(want), f"trial {trial}: {kind} {op} diverged"
        assert str(a_o) == str(a_r)  # inputs untouched


def test_random_samplers(ref_modules):
    ref_poly, _ = ref_modules
    from fusion_cryptography_tpu.interop import objects as ours

    rng = random.Random(99)
    for _ in range(6):
        seed = rng.randrange(2**32)
        nb = rng.randrange(1, 60)
        wb = rng.randrange(0, 80)
        got = ours.sample_polynomial_coefficient_representation(
            **RING, norm_bound=nb, weight_bound=wb, seed=seed
        )
        want = ref_poly.sample_polynomial_coefficient_representation(
            **RING, norm_bound=nb, weight_bound=wb, seed=seed
        )
        assert str(got) == str(want)
        got = ours.sample_polynomial_ntt_representation(**RING, seed=seed + 1)
        want = ref_poly.sample_polynomial_ntt_representation(**RING, seed=seed + 1)
        assert str(got) == str(want)


def test_random_lifecycles(ref_modules):
    _, ref_fusion = ref_modules
    from fusion_cryptography_tpu.interop import api

    rng = random.Random(777)
    for trial in range(2):
        setup_seed = rng.randrange(2**32)
        params = api.fusion_setup(128, setup_seed)
        rparams = ref_fusion.fusion_setup(128, setup_seed)
        assert str(params) == str(rparams)
        n = rng.randrange(1, 4)
        keys, rkeys, msgs = [], [], []
        for i in range(n):
            ks = rng.randrange(2**31)
            keys.append(api.keygen(params, ks))
            rkeys.append(ref_fusion.keygen(rparams, ks))
            msgs.append(f"trial{trial}-msg{i}-{rng.randrange(1000)}")
            assert str(keys[i][1]) == str(rkeys[i][1])
        sigs = [api.sign(params, k, m) for k, m in zip(keys, msgs)]
        rsigs = [ref_fusion.sign(rparams, k, m) for k, m in zip(rkeys, msgs)]
        for s, r in zip(sigs, rsigs):
            assert str(s) == str(r)
        agg = api.aggregate(params, [k[1] for k in keys], msgs, sigs)
        ragg = ref_fusion.aggregate(rparams, [k[1] for k in rkeys], msgs, rsigs)
        assert str(agg) == str(ragg)
        ok, why = api.verify(params, [k[1] for k in keys], msgs, agg)
        rok, rwhy = ref_fusion.verify(rparams, [k[1] for k in rkeys], msgs, ragg)
        assert (ok, why) == (rok, rwhy) == (True, "")
        # tampered message must fail identically
        bad_msgs = list(msgs)
        bad_msgs[0] += "x"
        ok, why = api.verify(params, [k[1] for k in keys], bad_msgs, agg)
        rok, rwhy = ref_fusion.verify(rparams, [k[1] for k in rkeys], bad_msgs, ragg)
        assert (ok, why) == (rok, rwhy)
        assert not ok
