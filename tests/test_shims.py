"""Drop-in import-surface shims vs the reference API: the list-level NTT
functions and the PREFIX_PARAMETERS table must match reference behavior/values
exactly (cross-checked against the mounted reference where available)."""
import random
from pathlib import Path

import numpy as np
import pytest

from fusion_cryptography_tpu.algebra.ntt import (
    bit_reverse_copy,
    cent,
    cooley_tukey_ntt,
    find_primitive_root,
    gentleman_sande_intt,
    ntt_poly_mult,
)
from fusion_cryptography_tpu.fusion.fusion import PREFIX_PARAMETERS

REF = Path("/root/reference")


def _table(root, inv_root, d, q):
    powers = [pow(root, i, q) for i in range(d)]
    inv_powers = [pow(inv_root, i, q) for i in range(d)]
    return bit_reverse_copy(powers), bit_reverse_copy(inv_powers)


def test_list_level_roundtrip():
    q, d = 17, 8
    psi = find_primitive_root(q, 2 * d)
    inv_psi = pow(psi, q - 2, q)
    brp, brpi = _table(psi, inv_psi, d, q)
    rng = random.Random(0)
    f = [rng.randrange(q) for _ in range(d)]
    val = list(f)
    out = cooley_tukey_ntt(val=val, modulus=q, root_order=2 * d, bit_rev_root_powers=brp)
    assert out is val  # in-place contract
    back = gentleman_sande_intt(val=val, modulus=q, root_order=2 * d, bit_rev_inv_root_powers=brpi)
    assert [(a - b) % q for a, b in zip(back, f)] == [0] * d


def test_list_level_matches_reference():
    ref_ntt = pytest.importorskip("algebra.ntt") if str(REF) in __import__("sys").path else None
    import sys

    if str(REF) not in sys.path:
        if not REF.exists():
            pytest.skip("reference not mounted")
        sys.path.insert(0, str(REF))
    from algebra import ntt as ref_ntt  # type: ignore

    q, d = 257, 64
    psi = find_primitive_root(q, 2 * d)
    inv_psi = pow(psi, q - 2, q)
    brp, brpi = _table(psi, inv_psi, d, q)
    rng = random.Random(1)
    f = [rng.randrange(-(q // 2), q // 2 + 1) for _ in range(d)]
    ours = cooley_tukey_ntt(val=list(f), modulus=q, root_order=2 * d, bit_rev_root_powers=brp)
    theirs = ref_ntt.cooley_tukey_ntt(val=list(f), modulus=q, root_order=2 * d, bit_rev_root_powers=list(brp))
    assert ours == theirs
    back_ours = gentleman_sande_intt(val=list(ours), modulus=q, root_order=2 * d, bit_rev_inv_root_powers=brpi)
    back_theirs = ref_ntt.gentleman_sande_intt(val=list(theirs), modulus=q, root_order=2 * d, bit_rev_inv_root_powers=list(brpi))
    assert back_ours == back_theirs
    # ntt_poly_mult incl. its in-place side effect on f and g
    g = [rng.randrange(-(q // 2), q // 2 + 1) for _ in range(d)]
    f1, g1 = list(f), list(g)
    f2, g2 = list(f), list(g)
    p_ours = ntt_poly_mult(f=f1, g=g1, modulus=q, root=psi, inv_root=inv_psi, root_order=2 * d)
    p_theirs = ref_ntt.ntt_poly_mult(f=f2, g=g2, modulus=q, root=psi, inv_root=inv_psi, root_order=2 * d)
    assert p_ours == p_theirs
    assert f1 == f2 and g1 == g2  # side-effect parity


def test_cent_parity():
    for val in [0, 1, -1, 5, 100, -100, 12345678901234567890, -12345678901234567890]:
        assert cent(val=val, modulus=17, halfmod=8, logmod=5) == ((val % 17) - 17 if (val % 17) > 8 else val % 17)
    with pytest.raises(TypeError):
        cent(val=1.5, modulus=17, halfmod=8, logmod=5)  # type: ignore
    with pytest.raises(ValueError):
        cent(val=1, modulus=1, halfmod=1, logmod=5)


def test_prefix_parameters_match_reference():
    import sys

    if not REF.exists():
        pytest.skip("reference not mounted")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from fusion import fusion as ref  # type: ignore

    for secpar in (128, 256):
        ours = PREFIX_PARAMETERS[secpar]
        theirs = ref.PREFIX_PARAMETERS[secpar]
        assert set(ours) == set(theirs)
        for k in theirs:
            assert ours[k] == theirs[k], f"{secpar}/{k}: {ours[k]} != {theirs[k]}"


def test_fusion_shim_lifecycle():
    from fusion_cryptography_tpu.fusion.fusion import (
        aggregate,
        fusion_setup,
        keygen,
        sign,
        verify,
    )

    params = fusion_setup(128, 3)
    k1, k2 = keygen(params, 10), keygen(params, 11)
    sigs = [sign(params, k1, "a"), sign(params, k2, "b")]
    agg = aggregate(params, [k1[1], k2[1]], ["a", "b"], sigs)
    ok, why = verify(params, [k1[1], k2[1]], ["a", "b"], agg)
    assert ok, why
