"""MXU dense Pallas NTT/INTT vs the stage-sweep kernels (interpret mode on
CPU; the compiled kernels are exercised on TPU by the bench path and
benchmarks/intt_cliff_lab.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fusion_cryptography_tpu.ops.field import Q
from fusion_cryptography_tpu.ops.ntt import make_plan, ntt_fwd_u, ntt_inv_u
from fusion_cryptography_tpu.ops.ntt_mxu_pallas import (
    ntt_fwd_u_mxu_pallas,
    ntt_inv_u_mxu_pallas,
)


@pytest.mark.parametrize("d,root", [(64, 23584283), (256, 3337519)])
@pytest.mark.fast
def test_mxu_pallas_matches_stage_sweep(d, root):
    plan = make_plan(Q, d, root)
    rng = np.random.default_rng(d)
    x = jnp.asarray(rng.integers(0, Q, size=(70, d), dtype=np.int64).astype(np.uint32))
    want_f = np.asarray(ntt_fwd_u(plan, x))
    got_f = np.asarray(ntt_fwd_u_mxu_pallas(plan, x, tile=32, interpret=True))
    np.testing.assert_array_equal(got_f, want_f)
    got_i = np.asarray(ntt_inv_u_mxu_pallas(plan, jnp.asarray(want_f), tile=32,
                                            interpret=True))
    np.testing.assert_array_equal(got_i, np.asarray(x))


def test_mxu_norm_weight_matches_explicit():
    from fusion_cryptography_tpu.ops.field import FUSION_FIELD as F
    from fusion_cryptography_tpu.ops.ntt_mxu_pallas import (
        intt_norm_weight_mxu_pallas,
    )

    plan = make_plan(Q, 256, 3337519)
    rng = np.random.default_rng(4)
    # include sparse rows so the nonzero count varies
    x = rng.integers(0, Q, size=(6, 5, 256), dtype=np.int64).astype(np.uint32)
    x[0, 0] = 0
    xj = jnp.asarray(x)
    nrm, wgt = intt_norm_weight_mxu_pallas(plan, xj, tile=8, interpret=True)
    import jax

    coef = np.asarray(F.to_centered(ntt_inv_u(plan, xj)))
    np.testing.assert_array_equal(np.asarray(nrm), np.abs(coef).max(axis=-1))
    np.testing.assert_array_equal(np.asarray(wgt), (coef != 0).sum(axis=-1))


def test_mxu_pallas_multidim_and_padding():
    plan = make_plan(Q, 256, 3337519)
    rng = np.random.default_rng(9)
    # 7 leading rows: forces the pad-to-tile path (tile=4 -> pad to 8)
    x = jnp.asarray(rng.integers(0, Q, size=(7, 3, 256), dtype=np.int64
                                 ).astype(np.uint32))
    got = np.asarray(ntt_inv_u_mxu_pallas(plan, x, tile=4, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(ntt_inv_u(plan, x)))
