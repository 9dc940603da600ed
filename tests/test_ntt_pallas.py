"""Pallas fused NTT kernels vs the jnp stage-sweep kernels (interpret mode on
CPU; the same kernels compile for TPU — exercised by bench/microbench)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fusion_cryptography_tpu.ops.field import Q
from fusion_cryptography_tpu.ops.ntt import make_plan, ntt_fwd, ntt_inv
from fusion_cryptography_tpu.ops.ntt_pallas import ntt_fwd_pallas, ntt_inv_pallas


@pytest.mark.parametrize("d,root", [(64, 23584283), (256, 3337519)])
def test_pallas_fwd_inv_match(d, root):
    plan = make_plan(Q, d, root)
    rng = np.random.default_rng(d)
    x = rng.integers(-(Q // 2), Q // 2 + 1, size=(70, d), dtype=np.int64).astype(np.int32)
    xj = jnp.asarray(x)
    got_f = np.asarray(ntt_fwd_pallas(plan, xj, tile=32, interpret=True))
    np.testing.assert_array_equal(got_f, np.asarray(ntt_fwd(plan, xj)))
    got_i = np.asarray(ntt_inv_pallas(plan, jnp.asarray(got_f), tile=32, interpret=True))
    np.testing.assert_array_equal(got_i, x)


def test_pallas_multidim():
    plan = make_plan(Q, 256, 3337519)
    rng = np.random.default_rng(9)
    x = rng.integers(-1000, 1000, size=(3, 5, 256)).astype(np.int32)
    got = np.asarray(ntt_fwd_pallas(plan, jnp.asarray(x), tile=8, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(ntt_fwd(plan, jnp.asarray(x))))
