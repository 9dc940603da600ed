"""Pallas VMEM fold kernels vs the XLA word-assembly path (interpret mode).

The kernels must be BIT-identical: their outputs feed SHAKE preimages whose
formats are pinned by the reference str() serialization and the KAT corpus.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.ops import fold_pallas as fp
from fusion_cryptography_tpu.ops import ragged_words as rw


@pytest.fixture(scope="module")
def setup():
    params = ftpu.fusion_setup(128, 42)  # d=64 keeps interpret mode fast
    B = 8
    d = params.degree
    q = params.modulus
    rng = np.random.default_rng(11)
    vk2d_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (2 * d, B),
                                      dtype=np.int64).astype(np.int32))
    c_hat_t = jnp.asarray(rng.integers(-(q // 2), q // 2 + 1, (d, B),
                                       dtype=np.int64).astype(np.int32))
    # prehash digit chunks with RAGGED lengths (1..78 digits)
    lens = rng.integers(1, ds.PREHASH_W + 1, B).astype(np.int32)
    by = np.zeros((ds.PREHASH_W + 2, B), np.uint8)
    for b in range(B):
        by[: lens[b], b] = rng.integers(ord("1"), ord("9"), lens[b])
    pre_w = rw.pack_bytes_to_words(jnp.asarray(by))
    pre_len = jnp.asarray(lens)
    return params, vk2d_t, c_hat_t, pre_w, pre_len


def test_signer_folds_match_xla(setup):
    params, vk2d_t, c_hat_t, pre_w, pre_len = setup
    ch_spec = ds.challenge_preimage_spec(params)
    pre_chunk = rw.WChunk(buf=pre_w, length=pre_len, max_len=ds.PREHASH_W, min_len=1)
    vk_chunk = ds.vk_chunk_w(params, vk2d_t)
    pad_ch = -(-(ch_spec.out_max + 1) // 136) * 34
    want_chb, want_cht = ds.fold_challenge_preimage_w(
        params, vk_chunk, pre_chunk, pad_words=pad_ch
    )
    got_chb, got_cht, vkb, vkl = fp.signer_fold_a(
        params, vk2d_t, pre_w, pre_len, tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_cht), np.asarray(want_cht))
    np.testing.assert_array_equal(np.asarray(got_chb), np.asarray(want_chb))
    # the reusable vk chunk matches the XLA fold (padded to spec width)
    np.testing.assert_array_equal(np.asarray(vkl), np.asarray(vk_chunk.length))
    Wvk = rw.words_for(ds.vk_body_spec(params).out_max)
    want_vkb = np.zeros((Wvk, vk2d_t.shape[1]), np.uint32)
    want_vkb[: vk_chunk.buf.shape[0]] = np.asarray(vk_chunk.buf)[:Wvk]
    np.testing.assert_array_equal(np.asarray(vkb), want_vkb)

    want_trib, want_trit = ds.fold_triple_w(params, vk_chunk, pre_chunk, c_hat_t)
    got_trib, got_trit = fp.signer_fold_b(
        params, vkb, vkl, pre_w, pre_len, c_hat_t, tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_trit), np.asarray(want_trit))
    np.testing.assert_array_equal(np.asarray(got_trib), np.asarray(want_trib))


def test_agg_fold_matches_xla(setup):
    params, vk2d_t, c_hat_t, pre_w, pre_len = setup
    N, G = 3, 8
    tri_spec = ds.triple_spec(params)
    pre_chunk = rw.WChunk(buf=pre_w, length=pre_len, max_len=ds.PREHASH_W, min_len=1)
    vk_chunk = ds.vk_chunk_w(params, vk2d_t)
    tbuf, tlen = ds.fold_triple_w(params, vk_chunk, pre_chunk, c_hat_t)
    # three (different) signer columns per group: roll the batch
    tbs = [jnp.roll(tbuf, k, axis=1) for k in range(N)]
    tls = [jnp.roll(tlen, k) for k in range(N)]
    agg_spec = ds.agg_preimage_spec(params, N, tri_spec.out_max)
    tri_min = ds.spec_min_total(tri_spec, [1])
    pad_agg = -(-(agg_spec.out_max + 1) // 136) * 34
    want_b, want_t = ds.assemble_chunks_words(
        agg_spec, values=None, extras=list(zip(tbs, tls)),
        extra_bounds=[(tri_min, tri_spec.out_max)] * N, pad_words=pad_agg,
    )
    got_b, got_t = fp.agg_fold(params, N, tbs, tls, tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
