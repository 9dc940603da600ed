"""Device preimage assembly vs the host serializer (byte-exactness)."""
import numpy as np
import pytest

import fusion_cryptography_tpu as ftpu
from fusion_cryptography_tpu.interop import device_serial as ds
from fusion_cryptography_tpu.interop import serial
from fusion_cryptography_tpu.ops.ragged import ragged_concat, render_decimal

import jax.numpy as jnp


def test_render_decimal_matches_str():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            np.array([0, 1, -1, 9, 10, -10, 99, 100, 10**9, -(10**9), 1073732864, -1073732864]),
            rng.integers(-(2**30), 2**30, size=50),
        ]
    ).astype(np.int32)
    field, start, length = map(np.asarray, render_decimal(jnp.asarray(vals[None, :])))
    for k, v in enumerate(vals):
        got = bytes(field[0, k, start[0, k] : start[0, k] + length[0, k]])
        assert got == str(int(v)).encode(), f"value {v}: {got!r}"


def test_ragged_concat_basic():
    # pool rows: "abcdeXY", segments picking "cd", "", "XYa"
    pool = jnp.asarray(np.frombuffer(b"abcdeXYZ", dtype=np.uint8)[None, :].copy())
    seg_off = jnp.asarray(np.array([[2, 4, 5]], dtype=np.int32))
    seg_len = jnp.asarray(np.array([[2, 0, 3]], dtype=np.int32))
    buf, total = ragged_concat(pool, seg_off, seg_len, 8)
    assert int(total[0]) == 5
    assert bytes(np.asarray(buf)[0, :5]) == b"cdXYZ"


def _prehash_extra(ints):
    w = ds.PREHASH_W
    buf = np.zeros((len(ints), w), dtype=np.uint8)
    lens = np.zeros(len(ints), dtype=np.int32)
    for k, i in enumerate(ints):
        s = str(i).encode()
        buf[k, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[k] = len(s)
    return jnp.asarray(buf), jnp.asarray(lens)


@pytest.mark.parametrize("secpar", [128, 256])
def test_challenge_preimage_matches_host(secpar):
    params = ftpu.fusion_setup(secpar, 11)
    rng = np.random.default_rng(secpar)
    B, d = 5, params.degree
    vks = rng.integers(-(params.modulus // 2), params.modulus // 2 + 1, size=(B, 2, d)).astype(np.int32)
    ints = [int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") for _ in range(B)]
    ints[0] = 0  # shortest possible prehash digits
    spec = ds.challenge_preimage_spec(params)
    buf, total = ds.assemble(
        spec,
        values=jnp.asarray(vks.reshape(B, 2 * d)),
        extras=[_prehash_extra(ints)],
    )
    buf, total = np.asarray(buf), np.asarray(total)
    for b in range(B):
        want = (
            bytes(params.sign_hash_dst)
            + b","
            + serial.vk_str(params, vks[b]).encode()
            + b","
            + str(ints[b]).encode()
        )
        assert bytes(buf[b, : total[b]]) == want, f"lane {b}"


@pytest.mark.parametrize("secpar", [128, 256])
def test_agg_preimage_matches_host(secpar):
    params = ftpu.fusion_setup(secpar, 11)
    rng = np.random.default_rng(secpar + 1)
    N, d = 3, params.degree
    vks = rng.integers(-(params.modulus // 2), params.modulus // 2 + 1, size=(N, 2, d)).astype(np.int32)
    chs = rng.integers(-(params.modulus // 2), params.modulus // 2 + 1, size=(N, d)).astype(np.int32)
    ints = [int.from_bytes(rng.integers(0, 256, 32, dtype=np.uint8).tobytes(), "little") for _ in range(N)]

    tspec = ds.triple_spec(params)
    tvals = np.concatenate([vks.reshape(N, 2 * d), chs], axis=1)
    tbuf, tlen = ds.assemble(tspec, values=jnp.asarray(tvals), extras=[_prehash_extra(ints)])

    gspec = ds.agg_preimage_spec(params, N, tspec.out_max)
    gbuf, gtotal = ds.assemble(
        gspec,
        extras=[(tbuf[k][None, :], tlen[k][None]) for k in range(N)],
    )
    vk_strs = [serial.vk_str(params, vks[k]) for k in range(N)]
    ch_strs = [serial.challenge_str(params, chs[k]) for k in range(N)]
    want = (
        bytes(params.agg_xof_dst) + b"," + serial.zip_triples_str(vk_strs, ints, ch_strs).encode()
    )
    got = bytes(np.asarray(gbuf)[0, : int(np.asarray(gtotal)[0])])
    assert got == want
