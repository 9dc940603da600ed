#!/usr/bin/env python
"""KAT generator: produce the reference corpus file formats through this
framework (component parity with /root/reference/KATs/generate_KAT_values.py).

Emits the same CSV rows — ``(input_repr, output_repr)`` per stage — with the
same global-RNG interleaving (setup advances the stream, sk seeds drawn between
keygens), so two runs of this script and the reference script from the same
RNG state produce identical files for every stage the reference code still
reproduces (see interop/kat.py on the stale committed aggregate rows).

Usage: python KATs/generate_kat_values.py [--out-dir KAT_values] [--seed S]
"""
import argparse
import csv
import random
from math import ceil, log2
from pathlib import Path

from fusion_cryptography_tpu.interop import api
from fusion_cryptography_tpu.hashing.xof import challenge_xof_len


def emit(dir_: Path, name: str, row):
    with open(dir_ / name, "a", newline="") as f:
        csv.writer(f).writerow(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=str(Path(__file__).parent / "KAT_values"))
    ap.add_argument("--seed", type=int, default=None,
                    help="seed the global stream first for reproducible corpora")
    ap.add_argument("--secpars", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--signers", type=int, default=10,
                    help="keypairs per security level (the reference uses 10)")
    args = ap.parse_args()
    out = Path(args.out_dir)
    out.mkdir(exist_ok=True)
    if args.seed is not None:
        random.seed(args.seed)

    for secpar in args.secpars:
        seed_a = random.randint(0, 2**32 - 1)
        params = api.fusion_setup(secpar, seed_a)
        emit(out, f"fusion_setup_KAT_{secpar}.csv", [str((secpar, seed_a)), str(params)])

        otks, otvks, msgs, prehashed, challs, sigs = [], [], [], [], [], []
        for i in range(args.signers):
            sk_seed = random.randint(0, 2**32 - 1)
            msgs.append(str(i))
            otks.append(api.keygen(params, sk_seed))
            emit(out, f"fusion_keygen_KAT_{secpar}.csv",
                 [str((params, sk_seed)), str(otks[-1])])
            otvks.append(otks[i][1])

            prehashed.append(api.hash_message_to_int(params, msgs[i]))
            emit(out, f"intermediate_hash_message_to_int_KAT_{secpar}.csv",
                 [str((params, msgs[i])), str(prehashed[-1])])

            n = challenge_xof_len(params.secpar, params.degree, params.modulus,
                                  params.beta_ch, params.omega_ch)
            chall_bytes = api.hash_vk_and_int_to_bytes(params, otvks[i], prehashed[i], n)
            emit(out, f"intermediate_hash_vk_and_int_to_bytes_to_int_KAT_{secpar}.csv",
                 [str((params, otvks[i], prehashed[i], n)), str(chall_bytes)])

            challs.append(api.hash_ch(params, otvks[i], msgs[i]))
            emit(out, f"intermediate_hash_ch_KAT_{secpar}.csv",
                 [str((params, otvks[i], msgs[i])), str(challs[-1])])

            sigs.append(api.sign(params, otks[i], msgs[i]))
            emit(out, f"fusion_sign_KAT_{secpar}.csv",
                 [str((params, otks[i], prehashed[i])), str(sigs[-1])])

        # NB quirk parity: the reference generator hashes the full (sk, vk)
        # tuples here, not just the vks (generate_KAT_values.py:120-133).
        agg_bytes = api.hash_vks_and_ints_and_challs_to_bytes(params, otks, prehashed, challs)
        emit(out, f"intermediate_hash_vks_and_ints_and_challs_to_bytes_KAT_{secpar}.csv",
             [str((params, otks, prehashed, challs)), str(agg_bytes)])

        agg_coefs = api.hash_ag(params, otks, msgs)
        emit(out, f"intermediate_hash_ag_KAT_{secpar}.csv",
             [str((params, otks, msgs)), str(agg_coefs)])

        agg_sig = api.aggregate(params, otvks, msgs, sigs)
        emit(out, f"fusion_aggregate_KAT_{secpar}.csv",
             [str((params, otvks, msgs, sigs)), str(agg_sig)])

        ok, why = api.verify(params, otvks, msgs, agg_sig)
        assert ok, why
        print(f"secpar={secpar}: corpus written and aggregate verifies")


if __name__ == "__main__":
    main()
