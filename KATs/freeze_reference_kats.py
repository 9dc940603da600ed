#!/usr/bin/env python
"""Freeze golden KAT files by running the LIVE reference implementation.

The upstream corpus ships only 6 of the 18 stage files
(/root/reference/KATs/.MISSING_LARGE_BLOBS lists the rest), and the committed
aggregate rows are stale against the mounted reference code (interop/kat.py).
This script regenerates every stage with the reference code itself under a
fixed global-RNG seed and a reduced keypair count, so the frozen corpus is
(a) authoritative (produced by the reference, not by this framework) and
(b) small enough to commit.  tests/test_kat_frozen.py then requires this
framework's generator to reproduce every file byte-for-byte.

Usage: python KATs/freeze_reference_kats.py [--out-dir reference_frozen]
       [--seed 20260820] [--signers 3] [--reference /root/reference]

Mirrors /root/reference/KATs/generate_KAT_values.py's RNG interleaving
(seed_a drawn first, sk seeds drawn between keygens) and its quirk of hashing
full (sk, vk) key tuples into the aggregation XOF (:120-133).
"""
import argparse
import csv
import random
import sys
from math import ceil, log2
from pathlib import Path


def emit(dir_: Path, name: str, row):
    with open(dir_ / name, "a", newline="") as f:
        csv.writer(f).writerow(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=str(Path(__file__).parent / "reference_frozen"))
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--signers", type=int, default=3)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--secpars", type=int, nargs="*", default=[128, 256])
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    from fusion import fusion as ref

    out = Path(args.out_dir)
    out.mkdir(exist_ok=True)
    for old in out.glob("*.csv"):
        old.unlink()
    random.seed(args.seed)

    for secpar in args.secpars:
        seed_a = random.randint(0, 2**32 - 1)
        params = ref.fusion_setup(secpar, seed_a)
        emit(out, f"fusion_setup_KAT_{secpar}.csv", [str((secpar, seed_a)), str(params)])

        otks, otvks, msgs, prehashed, challs, sigs = [], [], [], [], [], []
        for i in range(args.signers):
            sk_seed = random.randint(0, 2**32 - 1)
            msgs.append(str(i))
            otks.append(ref.keygen(params, sk_seed))
            emit(out, f"fusion_keygen_KAT_{secpar}.csv",
                 [str((params, sk_seed)), str(otks[-1])])
            otvks.append(otks[i][1])

            prehashed.append(ref.hash_message_to_int(params, msgs[i]))
            emit(out, f"intermediate_hash_message_to_int_KAT_{secpar}.csv",
                 [str((params, msgs[i])), str(prehashed[-1])])

            num_coefs = max(0, min(params.degree, params.omega_ch))
            bound = max(0, min(params.modulus // 2, params.beta_ch))
            bpc = ceil((log2(bound) + 1 + params.secpar) / 8)
            bpi = ceil((log2(params.degree) + params.secpar) / 8)
            n = ceil(params.omega_ch / 8) + bpc * num_coefs + params.degree * bpi
            chall_bytes = ref.hash_vk_and_int_to_bytes(params, otvks[i], prehashed[i], n)
            emit(out, f"intermediate_hash_vk_and_int_to_bytes_to_int_KAT_{secpar}.csv",
                 [str((params, otvks[i], prehashed[i], n)), str(chall_bytes)])

            challs.append(ref.hash_ch(params, otvks[i], msgs[i]))
            emit(out, f"intermediate_hash_ch_KAT_{secpar}.csv",
                 [str((params, otvks[i], msgs[i])), str(challs[-1])])

            sigs.append(ref.sign(params, otks[i], msgs[i]))
            emit(out, f"fusion_sign_KAT_{secpar}.csv",
                 [str((params, otks[i], prehashed[i])), str(sigs[-1])])

        agg_bytes = ref.hash_vks_and_ints_and_challs_to_bytes(params, otks, prehashed, challs)
        emit(out, f"intermediate_hash_vks_and_ints_and_challs_to_bytes_KAT_{secpar}.csv",
             [str((params, otks, prehashed, challs)), str(agg_bytes)])

        agg_coefs = ref.hash_ag(params, otks, msgs)
        emit(out, f"intermediate_hash_ag_KAT_{secpar}.csv",
             [str((params, otks, msgs)), str(agg_coefs)])

        agg_sig = ref.aggregate(params, otvks, msgs, sigs)
        emit(out, f"fusion_aggregate_KAT_{secpar}.csv",
             [str((params, otvks, msgs, sigs)), str(agg_sig)])

        assert ref.verify(params, otvks, msgs, agg_sig)
        print(f"secpar={secpar}: frozen {args.signers}-signer corpus written")


if __name__ == "__main__":
    main()
