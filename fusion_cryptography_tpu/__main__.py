"""Command-line interface: keygen / sign / aggregate / verify over files.

The reference is library-only (SURVEY.md §0: no CLI, no server); this adds the
operational surface for deployments.  Objects are stored in the framework's
versioned binary format (scheme/serde.py); messages are UTF-8 text arguments
or files.

Examples:
    python -m fusion_cryptography_tpu setup  --secpar 256 --seed 42 --out params.fp
    python -m fusion_cryptography_tpu keygen --params params.fp --seed 7 \
        --out-sk sk.fp --out-vk vk.fp
    python -m fusion_cryptography_tpu sign   --params params.fp --sk sk.fp \
        --message "hello" --out sig.fp
    python -m fusion_cryptography_tpu aggregate --params params.fp \
        --vk vk1.fp --message m1 --sig s1.fp  --vk vk2.fp --message m2 --sig s2.fp \
        --out agg.fp
    python -m fusion_cryptography_tpu verify --params params.fp \
        --vk vk1.fp --message m1 --vk vk2.fp --message m2 --agg agg.fp
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _write(path: str, data: bytes) -> None:
    Path(path).write_bytes(data)


def _read(path: str) -> bytes:
    return Path(path).read_bytes()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fusion_cryptography_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("setup", help="create a parameter set")
    p.add_argument("--secpar", type=int, default=256, choices=(128, 256))
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("keygen", help="generate a one-time key pair")
    p.add_argument("--params", required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--out-sk", required=True)
    p.add_argument("--out-vk", required=True)

    p = sub.add_parser("sign", help="sign one message")
    p.add_argument("--params", required=True)
    p.add_argument("--sk", required=True)
    p.add_argument("--message", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("aggregate", help="aggregate signatures")
    p.add_argument("--params", required=True)
    p.add_argument("--vk", action="append", required=True)
    p.add_argument("--message", action="append", required=True)
    p.add_argument("--sig", action="append", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("verify", help="verify an aggregate signature")
    p.add_argument("--params", required=True)
    p.add_argument("--vk", action="append", required=True)
    p.add_argument("--message", action="append", required=True)
    p.add_argument("--agg", required=True)

    args = ap.parse_args(argv)

    import numpy as np

    from .interop import api
    from .scheme import serde

    if args.cmd == "setup":
        params = api.fusion_setup(args.secpar, args.seed)
        _write(args.out, serde.encode_params(params))
        print(f"wrote {args.out} (secpar={args.secpar})")
        return 0

    params = serde.decode_params(_read(args.params))

    if args.cmd == "keygen":
        sk, vk = api.keygen(params, args.seed)
        _write(args.out_sk, serde.encode_sk(params, args.seed, sk.sk_hat))
        _write(args.out_vk, serde.encode_vk(params, vk.vk))
        print(f"wrote {args.out_sk}, {args.out_vk}")
        return 0

    if args.cmd == "sign":
        secpar, seed, sk_hat = serde.decode_sk(_read(args.sk))
        if secpar != params.secpar:
            print("error: key/params security level mismatch", file=sys.stderr)
            return 2
        sk = api.OneTimeSigningKey(params, seed, sk_hat)
        # reconstruct the vk (needed for the challenge hash) from the sk
        from .scheme.lifecycle import _ctx
        import jax.numpy as jnp

        ctx = _ctx(params)
        F = ctx["field"]
        vk_u = F.dot_mod(ctx["a_mont"], F.to_unsigned(jnp.asarray(sk_hat)), axis=-2)
        vk = api.OneTimeVerificationKey(params, np.asarray(F.to_centered(vk_u)))
        sig = api.sign(params, (sk, vk), args.message)
        _write(args.out, serde.encode_signature(params, sig.signature_hat))
        print(f"wrote {args.out}")
        return 0

    if args.cmd == "aggregate":
        if not (len(args.vk) == len(args.message) == len(args.sig)):
            print("error: need equal counts of --vk/--message/--sig", file=sys.stderr)
            return 2
        vks = [api.OneTimeVerificationKey(params, serde.decode_vk(_read(v))[1]) for v in args.vk]
        sigs = [api.Signature(params, serde.decode_signature(_read(s))[1]) for s in args.sig]
        agg = api.aggregate(params, vks, args.message, sigs)
        _write(args.out, serde.encode_signature(params, agg.signature_hat))
        print(f"wrote {args.out} (aggregate of {len(sigs)})")
        return 0

    if args.cmd == "verify":
        if len(args.vk) != len(args.message):
            print("error: need equal counts of --vk/--message", file=sys.stderr)
            return 2
        vks = [api.OneTimeVerificationKey(params, serde.decode_vk(_read(v))[1]) for v in args.vk]
        agg = api.Signature(params, serde.decode_signature(_read(args.agg))[1])
        ok, why = api.verify(params, vks, args.message, agg)
        print("OK" if ok else f"FAIL: {why}")
        return 0 if ok else 1

    return 2


if __name__ == "__main__":
    sys.exit(main())
