"""CLI lifecycle over files (python -m fusion_cryptography_tpu)."""
import sys

import pytest

from fusion_cryptography_tpu.__main__ import main


def test_cli_lifecycle(tmp_path, capsys):
    p = lambda name: str(tmp_path / name)
    assert main(["setup", "--secpar", "128", "--seed", "42", "--out", p("params.fp")]) == 0
    assert main(["keygen", "--params", p("params.fp"), "--seed", "7",
                 "--out-sk", p("sk1.fp"), "--out-vk", p("vk1.fp")]) == 0
    assert main(["keygen", "--params", p("params.fp"), "--seed", "8",
                 "--out-sk", p("sk2.fp"), "--out-vk", p("vk2.fp")]) == 0
    assert main(["sign", "--params", p("params.fp"), "--sk", p("sk1.fp"),
                 "--message", "hello", "--out", p("s1.fp")]) == 0
    assert main(["sign", "--params", p("params.fp"), "--sk", p("sk2.fp"),
                 "--message", "world", "--out", p("s2.fp")]) == 0
    assert main(["aggregate", "--params", p("params.fp"),
                 "--vk", p("vk1.fp"), "--message", "hello", "--sig", p("s1.fp"),
                 "--vk", p("vk2.fp"), "--message", "world", "--sig", p("s2.fp"),
                 "--out", p("agg.fp")]) == 0
    assert main(["verify", "--params", p("params.fp"),
                 "--vk", p("vk1.fp"), "--message", "hello",
                 "--vk", p("vk2.fp"), "--message", "world", "--agg", p("agg.fp")]) == 0
    # tampered message -> exit 1 with the reference reason string
    assert main(["verify", "--params", p("params.fp"),
                 "--vk", p("vk1.fp"), "--message", "HELLO",
                 "--vk", p("vk2.fp"), "--message", "world", "--agg", p("agg.fp")]) == 1
    out = capsys.readouterr().out
    assert "Target doesn't match image of aggregate signature." in out


def test_cli_arity_errors(tmp_path):
    p = lambda name: str(tmp_path / name)
    assert main(["setup", "--secpar", "128", "--seed", "1", "--out", p("params.fp")]) == 0
    assert main(["keygen", "--params", p("params.fp"), "--seed", "2",
                 "--out-sk", p("sk.fp"), "--out-vk", p("vk.fp")]) == 0
    assert main(["sign", "--params", p("params.fp"), "--sk", p("sk.fp"),
                 "--message", "m", "--out", p("s.fp")]) == 0
    # mismatched counts
    assert main(["aggregate", "--params", p("params.fp"),
                 "--vk", p("vk.fp"), "--message", "m", "--message", "m2",
                 "--sig", p("s.fp"), "--out", p("agg.fp")]) == 2
