"""Flag-surface parity: every reference main.py flag parses here.

The reference's distributed plumbing flags (--distributed, --world_size,
--dist_url, --dist_backend, --local_rank, --device; main.py:165-187) are
accepted-and-ignored so reference launch commands run unmodified — process
placement comes from the TPU runtime and the mesh (MIGRATION.md).
"""

import argparse
import os
import re

import pytest


def _parse(argv):
    from poet_tpu.cli import args_to_config, get_args_parser

    parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = parser.parse_args(argv)
    return args, args_to_config(args)


def test_every_reference_flag_is_accepted():
    ref_main = os.environ.get("POET_REFERENCE_MAIN", "/root/reference/main.py")
    if not os.path.exists(ref_main):
        pytest.skip("reference checkout not available")
    ref = open(ref_main).read()
    ref_flags = set(re.findall(r"add_argument\(\s*['\"](--[\w-]+)", ref))
    assert ref_flags, "reference flag extraction failed"
    from poet_tpu.cli import get_args_parser

    ours = {opt for a in get_args_parser()._actions for opt in a.option_strings}
    missing = sorted(f for f in ref_flags if f not in ours)
    assert not missing, f"reference flags not accepted: {missing}"


def test_reference_distributed_launch_command_parses():
    # the flag set launch_distributed.py passes to each worker
    # (launch_distributed.py:54-92) plus the README multi-GPU example
    args, cfg = _parse([
        "--distributed", "--world_size", "4", "--local_rank", "2",
        "--dist_url", "env://", "--dist_backend", "nccl", "--device", "cuda",
        "--gpu", "2", "--batch_size", "16", "--epochs", "50",
        "--enc_layers", "5", "--dec_layers", "5", "--nheads", "16",
    ])
    # ignored plumbing must not leak into the config
    assert cfg.optim.batch_size == 16
    assert cfg.model.enc_layers == 5 and cfg.model.nheads == 16
