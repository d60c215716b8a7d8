"""CLI surface tests: option parser semantics and output-format contracts.

The reference's stdout formats are API (profile.py regex-scrapes them);
these tests pin the formats and the --key=value parser edge cases
(util.cpp:368-427 semantics).
"""

import re

import pytest

from scrooge_tpu.cli import options as opt


def test_scan_and_flag_semantics():
    args = opt.scan_args(["--a", "--b=1", "--c="])
    assert opt.get_flag(args, "--a") == (opt.Opt.EXISTS, None)
    assert opt.get_flag(args, "--b")[0] == opt.Opt.INVALID  # has a value
    assert opt.get_flag(args, "--missing")[0] == opt.Opt.MISSING
    st, v = opt.get_value(args, "--b")
    assert (st, v) == (opt.Opt.VALUE, "1")
    st, v = opt.get_value(args, "--a", "dflt")
    assert st == opt.Opt.INVALID and v == "dflt"  # flag used as value opt
    st, v = opt.get_value(args, "--missing", "dflt")
    assert (st, v) == (opt.Opt.MISSING, "dflt")
    assert opt.check_options(args, ["--a", "--b", "--c"])
    assert not opt.check_options(args, ["--a"])


def test_tests_cli_help(capsys):
    from scrooge_tpu.cli import tests_cli

    assert tests_cli.main(["--badflag"]) == 0
    out = capsys.readouterr().out
    assert "--unit_tests" in out and "--reference=" in out


def test_baseline_cli_help_and_formats(capsys):
    from scrooge_tpu.cli import baseline_cli

    assert baseline_cli.main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "--algorithms=" in out and "--scoring=" in out

    # benchmark output format: "<alg>: <N.NN> aligns/second"
    # (profile.py:293 scrape contract), exact baseline only (no device)
    rc = baseline_cli.main(["--simulated=4,200", "--threads=128",
                            "--algorithms=exact"])
    assert rc == 0
    out = capsys.readouterr().out
    assert re.search(r"^exact: \d+\.\d\d aligns/second$", out, re.M), out
    assert "128 threads" in out


def test_baseline_cli_accuracy_format(capsys):
    from scrooge_tpu.cli import baseline_cli

    rc = baseline_cli.main(["--simulated=3,150", "--threads=128",
                            "--algorithms=affine", "--accuracy", "--cigar"])
    assert rc == 0
    out = capsys.readouterr().out
    m = re.search(r"^pair_idx=0 score=(-?\d+) cigar=(\S+) read=([ACGT]+) "
                  r"reference=([ACGT]+)$", out, re.M)
    assert m, out


def test_device_info(capsys):
    from scrooge_tpu.cli import tests_cli

    assert tests_cli.main(["--device_info_only"]) == 0
    out = capsys.readouterr().out
    assert re.search(r"^\d+ visible device\(s\):", out), out
    assert "idx=0" in out
