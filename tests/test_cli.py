"""CLI driver smoke tests (reference CTest analog: run the driver on a
small graph, assert on stdout)."""

import re
import subprocess
import sys


def run_cli(*args):
    p = subprocess.run(
        [sys.executable, "-m", "gunrockinst_tpu.cli", *args],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo",
             "HOME": "/root"},
        cwd="/root/repo")
    return p


CHESAPEAKE = "/root/reference/dataset/small/chesapeake.mtx"


def test_cli_bfs():
    p = run_cli("bfs", "market", CHESAPEAKE, "--src=0")
    assert p.returncode == 0, p.stderr
    assert "bfs CORRECTNESS: PASSED" in p.stdout
    assert re.search(r"rate: .* MiEdges/s", p.stdout)


def test_cli_cc():
    p = run_cli("cc", "market", CHESAPEAKE)
    assert p.returncode == 0, p.stderr
    assert "cc CORRECTNESS: PASSED" in p.stdout
    assert "number of components: 1" in p.stdout


def test_cli_topk():
    p = run_cli("topk", "market", CHESAPEAKE, "--top-nodes=3")
    assert p.returncode == 0, p.stderr
    assert "topk CORRECTNESS: PASSED" in p.stdout
    assert "in_degrees" in p.stdout


def test_cli_pr_rmat():
    p = run_cli("pr", "rmat", "--rmat-scale=8", "--undirected")
    assert p.returncode == 0, p.stderr
    assert "pr CORRECTNESS: PASSED" in p.stdout


def test_cli_unknown_primitive():
    p = run_cli("frobnicate", "market", CHESAPEAKE)
    assert p.returncode == 2
    assert "unknown primitive" in p.stdout


def test_cli_market_requires_file():
    p = run_cli("bfs", "market")
    assert p.returncode != 0


def test_cli_bc_planes(capsys):
    from gunrockinst_tpu import cli
    rc = cli.main(["bc", "rmat", "--rmat-scale", "8",
                   "--rmat-edgefactor", "4", "--undirected",
                   "--traversal-mode", "planes", "--src", "0"])
    out = capsys.readouterr().out
    assert rc == 0 and "CORRECT" in out
