"""The C++ client (native/gamma_client.cc) drives the serving surface —
the non-Python proof of the language-neutral wire + frame contract (the
role the reference's Go SDK plays, go/gamma/gamma.go)."""

import os
import subprocess

import pytest

from gamma_tpu.server import serve

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "gamma_client.cc")


@pytest.fixture(scope="module")
def demo_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bin") / "gamma_client_demo")
    subprocess.run(["g++", "-O1", "-std=c++17", "-o", out, SRC],
                   check=True)
    return out


def test_cpp_client_end_to_end(demo_bin, tmp_path):
    sock = str(tmp_path / "ps.sock")
    srv = serve(sock)
    try:
        proc = subprocess.run(
            [demo_bin, sock, str(tmp_path / "engine")],
            capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "OK" in proc.stdout
    finally:
        srv.stop()
