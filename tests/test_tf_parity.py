"""Reference-graph forward parity (scripts/tf_parity.py in a subprocess).

The harness builds the reference's own generator graph under
tf.compat.v1 (custom-op shims replaced by exact host equivalents), saves
a genuine TF1 checkpoint, converts it with
dispu_tpu.utils.convert_tf_checkpoint, and compares our DisPUGenerator's
(coarse, fine) to the reference graph's — the full pretrained-checkpoint
loading path minus the (unavailable) artifact itself.  Runs in a
subprocess because the harness rebinds ``sys.modules['tensorflow']`` to
the v1 API, which must not leak into this test process.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "DisPU")),
    reason="reference checkout not available",
)
def test_reference_graph_forward_parity():
    pytest.importorskip("tensorflow")
    pytest.importorskip("scipy")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "scripts/tf_parity.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"harness failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "PARITY: OK" in proc.stdout, tail
    assert "missing=0 extra=0 shape-mismatch=0" in proc.stdout, tail
    assert "discriminator values max" in proc.stdout, tail
    # all six reference loss graphs matched
    assert proc.stdout.count(" ok") >= 6, tail
