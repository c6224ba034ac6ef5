"""Multi-process ("multi-host") seams, exercised with a REAL 2-process gloo
run on CPU: `parallel.initialize_multihost` + `process_batch_slice` +
`put_global_batch` feeding a sharded train step whose gradient all-reduce
spans both processes.  The reference has no distributed code at all
(SURVEY §2.4); this is the pod story of the new framework, scaled down to
two localhost processes (2 virtual CPU devices each -> a dp=4 global mesh).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]

from multimodal_emotion_processing_tpu.parallel import (
    initialize_multihost, make_mesh)
initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import dataclasses
import numpy as np
from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.data.loader import Batcher
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.train.engine import Trainer

exp = configs.get("rencecps")
exp = dataclasses.replace(exp, model=dataclasses.replace(exp.model, dim=16),
                          train=dataclasses.replace(exp.train, batch_size=8))
model = build_model(exp)
samples = synthetic_dataset("rencecps", exp.model, 16, 0)
# every process assembles the SAME deterministic global batches; each
# transfers only its process_batch_slice (put_global_batch inside Trainer)
loader = lambda: iter(Batcher(samples, 8, shuffle=True, seed=1)())
mesh = make_mesh(n_data=4)
tr = Trainer(model, exp.train, mesh=mesh)
state, hist = tr.fit(loader, loader, epochs=2)
print("RESULT " + json.dumps([[e.train_loss, e.valid_loss] for e in hist]),
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), str(port)],
                              env=env, cwd=REPO, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))
    # both processes observe the identical global trajectory
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=0)

    # ... and it matches the same mesh run in ONE process (4 of this
    # process's 8 virtual devices), to f32 reduction-order tolerance
    import dataclasses

    from multimodal_emotion_processing_tpu import configs
    from multimodal_emotion_processing_tpu.data.loader import Batcher
    from multimodal_emotion_processing_tpu.data.synthetic import (
        synthetic_dataset)
    from multimodal_emotion_processing_tpu.models import build_model
    from multimodal_emotion_processing_tpu.parallel import make_mesh
    from multimodal_emotion_processing_tpu.train.engine import Trainer

    exp = configs.get("rencecps")
    exp = dataclasses.replace(
        exp, model=dataclasses.replace(exp.model, dim=16),
        train=dataclasses.replace(exp.train, batch_size=8))
    model = build_model(exp)
    samples = synthetic_dataset("rencecps", exp.model, 16, 0)
    loader = lambda: iter(Batcher(samples, 8, shuffle=True, seed=1)())
    tr = Trainer(model, exp.train, mesh=make_mesh(n_data=4))
    _, hist = tr.fit(loader, loader, epochs=2)
    ours = [[e.train_loss, e.valid_loss] for e in hist]
    np.testing.assert_allclose(outs[0], ours, rtol=1e-5, atol=1e-6)


def test_process_batch_slice_single_process():
    """Single-process identity view; the divisibility error and the real
    2-process slicing are exercised by the gloo test above."""
    from multimodal_emotion_processing_tpu.parallel import process_batch_slice

    assert process_batch_slice(64) == slice(0, 64)
