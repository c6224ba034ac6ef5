"""Serving: batch-1 streaming predictor and the dynamic micro-batching
server under concurrent load.

    python examples/serving.py

The reference's demo (robot_demo.py:594-640) runs four sequential model
forwards per sample; here the 4 members are ONE vmapped jitted program.
Under concurrent load, `BatchingServer` groups requests into bucketed
static-shape batches — the dispatch round-trip is paid per bucket instead
of per request.
"""

from concurrent.futures import ThreadPoolExecutor

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.serve import BatchingServer, StreamingPredictor


def main():
    exp = configs.get("robot_demo")
    model = build_model(exp)
    # real deployments restore members from a CheckpointStore (or
    # import-torch'd reference .pt files); random inits keep this runnable
    members = [model.init(jax.random.PRNGKey(i)) for i in range(4)]
    samples = synthetic_dataset("robot_demo", exp.model, 16, seed=0)

    # --- batch-1 streaming (the reference's demo_output) ---
    sp = StreamingPredictor(model, members, offsets=exp.thresholds)
    sp.warmup(samples[0])
    print("The emotion(s) is(are)")
    for name, prob in sp.emotions(samples[0], exp.emotion_names).items():
        print(f"  {name} {prob}")

    # --- concurrent load through the micro-batching server ---
    with BatchingServer(model, members, offsets=exp.thresholds,
                        max_delay_ms=3.0, buckets=(1, 2, 4, 8)) as srv:
        srv.warmup(samples[0])
        with ThreadPoolExecutor(8) as pool:
            futs = list(pool.map(srv.submit, samples))
        results = [f.result(timeout=120) for f in futs]
        print(f"{len(results)} concurrent requests -> stats:", srv.stats())

        # --- the same server over HTTP (CLI: serve --http-port N) ---
        import json
        import urllib.request

        import numpy as np

        from multimodal_emotion_processing_tpu.serve import HttpFrontend

        spec = {k: v.shape for k, v in samples[0].items() if k != "label"}
        with HttpFrontend(srv, spec, exp.emotion_names[:6], port=0) as fe:
            payload = {k: np.asarray(samples[0][k]).tolist() for k in spec}
            req = urllib.request.Request(
                f"http://127.0.0.1:{fe.port}/predict",
                data=json.dumps(payload).encode(), method="POST")
            out = json.loads(urllib.request.urlopen(req, timeout=120).read())
            print("HTTP /predict emotions:",
                  {k: round(v, 2) for k, v in out["emotions"].items()})


if __name__ == "__main__":
    main()
