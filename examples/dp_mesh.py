"""Data-parallel training over a device mesh.

    python examples/dp_mesh.py            # uses all available devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/dp_mesh.py        # 8 virtual CPU devices, no pod

Batches are sharded on the 'data' mesh axis by the prefetch worker, params
replicate (tensor-parallel: `run_experiment(..., tp=M)`), and XLA inserts
the gradient all-reduce over ICI — identical math to single-device (the
psum-mean over shards IS the full-batch mean; tested to f32 tolerance in
tests/test_pipelines.py).
"""

import jax

from multimodal_emotion_processing_tpu.pipelines import run_experiment


def main():
    n = len(jax.devices())
    print(f"{n} device(s): {jax.devices()[0].platform}")
    result = run_experiment(
        "mosei_trans",
        synthetic_data=True,
        n_train=256, n_test=64,
        epochs=2,
        dp=n,                      # 'data' mesh axis width
    )
    print("folds trained:", len(result.fold_histories))
    print("macro_f1:", round(result.report["macro_f1"], 4))


if __name__ == "__main__":
    main()
