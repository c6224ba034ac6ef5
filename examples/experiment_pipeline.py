"""One call = one reference script: `run_experiment` runs the whole k-fold
bagged experiment (data assembly -> fold training -> vmapped ensemble ->
thresholds -> metric report), like executing `python cmu-mosei/run.py`.

    python examples/experiment_pipeline.py [config_name]

Speed knobs (all measured in docs/ENGINEERING_NOTES.md):
  device_resident=True  — stage the corpus in HBM, one dispatch per epoch
  one_dispatch=True     — the ENTIRE experiment as one XLA program
  scan_steps=k          — chain k steps per dispatch
  dp=N, tp=M            — shard over a jax.sharding.Mesh
"""

import sys

from multimodal_emotion_processing_tpu.pipelines import run_experiment


def main(config_name: str = "rencecps"):
    result = run_experiment(
        config_name,
        synthetic_data=True,       # real corpora: data_root="/path/to/corpus"
        n_train=256, n_test=64,
        epochs=2,
        device_resident=True,      # epoch-per-dispatch driver
    )
    print("folds trained:", len(result.fold_histories))
    print("report:", {k: round(v, 4) for k, v in result.report.items()
                      if isinstance(v, float)})


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
