"""Offline batch inference: train, checkpoint, then keep every test
sample's predictions as a file artifact.

    python examples/offline_predictions.py

The reference discards per-sample predictions (its eval loops reduce
straight to metrics, cmu-mosei/run.py:456-487); `run_predict` runs the
trained ensemble over a dataset once and writes named per-sample logits,
calibrated probabilities (the serving rule sigmoid(logit - threshold)),
and threshold decisions to .npz / .csv / .jsonl for error analysis,
calibration studies, or serving regression baselines.

CLI equivalent:
    python -m multimodal_emotion_processing_tpu train mosei_trans \
        --checkpoint-dir /tmp/ck ...
    python -m multimodal_emotion_processing_tpu predict mosei_trans \
        --checkpoint-dir /tmp/ck -o preds.csv
"""

import tempfile

import numpy as np

from multimodal_emotion_processing_tpu.pipelines import (run_experiment,
                                                         run_predict)

OVERRIDES = {"train": {"n_folds": 2, "batch_size": 8}}


def main():
    with tempfile.TemporaryDirectory() as td:
        ck = f"{td}/ck"
        run_experiment("mosei_trans", synthetic_data=True, n_train=64,
                       n_test=32, epochs=1, checkpoint_dir=ck, quiet=True,
                       overrides=OVERRIDES)

        out = f"{td}/predictions.npz"
        table = run_predict("mosei_trans", checkpoint_dir=ck, n_test=32,
                            output=out, overrides=OVERRIDES)
        print(f"{table['rows']} rows from {table['members']} ensemble members")
        print("emotions:", table["emotions"])

        z = np.load(out)
        print("npz arrays:", sorted(z.files))
        print("first row probs:",
              {n: round(float(p), 3)
               for n, p in zip(table["emotions"], z["probs"][0])})
        print("positives/emotion:", dict(zip(table["emotions"],
                                             z["pred"].sum(axis=0).tolist())))


if __name__ == "__main__":
    main()
