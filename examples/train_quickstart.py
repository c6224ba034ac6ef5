"""Library quickstart: config -> model -> Trainer -> evaluation.

The five reference scripts (cmu-mosei/run.py etc.) each inline this whole
stack; here it is five objects.  Synthetic shape-faithful data, a few
epochs, prints the loss trajectory and a per-emotion report.

    python examples/train_quickstart.py [config_name]
"""

import sys

import numpy as np

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.loader import Batcher
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.eval import Ensemble
from multimodal_emotion_processing_tpu.eval.ensemble import group_average
from multimodal_emotion_processing_tpu.eval.report import evaluate, format_report
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.train import Trainer


def main(config_name: str = "mosei_trans"):
    exp = configs.get(config_name)
    print(f"{config_name}: dim={exp.model.dim} heads={exp.model.n_heads} "
          f"block={exp.model.block} head={exp.model.head} on "
          f"{jax.devices()[0].platform}")

    train = synthetic_dataset(config_name, exp.model, 256, seed=0)
    test = synthetic_dataset(config_name, exp.model, 64, seed=1)
    model = build_model(exp)

    # loaders are zero-arg callables yielding batch dicts — the reference's
    # regenerate-generators-per-epoch pattern; R-Drop configs duplicate rows
    b = exp.train.batch_size
    train_loader = Batcher(train, b, duplicate=exp.train.rdrop_kl)
    valid_loader = Batcher(test, b, shuffle=False)

    trainer = Trainer(model, exp.train)
    state, history = trainer.fit(train_loader, valid_loader, epochs=3)
    for i, h in enumerate(history):
        print(f"epoch {i}: train {h.train_loss:.4f} valid {h.valid_loss:.4f} "
              f"({h.samples_per_sec:.0f} samples/s)")

    # single-model "ensemble" evaluation with the reference's fixed thresholds
    ens = Ensemble(model, [state.params])
    logits = ens.predict_all(Batcher(test, b, shuffle=False))
    labels = np.stack([s["label"] for s in test])
    if "group" in test[0]:  # two-crop pairs: one prediction per sentence pair
        logits, labels = group_average(
            logits, [int(s["group"]) for s in test], labels)
    report = evaluate(logits, labels, list(exp.thresholds),
                      exp.emotion_index, exp.emotion_names)
    print(format_report(report, title=config_name))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
