"""Checkpointing: Orbax-backed checkpoints with a JSON manifest.

The reference saves best-only model weights to loss-tagged filenames
(`{name}_{str(valid_loss)[:4]}.pt`, cmu-mosei/run.py:415) and reloads them by
hard-coded names (cmu-mosei/run.py:446-453); optimizer/scheduler state is
never saved and there is no resume.  Here each member saves BOTH a params-only
checkpoint (for ensembling/serving) and the full train state (params +
optimizer + RNG + step, for restart-resume — the actual elasticity story on
TPU pods), and a manifest records best path/loss/epoch so ensembles reload
programmatically instead of by loss-tagged filename.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointStore:
    """Directory layout:
        <root>/manifest.json
        <root>/<name>/params/   (orbax pytree: model params only)
        <root>/<name>/full/     (orbax pytree: full TrainState dict)
    """

    def __init__(self, root: str, *, use_async: bool = False):
        """use_async=True saves through ocp.AsyncCheckpointer: the device→host
        copy happens inline but serialization overlaps with training (the
        standard TPU-pod practice); `wait()` or the next save joins it."""
        self.root = root
        self.use_async = use_async
        self._async = None
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        self.manifest: Dict[str, Dict] = {}
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self.manifest = json.load(f)

    def _write_manifest(self):
        # atomic: save_last calls this every epoch; a preemption mid-write
        # must not leave a truncated manifest that makes every checkpoint
        # on disk unreachable
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)

    def _dir(self, name: str, kind: str) -> str:
        return os.path.abspath(os.path.join(self.root, name, kind))

    def _save_tree(self, path: str, tree) -> None:
        import orbax.checkpoint as ocp

        if self.use_async:
            if self._async is None:
                self._async = ocp.AsyncCheckpointer(
                    ocp.StandardCheckpointHandler())
            # join any in-flight save BEFORE deleting its (possible) target
            self._async.wait_until_finished()
            if os.path.exists(path):
                shutil.rmtree(path)
            self._async.save(path, args=ocp.args.StandardSave(tree))
            return
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree)
        ckptr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has landed."""
        if self._async is not None:
            self._async.wait_until_finished()

    def save_best(self, name: str, state, epoch: int, valid_loss: float) -> None:
        self._save_tree(self._dir(name, "params"), _tree_to_numpy(state.params))
        self._save_tree(self._dir(name, "full"), _state_dict(state))
        self.manifest.setdefault(name, {}).update({
            "params": self._dir(name, "params"),
            "full": self._dir(name, "full"),
            "valid_loss": float(valid_loss),
            "epoch": int(epoch),
        })
        self._write_manifest()

    def save_params(self, name: str, params, valid_loss: float = 0.0,
                    epoch: int = -1, *, imported: bool = True) -> None:
        """Params-only member: enough for ensembling/serving — `best_members`
        lists it and `restore_params` loads it; no full train state.  Used
        for reference .pt weights imported via interop/torch_compat
        (`imported=True`, the default) and for the one-dispatch drivers'
        trained bests (`imported=False` — the whole run is one program, so
        there is no per-epoch full-state to save).  Any stale train-state
        keys from a previous trained member under the same name are dropped
        so the entry can't point restore_state at weights that no longer
        match the params."""
        self._save_tree(self._dir(name, "params"), _tree_to_numpy(params))
        entry = self.manifest.setdefault(name, {})
        for stale in ("full", "last", "last_prev", "done", "imported"):
            entry.pop(stale, None)
        entry.update({
            "params": self._dir(name, "params"),
            "valid_loss": float(valid_loss),
            "epoch": int(epoch),
        })
        if imported:
            entry["imported"] = True
        self._write_manifest()

    def save_last(self, name: str, state, epoch: int,
                  schedule: Optional[Dict] = None) -> None:
        """Every-epoch resume point: full train state + host-side schedule
        (plateau LR controller + early-stop counters).  This is what restart-
        resume restores after preemption; `save_best` keeps serving/ensemble
        artifacts separate.

        Crash-safe by slot alternation: epochs write to `last_a`/`last_b`
        alternately and the manifest keeps the previous entry as
        `last_prev`, so a preemption in the delete-then-save window (the
        exact scenario resume exists for) always leaves one complete resume
        point — `restore_last` falls back to it.  The slot to overwrite is
        chosen against the newest entry whose directory actually EXISTS
        (orbax commits by atomic rename, so existing == complete): after a
        fallback resume — the manifest's `last` destroyed mid-save — the
        next save must not overwrite the surviving slot."""
        member = self.manifest.get(name, {})
        good = next((e for e in (member.get("last"), member.get("last_prev"))
                     if e and os.path.isdir(e["path"])), None)
        slot = ("last_a" if good is None
                or not good["path"].endswith("last_a") else "last_b")
        self._save_tree(self._dir(name, slot), _state_dict(state))
        entry = self.manifest.setdefault(name, {})
        if good is not None:
            entry["last_prev"] = good
        entry["last"] = {
            "path": self._dir(name, slot),
            "epoch": int(epoch),
            "schedule": schedule or {},
        }
        self._write_manifest()

    def restore_last(self, name: str, state_like):
        """Returns (TrainState, last-entry dict) or None if no resume point.
        Falls back to the previous epoch's slot when the newest save was cut
        short by a preemption (see save_last)."""
        import orbax.checkpoint as ocp

        from .engine import TrainState

        member = self.manifest.get(name, {})
        self.wait()
        ckptr = ocp.StandardCheckpointer()
        for key in ("last", "last_prev"):
            entry = member.get(key)
            if not entry:
                continue
            if not os.path.isdir(entry["path"]):
                continue  # destroyed mid-save (orbax commits by atomic
                # rename, so a missing dir IS the partial-save signature)
            # an existing directory is a complete checkpoint: a restore
            # failure here is structural (e.g. resuming under a changed
            # model config) and must surface, not silently retrain
            restored = ckptr.restore(entry["path"], _state_dict(state_like))
            return TrainState(**restored), entry
        return None

    def mark_done(self, name: str) -> None:
        self.manifest.setdefault(name, {})["done"] = True
        self._write_manifest()

    def is_done(self, name: str) -> bool:
        return bool(self.manifest.get(name, {}).get("done"))

    def restore_params(self, name: str, params_like) -> Any:
        import orbax.checkpoint as ocp

        self.wait()  # read-after-write safety for async saves
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(self.manifest[name]["params"],
                             _tree_to_numpy(params_like))

    def restore_state(self, name: str, state_like) -> Any:
        import orbax.checkpoint as ocp

        from .engine import TrainState

        self.wait()  # read-after-write safety for async saves
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(self.manifest[name]["full"],
                                 _state_dict(state_like))
        return TrainState(**restored)

    def best_members(self, prefix: str = "") -> List[str]:
        """Member names `<prefix>_<int>` carrying best params, in member
        order (numeric — 10 sorts after 2).  The exact-suffix match keeps
        sibling artifacts out of the ensemble: a raw startswith would pull
        in `<prefix>_sweep_winner` (run_lr_sweep_experiment) and, worse,
        every `<prefix>_s256_*` scaled-preset member sharing a store with
        its base config (shape-mismatched restore).  prefix="" lists every
        params-carrying member of any name."""
        import re

        if not prefix:
            return sorted(n for n, e in self.manifest.items()
                          if "params" in e)
        pat = re.compile(re.escape(prefix) + r"_(\d+)$")
        hits = [(int(m.group(1)), n) for n, e in self.manifest.items()
                if "params" in e and (m := pat.match(n))]
        return [n for _, n in sorted(hits)]


def _state_dict(state) -> Dict:
    return {
        "params": _tree_to_numpy(state.params),
        "opt_state": _tree_to_numpy(state.opt_state),
        "rng": np.asarray(state.rng),
        "step": np.asarray(state.step),
    }
